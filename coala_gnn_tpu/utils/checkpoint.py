"""Orbax checkpoint save/restore.

The reference has NO checkpointing (SURVEY.md §5: training is
epochs-then-eval in one job); this is basic hygiene for a production
framework: params + optimizer state + step, with async save support.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def save(path: str, params: Any, opt_state: Any, step: int) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"step_{step}"),
                   {"params": params, "opt_state": opt_state,
                    "step": step}, force=True)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [int(d.split("_", 1)[1]) for d in os.listdir(path)
             if d.startswith("step_") and d.split("_", 1)[1].isdigit()]
    return max(steps) if steps else None


def restore(path: str, like: Any, step: Optional[int] = None
            ) -> Optional[Tuple[Any, Any, int]]:
    """Restore (params, opt_state, step); ``like`` is a matching pytree
    template {"params":..., "opt_state":..., "step": 0}. Returns None if no
    checkpoint exists."""
    import orbax.checkpoint as ocp

    step = step if step is not None else latest_step(path)
    if step is None:
        return None
    with ocp.StandardCheckpointer() as ckptr:
        out = ckptr.restore(os.path.join(os.path.abspath(path), f"step_{step}"),
                            like)
    return out["params"], out["opt_state"], int(out["step"])
