"""Single source of truth for exchange bucket sizing.

The sharded cache's all_to_all buckets are FIXED shapes baked into the
compiled kernels (equal-splits contract, sharded_cache.py module
docstring), and the byte-accounting model (comm_model) promises to report
the exact wire bytes those shapes imply. That only stays true if both
sides compute the sizes from the same function — these helpers are that
function. Kernels (`sharded_cache`, `sharded_resident`) and the model
(`comm_model`) must all call these rather than re-deriving the formulas.

Reference anchor: the reference sizes its NVSHMEM transfer buffers once
per world from max_sample_size (COALA_GNN_Manager.py:79-81); here the
same role is played by (n_req, group) -> bucket_cap.
"""

from __future__ import annotations


def lookup_bucket_cap(n_req: int, group: int, slack: float = 2.0) -> int:
    """Slots per (src, owner) bucket in exchange_lookup/exchange_probe.

    ``slack`` x the uniform share absorbs skew in the id -> owner hash;
    overflow slots (beyond the cap) are reported separately and fetched
    from the host tier (sharded_cache.exchange_probe docstring).
    """
    if group <= 1:
        return n_req
    return min(n_req, int(slack * n_req / group) + 1)


def fill_bucket_cap(m_cap: int, group: int, slack: float = 2.0) -> int:
    """Slots per owner bucket in the miss-fill push (_fill_local).

    ``m_cap`` is the pow2-rounded global max miss count per device
    (sharded_cache.fetch: _ceil_pow2 of the measured miss max). The +128
    constant absorbs owner skew in small miss batches, where slack x the
    uniform share alone would round to a handful of slots.
    """
    if group <= 1:
        return m_cap
    return min(m_cap, int(slack * m_cap / group) + 128)


def ceil_pow2(x: int) -> int:
    """Smallest power of two >= x (>= 1); miss buffers quantize to this so
    the jit cache sees O(log) distinct shapes, not one per miss count."""
    p = 1
    while p < x:
        p <<= 1
    return p
