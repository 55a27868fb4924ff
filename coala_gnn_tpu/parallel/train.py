"""Jitted train/eval steps.

Equivalent of the reference's training inner loop (reference:
examples/sbatch_ssd_gnn_train.py:126-151 — forward, CrossEntropyLoss,
Adam step under DDP). TPU-native shape: one jitted function per step; data
parallelism is expressed later by sharding the batch over the mesh ``data``
axis and letting pjit insert the gradient psum (replacing DDP/NCCL,
SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from coala_gnn_tpu.models.layers import DeviceBlock


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def init_state(model: nn.Module, tx: optax.GradientTransformation,
               sample_blocks: Sequence[DeviceBlock], sample_x: jax.Array,
               seed: int = 0) -> TrainState:
    params = model.init(jax.random.key(seed), list(sample_blocks), sample_x)
    return TrainState(params=params, opt_state=tx.init(params))


def make_train_step(model: nn.Module, tx: optax.GradientTransformation,
                    batch_size: int) -> Callable:
    """Returns jitted step(params, opt_state, key, blocks, x, labels).

    Loss is cross-entropy over the first ``batch_size`` output rows (the
    seeds; blocks pad dst rows beyond the true batch — those rows carry no
    gradient because the output slice is static)."""

    def loss_fn(params, key, blocks, x, labels):
        logits = model.apply(params, blocks, x, train=True,
                             rngs={"dropout": key})
        logits = logits[:batch_size]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        return ce.mean(), logits

    @jax.jit
    def step(params, opt_state, key, blocks, x, labels
             ) -> Tuple[Any, Any, jax.Array, jax.Array]:
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, blocks, x, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == labels).mean()
        return params, opt_state, loss, acc

    return step


def make_eval_step(model: nn.Module, batch_size: int) -> Callable:
    @jax.jit
    def step(params, blocks, x, labels) -> Tuple[jax.Array, jax.Array]:
        logits = model.apply(params, blocks, x, train=False)[:batch_size]
        correct = (logits.argmax(-1) == labels).sum()
        return correct, jnp.asarray(labels.shape[0])

    return step
