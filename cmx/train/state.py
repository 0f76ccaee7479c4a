"""Functional train state.

Everything the reference keeps as module buffers / optimizer internals /
hook-mutated attributes becomes one explicit pytree threaded through the
jitted step: params, BN running stats, optimizer state, and per-task `extra`
state (EMA target copies incl. their BN stats — the subtlety flagged in
SURVEY §7 "Hard parts"; MoCo's queue + ptr; step counter; RNG key).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
import optax


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    extra: Any  # task-owned state: EMA copies, queues, ... (pytree or None)
    rng: jax.Array

    @classmethod
    def create(cls, *, params, batch_stats, tx: optax.GradientTransformation,
               extra: Any = None, rng: Optional[jax.Array] = None) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            extra=extra,
            rng=rng if rng is not None else jax.random.key(0),
        )


def ema_update(ema_tree: Any, new_tree: Any, momentum) -> Any:
    """ema <- m * ema + (1 - m) * new, leafwise (moco2_module.py:153-158,
    cmunet.py:78-92). Works for params AND batch_stats trees."""
    return jax.tree.map(
        lambda e, p: momentum * e + (1.0 - momentum) * p, ema_tree, new_tree
    )


def param_count(params: Any) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
