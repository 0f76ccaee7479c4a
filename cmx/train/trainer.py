"""The single pjit trainer every regime runs on.

Replaces the reference's five training loops (hand-rolled Epoch classes,
raw script loop, pre_train_one_ep, Lightning Trainer, mmengine Runner —
SURVEY §1 L3) with ONE jitted step function over a data mesh:

  * batch arrives host-sharded over the `data` axis; the step is compiled as
    a global-view program, so gradient averaging, SyncBN statistics, and
    contrastive negative gathering are XLA collectives on ICI — no NCCL
    wrappers, no DDP module, no shuffle-BN.
  * EMA/momentum updates run INSIDE the step (replacing MomentumUpdateHook's
    before/after_train_iter mutation, cmae/core/hooks/momentum_update_hook.py)
  * the NaN guard skips the update instead of sys.exit (Spark/main.py:201-203)
    and reports `nonfinite` in metrics so the host loop can decide.

A task is a `Task` dataclass: `loss_fn(params, state, batch, rng)` returning
`(loss, TaskAux)`, plus an optional `post_update` that refreshes task state
(EMA trees, queues) after the optimizer step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cmx.parallel.mesh import make_mesh, replicate, shard_batch
from cmx.train.optim import global_grad_norm
from cmx.train.state import TrainState


class TaskAux(struct.PyTreeNode):
    """What a task's loss_fn returns besides the scalar loss.

    A registered pytree so it can flow through value_and_grad's aux."""

    batch_stats: Any  # updated BN stats (or the old ones if frozen)
    metrics: Dict[str, jnp.ndarray]
    updates: Any = None  # opaque payload for post_update (e.g. new keys)


LossFn = Callable[[Any, TrainState, Any, jax.Array], Tuple[jnp.ndarray, TaskAux]]
PostUpdateFn = Callable[[TrainState, TaskAux], Any]  # returns new `extra`


@dataclasses.dataclass
class Task:
    name: str
    loss_fn: LossFn
    post_update: Optional[PostUpdateFn] = None


def make_train_step(task: Task, tx: optax.GradientTransformation, donate: bool = True):
    """Build the jitted global-view train step: grad, clip/update, NaN guard,
    EMA/queue refresh. Call with batch already sharded over the mesh."""

    def step(state: TrainState, batch: Any) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(state.rng, state.step)
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            state.params, state, batch, rng
        )
        gnorm = global_grad_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN guard: keep old state when the step is non-finite.
        new_params = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_params, state.params
        )
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_opt_state, state.opt_state
        )
        new_bs = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            aux.batch_stats,
            state.batch_stats,
        )

        state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        if task.post_update is not None:
            # The NaN guard must also cover task state: MoCo would otherwise
            # enqueue this step's NaN keys / absorb NaN target BN stats,
            # poisoning every later step while the guard silently skips them.
            new_extra = task.post_update(state, aux)
            new_extra = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_extra, state.extra
            )
            state = state.replace(extra=new_extra)

        metrics = dict(aux.metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = gnorm
        metrics["nonfinite"] = 1.0 - finite.astype(jnp.float32)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class Trainer:
    """Thin host-side loop: shards batches onto the mesh, runs the jitted
    step, accumulates meters. Epoch semantics live in the harnesses
    (cmx.cli / cmx.train.loops)."""

    def __init__(self, task: Task, tx: optax.GradientTransformation, mesh=None):
        self.task = task
        self.tx = tx
        self.mesh = mesh if mesh is not None else make_mesh()
        self.step_fn = make_train_step(task, tx)

    def prepare_state(self, state: TrainState) -> TrainState:
        return replicate(state, self.mesh)

    def run_step(self, state: TrainState, batch: Any):
        batch = shard_batch(batch, self.mesh)
        return self.step_fn(state, batch)
