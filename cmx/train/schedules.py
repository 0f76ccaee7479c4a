"""LR / WD / momentum schedules.

Covers every schedule the reference uses:
  * linear-warmup -> cosine LR with simultaneous cosine WD annealing
    (Spark/utils/lr_control.py:11-29; CM-UNet LinearLR warmup 40ep ->
    CosineAnnealing, configs/cmunet_config.py:94-109)
  * StepLR (Genesis_Chest_CT.py:88-92)
  * plain cosine (MoCo CosineAnnealingLR, moco2_module.py:344-349)
  * EMA momentum cosine ramp base -> end (MomentumUpdateHook,
    cmae/core/hooks/momentum_update_hook.py:29-40; MoCo fixed m=.999,
    moco2_module.py:153-158)

All are pure float->float functions of the global step, usable both inside
the jitted train step (momentum) and via optax.inject_hyperparams (lr/wd).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def warmup_cosine(
    peak: float,
    total_steps: int,
    warmup_steps: int,
    final_ratio: float = 0.0,
) -> Callable:
    """Linear 0->peak over warmup, cosine peak->peak*final_ratio after.

    Matches lr_wd_annealing's lr curve (Spark/utils/lr_control.py:11-29),
    which warms from 0 and ends at wp_ep-anchored cosine; SparK's final lr
    ratio is 1/100 via min_lr handling in its args.
    """
    floor = peak * final_ratio

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = peak * step / jnp.maximum(warmup_steps, 1)
        t = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        cos = floor + (peak - floor) * 0.5 * (1 + jnp.cos(math.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def cosine_anneal(start: float, end: float, total_steps: int) -> Callable:
    """start -> end over total_steps on a half-cosine."""

    def fn(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / jnp.maximum(total_steps, 1), 0.0, 1.0)
        return end + (start - end) * 0.5 * (1 + jnp.cos(math.pi * t))

    return fn


def step_decay(base: float, step_size: int, gamma: float = 0.5) -> Callable:
    """StepLR: base * gamma^(step // step_size) (Genesis_Chest_CT.py:88-92)."""

    def fn(step):
        k = jnp.floor(jnp.asarray(step, jnp.float32) / step_size)
        return base * jnp.power(gamma, k)

    return fn


def constant(value: float) -> Callable:
    def fn(step):
        return jnp.asarray(value, jnp.float32)

    return fn


def ema_momentum_cosine(base: float, end: float, total_steps: int) -> Callable:
    """Cosine ramp of EMA momentum base -> end (momentum_update_hook.py:29-40):
    m = end - (end - base) * (cos(pi * t) + 1) / 2."""

    def fn(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / jnp.maximum(total_steps, 1), 0.0, 1.0)
        return end - (end - base) * (jnp.cos(math.pi * t) + 1) / 2

    return fn


def scaled_base_lr(base_lr: float, global_batch: int, denom: int = 256) -> float:
    """The linear-scaling rule both SSL silos use: lr = base * batch/denom
    (Spark/utils/arg_util.py:133, cmunet_config.py:74)."""
    return base_lr * global_batch / denom
