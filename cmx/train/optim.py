"""Optimizer factory: SGD / AdamW / LAMB with param-group rules.

Reference surface: {sgd, adamw, lamb} selected by name (Spark/main.py:107-113),
LAMB with global-grad-norm clipping + per-layer trust ratio
(Spark/utils/lamb.py:28-161), no-weight-decay for 1-D params / biases /
mask tokens (Spark/utils/lr_control.py:32-53, cmunet_config.py:79-91 custom
keys), LARS for large-batch contrastive (cmae/core/optimizer/lars.py, unused
by the UNet config but part of the surface), SGD+momentum for fine-tune/MoCo/
Genesis, AdamW for CM-UNet.

Built on optax; schedules are injected so LR and WD both anneal per-step
(the lr_wd_annealing semantics, Spark/utils/lr_control.py:11-29).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable]


def no_decay_mask(params: Any) -> Any:
    """True where weight decay applies: only >=2-D kernels decay.

    Matches get_param_groups (Spark/utils/lr_control.py:32-53): no decay for
    1-D params (biases, norm scales) and special tokens (mask_token).
    """
    def keep(path, p):
        name = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
        if "mask_token" in name:
            return False
        return p.ndim >= 2

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(
    name: str,
    learning_rate: ScalarOrSchedule,
    weight_decay: ScalarOrSchedule = 0.0,
    *,
    momentum: float = 0.9,
    clip_norm: Optional[float] = None,
    params_example: Any = None,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """Build the named optimizer with optional global-norm clipping.

    `weight_decay` may be a schedule — the simultaneous wd-annealing of
    lr_wd_annealing is expressed via inject_hyperparams.
    """
    name = name.lower()
    mask = no_decay_mask(params_example) if params_example is not None else None

    if name == "sgd":
        def base_fn(learning_rate, weight_decay):
            parts = []
            if mask is not None:
                parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
            elif not callable(weight_decay):
                parts.append(optax.add_decayed_weights(weight_decay))
            parts.append(optax.sgd(learning_rate, momentum=momentum))
            return optax.chain(*parts)
    elif name == "adamw":
        def base_fn(learning_rate, weight_decay):
            return optax.adamw(
                learning_rate, b1=b1, b2=b2, weight_decay=weight_decay, mask=mask
            )
    elif name == "lamb":
        def base_fn(learning_rate, weight_decay):
            return optax.lamb(
                learning_rate, b1=b1, b2=b2, weight_decay=weight_decay, mask=mask
            )
    elif name == "lars":
        def base_fn(learning_rate, weight_decay):
            return optax.lars(
                learning_rate,
                weight_decay=weight_decay,
                weight_decay_mask=mask if mask is not None else True,
                momentum=momentum,
            )
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    lr_is_sched = callable(learning_rate)
    wd_is_sched = callable(weight_decay)
    if lr_is_sched or wd_is_sched:
        inject = optax.inject_hyperparams(
            lambda learning_rate, weight_decay: base_fn(learning_rate, weight_decay)
        )
        tx = inject(learning_rate=learning_rate, weight_decay=weight_decay)
    else:
        tx = base_fn(learning_rate, weight_decay)

    if clip_norm is not None:
        # LAMB in the reference clips by global grad norm internally
        # (Spark/utils/lamb.py max_grad_norm); others clip explicitly
        # (Spark/main.py:185-209).
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def global_grad_norm(grads: Any) -> jnp.ndarray:
    """The `global_grad_norm` the SparK loop logs (lamb.py exposes it)."""
    return optax.global_norm(grads)


def unet_layer_id(path_name: str, num_layers: int) -> int:
    """Depth index of a UNet param for layer-wise lr decay.

    The reference constructor maps vit/swin block names to layer ids
    (cmae/core/optimizer/optimizer.py:98-239, get_layer_id_for_vit at
    119-139); this is the UNet-stage analog: encoder stages 0..4 (down1..4,
    bottleneck), everything else (decoder/neck/head) = num_layers (full lr).
    """
    for i in range(1, 5):
        if f"down{i}" in path_name:
            return i - 1
    if "bottleneck" in path_name:
        return 4
    return num_layers


def layer_lr_decay_scales(
    params: Any, decay_rate: float, num_layers: int = 5,
    layer_fn: Callable[[str, int], int] = unet_layer_id,
) -> Any:
    """Per-param lr multipliers: decay_rate ** (num_layers - layer_id).

    Semantics of LearningRateDecayOptimWrapperConstructor
    (cmae/core/optimizer/optimizer.py:141-239): earlier (closer-to-input)
    layers get geometrically smaller learning rates — standard for
    fine-tuning a pretrained encoder.
    """
    def scale(path, p):
        name = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
        lid = layer_fn(name, num_layers)
        return jnp.asarray(decay_rate ** (num_layers - lid), jnp.float32)

    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_layer_decay(
    params_example: Any, decay_rate: float, num_layers: int = 5,
    layer_fn: Callable[[str, int], int] = unet_layer_id,
) -> optax.GradientTransformation:
    """optax transform applying layer-wise lr decay; chain AFTER the base
    optimizer: optax.chain(make_optimizer(...), scale_by_layer_decay(...))."""
    scales = layer_lr_decay_scales(params_example, decay_rate, num_layers, layer_fn)

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)
