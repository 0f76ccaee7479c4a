"""Patch-mask generation for MAE / SparK / CM-UNet.

Convention in this framework: an *active* mask has 1 = visible/kept pixel,
0 = masked — the shape the UNetEncoder consumes. (The reference mixes
conventions: MAE's `create_random_patch_mask` is 1 = masked,
Transformation_based/utils.py:169-194; SparK's `active_b1ff` is 1 = keep,
Spark/spark.py:82-86; CM-UNet's `random_masking` is 1 = masked,
cmae/models/backbones/UNet_encoder.py:106-139.)

Per-sample masks by default. The reference broadcasts `mask[0]` to the whole
batch in two places (utils.py:206, UNet_encoder.py:156) — a quirk we treat
as a bug; pass `shared=True` for bit-faithful parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_patch_mask(
    key: jax.Array,
    batch: int,
    img_size: int = 256,
    patch_size: int = 16,
    mask_ratio: float = 0.5,
    shared: bool = False,
) -> jnp.ndarray:
    """Active mask (B, H, W): exactly floor(ratio * n_patches) patches zeroed.

    The reference greedily fills shuffled patches until the target *area* is
    reached (utils.py:169-194) — with uniform patch size that is exactly
    "mask the first k patches of a random permutation",
    k = floor(mask_ratio * img_size^2) // patch_size^2.
    Implemented as a rank-threshold on per-patch uniforms: O(P log P) sort,
    fully batched, no host loop.
    """
    f = img_size // patch_size
    n = f * f
    k = int(mask_ratio * img_size * img_size) // (patch_size * patch_size)
    k = min(k, n)
    nmask = 1 if shared else batch
    u = jax.random.uniform(key, (nmask, n))
    # rank of each patch among its sample's uniforms; mask the k smallest
    order = jnp.argsort(u, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    masked = ranks < k  # 1 = masked patch
    active_patches = ~masked
    active = active_patches.reshape(nmask, f, f)
    active = jnp.repeat(jnp.repeat(active, patch_size, axis=1), patch_size, axis=2)
    if shared:
        active = jnp.broadcast_to(active, (batch, img_size, img_size))
    return active.astype(jnp.float32)


def spark_active_mask(
    key: jax.Array,
    batch: int,
    fmap_size: int,
    mask_ratio: float = 0.6,
) -> jnp.ndarray:
    """SparK active grid (B, f, f): keep ceil((1-ratio) * f^2) random cells.

    Reference (Spark/spark.py:82-86): per-sample randperm over the f x f
    bottleneck grid, keep the first len_keep. 1 = keep.
    """
    n = fmap_size * fmap_size
    len_keep = max(1, round(n * (1 - mask_ratio)))
    u = jax.random.uniform(key, (batch, n))
    order = jnp.argsort(u, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    keep = ranks < len_keep
    return keep.reshape(batch, fmap_size, fmap_size).astype(jnp.float32)


def upsample_mask(mask_grid: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-upsample a (B, f, f) grid to (B, f*factor, f*factor) — the
    repeat_interleave trick of Spark/encoder.py:14-17."""
    return jnp.repeat(jnp.repeat(mask_grid, factor, axis=1), factor, axis=2)


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W[, C]) -> (B, n_patches, patch_size^2 * C)."""
    if x.ndim == 3:
        x = x[..., None]
    b, h, w, c = x.shape
    f_h, f_w = h // patch_size, w // patch_size
    x = x.reshape(b, f_h, patch_size, f_w, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, f_h * f_w, patch_size * patch_size * c)


def unpatchify(p: jnp.ndarray, patch_size: int, h: int, w: int, c: int = 1) -> jnp.ndarray:
    """Inverse of patchify -> (B, H, W, C)."""
    b = p.shape[0]
    f_h, f_w = h // patch_size, w // patch_size
    x = p.reshape(b, f_h, f_w, patch_size, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)
