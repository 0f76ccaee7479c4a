"""Convenience APIs: init_model / inference_model.

Counterpart of CM-UNet's apis (cmae/apis/inference.py:17-90 — note the
reference's `apis/__init__.py:2` imports a module that does not exist; this
one imports cleanly).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from cmx.models.unet import UNet


def init_model(
    encoder_path: Optional[str] = None,
    out_classes: int = 2,
    seed: int = 0,
    dtype=jnp.bfloat16,
) -> Tuple[UNet, dict]:
    """Build an eval-mode UNet, optionally loading a pretrained encoder
    (any regime's encoder.npz export)."""
    model = UNet(out_classes=out_classes, dtype=dtype, use_running_average=True)
    variables = model.init(jax.random.key(seed), jnp.zeros((1, 256, 256)))
    variables = dict(variables)
    if encoder_path:
        from cmx.ckpt.checkpoint import load_encoder

        params, bs = load_encoder(
            encoder_path, variables["params"], variables["batch_stats"]
        )
        variables = {"params": params, "batch_stats": bs}
    return model, variables


def inference_model(
    model: UNet,
    variables: dict,
    image: Union[np.ndarray, jnp.ndarray],
    size: int = 256,
) -> np.ndarray:
    """Segment one image or a batch: resize -> forward -> softmax probs
    (B, H, W, C). Accepts (H, W) or (B, H, W)."""
    img = np.asarray(image, dtype=np.float32)
    single = img.ndim == 2
    if single:
        img = img[None]
    if img.shape[1:] != (size, size):
        img = np.asarray(
            jax.image.resize(jnp.asarray(img), (img.shape[0], size, size), "cubic")
        )
    logits = jax.jit(model.apply)(variables, jnp.asarray(img))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    return probs[0] if single else probs
