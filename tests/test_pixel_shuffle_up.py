"""PixelShuffleUpsample2x must be numerically identical to nn.ConvTranspose
(k=2, s=2) with the same kernel param."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cmx.models.blocks import PixelShuffleUpsample2x


def test_equivalent_to_conv_transpose(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 7, 6)).astype(np.float32))
    ps = PixelShuffleUpsample2x(4, dtype=jnp.float32)
    v = ps.init(jax.random.key(0), x)
    got = ps.apply(v, x)

    ct = nn.ConvTranspose(4, (2, 2), strides=(2, 2), dtype=jnp.float32,
                          param_dtype=jnp.float32)
    want = ct.apply({"params": {"kernel": v["params"]["kernel"],
                                "bias": v["params"]["bias"]}}, x)
    assert got.shape == want.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
