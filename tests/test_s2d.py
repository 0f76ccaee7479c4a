"""Exactness of the s2d (space-to-depth) execution ops vs the fine path.

Every op in cmx/ops/s2d.py re-expresses a standard UNet stage op on the
(B,H/2,W/2,4,C) layout; these tests pin the equivalences the module
docstring claims (reference semantics: Finetuning/model.py:4-45).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cmx.ops.s2d import d2s5, phase_conv5, phase_max, s2d5, up_transpose5


def _conv_fine(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)),
                    jnp.float32)
    y = s2d5(x)
    assert y.shape == (2, 4, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(d2s5(y)), np.asarray(x))
    # phase index = 2*row_parity + col_parity
    np.testing.assert_array_equal(np.asarray(y[:, 1, 2, 3]),
                                  np.asarray(x[:, 3, 5]))


@pytest.mark.parametrize("cin,cout", [(1, 8), (8, 16)])
def test_phase_conv5_matches_fine(cin, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    ref = s2d5(_conv_fine(x, w, b))
    got = phase_conv5(s2d5(x), w, b, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_max_is_maxpool():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16, 16, 5)),
                    jnp.float32)
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(phase_max(s2d5(x))),
                                  np.asarray(ref))


def test_up_transpose5_matches_conv_transpose():
    rng = np.random.default_rng(3)
    cin, cout = 12, 6
    x = jnp.asarray(rng.normal(size=(2, 8, 8, cin)), jnp.float32)
    mod = nn.ConvTranspose(cout, (2, 2), strides=(2, 2), dtype=jnp.float32,
                           param_dtype=jnp.float32)
    v = mod.init(jax.random.key(0), x)
    ref = mod.apply(v, x)
    got = d2s5(up_transpose5(x, v["params"]["kernel"], v["params"]["bias"],
                             dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
