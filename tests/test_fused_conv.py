"""Fused masked DoubleConv (cmx/ops/fused_conv.py) — numerics.

Kernels run in interpret mode on the CPU mesh here; the compiled-on-TPU
A/B (numerics + throughput) is recorded in RESULTS.md. Gradient checks run
with COMPUTE_DTYPE=float32 so the hand-derived VJP is compared against
autodiff with no bf16 rounding ambiguity (in bf16 the unfused autodiff's
cast noise dominates: the true d(loss)/d(conv bias) is exactly 0 through
batch norm, which the fp32 check confirms for both paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmx.ops import fused_conv as fc


def _inputs(C=16, B=2, H=32, W=32, cin=1, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, W, cin)).astype(np.float32))
    m = jnp.asarray((rng.random((B, H, W)) > 0.4).astype(np.float32))
    params = [
        jnp.asarray(rng.normal(size=(3, 3, cin, C)).astype(np.float32) * 0.2),
        jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1),
        jnp.ones((C,)) * 1.1, jnp.zeros((C,)),
        jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05),
        jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1),
        jnp.ones((C,)) * 1.2, jnp.ones((C,)) * 0.05,
    ]
    return x, m, params


def test_forward_matches_reference_bf16():
    x, m, params = _inputs()
    out, stats = fc.fused_double_conv(x, m, *params)
    ref, rstats = fc.double_conv_reference(x, m, *params)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32)))) / scale
    assert err < 0.02  # bf16 ulp-level
    for a, b in zip(stats, rstats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3)


def test_forward_cin_gt1_dense_mask():
    """Cin>1 exercises the halo-DMA kernel for conv0 too; all-ones mask
    checks the dense (fine-tune) path."""
    x, _, params = _inputs(cin=16, C=16, seed=3)
    m = jnp.ones(x.shape[:3], jnp.float32)
    out, _ = fc.fused_double_conv(x, m, *params)
    ref, _ = fc.double_conv_reference(x, m, *params)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32)))) / scale
    assert err < 0.02


@pytest.mark.parametrize("cin", [1, 16])
@pytest.mark.parametrize("mega", [False, True])
def test_vjp_matches_autodiff_fp32(monkeypatch, cin, mega):
    """Hand-derived VJP (jnp and Pallas-mega variants) vs fp32 autodiff."""
    monkeypatch.setattr(fc, "COMPUTE_DTYPE", jnp.float32)
    monkeypatch.setattr(fc, "FUSED_BWD", mega)
    x, m, params = _inputs(cin=cin)
    rng = np.random.default_rng(9)
    probe = jnp.asarray(
        rng.normal(size=(2, 32, 32, 16)).astype(np.float32))

    def loss(fn, x, *p):
        out, _ = fn(x, m, *p)
        return jnp.sum(out.astype(jnp.float32) * probe)

    gf = jax.grad(lambda *a: loss(fc.fused_double_conv, *a),
                  argnums=tuple(range(9)))(x, *params)
    gr = jax.grad(lambda *a: loss(fc.double_conv_reference, *a),
                  argnums=tuple(range(9)))(x, *params)
    for name, a, b in zip(
            ["dx", "dw0", "db0", "dg0", "dbe0", "dw1", "db1", "dg1", "dbe1"],
            gf, gr):
        scale = float(jnp.max(jnp.abs(b)))
        if scale < 1e-2:  # conv biases: exactly absorbed by BN, both ~0
            assert float(jnp.max(jnp.abs(a))) < 1e-2, name
        else:
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err < 1e-4, (name, err)


def test_module_fused_equals_unfused():
    """DoubleConv(fused=True) keeps the exact param/variable tree and
    reproduces outputs + running-stat updates of the plain path."""
    from cmx.models.blocks import DoubleConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.4).astype(np.float32))

    mu = DoubleConv(16, dtype=jnp.bfloat16, fused=False)
    mf = DoubleConv(16, dtype=jnp.bfloat16, fused=True, fused_min_hw=0)
    vu = mu.init(jax.random.key(0), x, mask)
    vf = mf.init(jax.random.key(0), x, mask)
    assert (jax.tree_util.tree_structure(vu)
            == jax.tree_util.tree_structure(vf))
    assert all(jax.tree.leaves(
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), vu, vf)))

    ou, su = mu.apply(vu, x, mask, mutable=["batch_stats"])
    of, sf = mf.apply(vu, x, mask, mutable=["batch_stats"])
    scale = float(jnp.max(jnp.abs(ou.astype(jnp.float32)))) + 1e-6
    assert float(jnp.max(jnp.abs(
        ou.astype(jnp.float32) - of.astype(jnp.float32)))) / scale < 0.02
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        su["batch_stats"], sf["batch_stats"]))
    assert max(diffs) < 5e-2


@pytest.mark.slow
def test_spark_step_fused_close_to_unfused(monkeypatch):
    """One SparK forward with the fused model: finite loss, close to the
    unfused loss (same params, same rng).

    Patches the module-level FUSED_MIN_HW gate (flax freezes dataclass
    defaults at class creation — the round-1 class-attribute patch was a
    silent no-op) and counts flat_double_conv calls to prove the fused
    kernels actually executed."""
    from cmx.ops import fused_conv as fc
    from cmx.ops import fused_conv_flat as ff
    from cmx.ssl.spark import SparKModel, make_spark_task
    from cmx.ops.masking import spark_active_mask

    monkeypatch.setattr(fc, "FUSED_MIN_HW", 0)
    calls = []
    orig_fdc = ff.flat_double_conv
    monkeypatch.setattr(
        ff, "flat_double_conv",
        lambda *a, **k: (calls.append(1), orig_fdc(*a, **k))[1])

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32)).astype(np.float32))
    losses = {}
    for fused in (False, True):
        model = SparKModel(mask_ratio=0.6, dtype=jnp.bfloat16, fused=fused)
        task, _ = make_spark_task(model, augment=False, input_size=32)
        active0 = spark_active_mask(jax.random.key(1), 1, 2, 0.6)
        v = model.init(jax.random.key(0), imgs[:1], active0)

        class S:
            batch_stats = v["batch_stats"]

        n_calls_before = len(calls)
        loss, _ = task.loss_fn(v["params"], S, imgs, jax.random.key(2))
        losses[fused] = float(loss)
        assert np.isfinite(losses[fused])
        if fused:
            assert len(calls) > n_calls_before, "fused path never entered"
        else:
            assert len(calls) == n_calls_before
    assert abs(losses[True] - losses[False]) < 0.05 * (
        abs(losses[False]) + 1e-3)


@pytest.mark.parametrize("cin", [1, 16])
def test_flat_vjp_matches_autodiff_fp32(monkeypatch, cin):
    """Flat-layout core (channel-major kernels) vs fp32 autodiff."""
    monkeypatch.setattr(fc, "COMPUTE_DTYPE", jnp.float32)
    from cmx.ops import fused_conv_flat as ff

    x, m, params = _inputs(cin=cin)
    B, H, W, _ = x.shape
    rng = np.random.default_rng(9)
    probe = jnp.asarray(rng.normal(size=(B, H, W, 16)).astype(np.float32))
    probef = ff.nhwc_to_flat(probe)

    def loss_flat(x, *p):
        out, _ = ff.flat_double_conv(
            ff.nhwc_to_flat(x), m.reshape(B, 1, H * W), *p, H, W)
        return jnp.sum(out.astype(jnp.float32) * probef)

    def loss_ref(x, *p):
        out, _ = fc.double_conv_reference(x, m, *p)
        return jnp.sum(out.astype(jnp.float32) * probe)

    gf = jax.grad(loss_flat, argnums=tuple(range(9)))(x, *params)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(x, *params)
    for name, a, b in zip(
            ["dx", "dw0", "db0", "dg0", "dbe0", "dw1", "db1", "dg1", "dbe1"],
            gf, gr):
        scale = float(jnp.max(jnp.abs(b)))
        if scale < 1e-2:
            assert float(jnp.max(jnp.abs(a))) < 1e-2, name
        else:
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err < 1e-4, (name, err)


def test_module_fused_flat_equals_unfused():
    from cmx.models.blocks import DoubleConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.4).astype(np.float32))
    mu = DoubleConv(16, dtype=jnp.bfloat16, fused=False)
    mf = DoubleConv(16, dtype=jnp.bfloat16, fused=True, fused_min_hw=0,
                    fused_impl="flat")
    vu = mu.init(jax.random.key(0), x, mask)
    ou, su = mu.apply(vu, x, mask, mutable=["batch_stats"])
    of, sf = mf.apply(vu, x, mask, mutable=["batch_stats"])
    scale = float(jnp.max(jnp.abs(ou.astype(jnp.float32)))) + 1e-6
    assert float(jnp.max(jnp.abs(
        ou.astype(jnp.float32) - of.astype(jnp.float32)))) / scale < 0.02
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        su["batch_stats"], sf["batch_stats"]))
    assert max(diffs) < 5e-2
