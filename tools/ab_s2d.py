"""Space-to-depth L1 reformulation A/B (VERDICT r1 item 1c).

The L1 DoubleConv runs at 256²×64ch and is bandwidth-bound (26% MFU,
RESULTS r2). Space-to-depth maps (B,256,256,C) → (B,128,128,4C); a
stride-1 3×3 conv at fine resolution is EXACTLY representable on the s2d
layout as a 3×3 conv with a k-expanded kernel:

    out_fine[2i+di, 2j+dj, co] needs fine rows 2i+di-1 .. 2i+di+1, which
    span s2d rows i-1 .. i+1 → Ws2d[si+1, sj+1, (ri,rj,ci), (di,dj,co)]
      = W[2si+ri-di+1, 2sj+rj-dj+1, ci, co]   (taps outside 0..2 are zero)

Exactness: verified below (fp32, `--check`). Cost: the expanded kernel is
(3,3,4C,4C') of which only 9/36 taps per (di,dj) sub-position are nonzero
→ the MXU executes 4× the fine conv's FLOPs at identical logical HBM
bytes. Since L1 is bandwidth-bound, the win would have to come from a
64-lane → 256-lane layout-tax reduction; probe 1 of tools/probe_l1.py
measures whether such a tax exists at all.

Usage:
  python tools/ab_s2d.py --check          # CPU exactness
  python tools/ab_s2d.py --time           # TPU timing A/B (L1-shaped)
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/2,W/2,4C); s2d channel = (ri, rj, c) flattened."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def d2s(y: jnp.ndarray) -> jnp.ndarray:
    b, h2, w2, c4 = y.shape
    c = c4 // 4
    x = y.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def expand_kernel(w: np.ndarray) -> np.ndarray:
    """Fine (3,3,Cin,Cout) SAME-pad stride-1 kernel -> s2d (3,3,4Cin,4Cout)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    we = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for si in (-1, 0, 1):
        for sj in (-1, 0, 1):
            for ri in (0, 1):
                for rj in (0, 1):
                    for di in (0, 1):
                        for dj in (0, 1):
                            ky = 2 * si + ri - di + 1
                            kx = 2 * sj + rj - dj + 1
                            if 0 <= ky <= 2 and 0 <= kx <= 2:
                                ci0 = (ri * 2 + rj) * cin
                                co0 = (di * 2 + dj) * cout
                                we[si + 1, sj + 1, ci0 : ci0 + cin, co0 : co0 + cout] = (
                                    w[ky, kx]
                                )
    return we


# f32 accumulation for the exactness --check; the --time path sets bf16 so
# the backward cotangents match the bf16 operands (a f32 cotangent meeting a
# bf16 input crashes conv_general_dilated's transpose).
ACC_DTYPE = jnp.float32


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=ACC_DTYPE,
    )


def expand_kernel_phase(w: np.ndarray, di: int, dj: int) -> np.ndarray:
    """Polyphase decomposition: the dense s2d expansion (expand_kernel) is
    only 25% nonzero, so the MXU executes 4x the fine conv's FLOPs. Splitting
    by OUTPUT phase (di,dj) instead gives four (2,2,4Cin,Cout) kernels whose
    total MAC count is EXACTLY the fine conv's:

      out_fine[2i+di, 2j+dj] = sum_ky in_fine[2i+di+ky-1] w[ky]
      fine row 2i+di+ky-1 lives at s2d row (2i+di+ky-1)//2, input phase
      (2i+di+ky-1)%2 -> a 2-tap conv over s2d rows with per-phase taps:
        di=0: K[0,(ri=1)]=w[0], K[1,(ri=0)]=w[1], K[1,(ri=1)]=w[2]
              (rows i-1,i -> padding (1,0))
        di=1: K[0,(ri=0)]=w[0], K[0,(ri=1)]=w[1], K[1,(ri=0)]=w[2]
              (rows i,i+1 -> padding (0,1))
    Density 9/16 per phase kernel vs 9/36 dense -> 1.78x fine FLOPs if XLA
    zero-skips nothing, 1.0x useful.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    we = np.zeros((2, 2, 4 * cin, cout), w.dtype)
    for si in (0, 1):          # s2d row tap (relative to the pad-adjusted origin)
        for sj in (0, 1):
            for ri in (0, 1):  # input phase
                for rj in (0, 1):
                    # fine tap index: with padding (1-di, di), tap si covers
                    # s2d row i-1+si+di... derive ky from the identity above:
                    ky = 2 * (si - (1 - di)) + ri - di + 1
                    kx = 2 * (sj - (1 - dj)) + rj - dj + 1
                    if 0 <= ky <= 2 and 0 <= kx <= 2:
                        ci0 = (ri * 2 + rj) * cin
                        we[si, sj, ci0 : ci0 + cin] = w[ky, kx]
    return we


def phase_conv(x, wp4):
    """x: (B,H2,W2,4Cin); wp4: list of 4 (2,2,4Cin,Cout) phase kernels in
    (di,dj) order. Returns s2d-layout output (B,H2,W2,4Cout)."""
    outs = []
    for (di, dj), wp in zip(((0, 0), (0, 1), (1, 0), (1, 1)), wp4):
        outs.append(jax.lax.conv_general_dilated(
            x, wp, (1, 1), [(1 - di, di), (1 - dj, dj)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ACC_DTYPE,
        ))
    return jnp.concatenate(outs, axis=-1)


def expand_phase4(w) -> list:
    return [jnp.asarray(expand_kernel_phase(np.asarray(w), di, dj))
            for di in (0, 1) for dj in (0, 1)]


def check():
    rng = np.random.default_rng(0)
    for cin, cout in [(1, 8), (8, 8), (64, 64)]:
        x = rng.normal(size=(2, 32, 32, cin)).astype(np.float32)
        w = (rng.normal(size=(3, 3, cin, cout)) * 0.1).astype(np.float32)
        ref = s2d(conv(jnp.asarray(x), jnp.asarray(w)))
        got = conv(s2d(jnp.asarray(x)), jnp.asarray(expand_kernel(w)))
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))
        gotp = phase_conv(s2d(jnp.asarray(x)), expand_phase4(w))
        errp = float(jnp.max(jnp.abs(ref - gotp)))
        print(json.dumps({"cin": cin, "cout": cout, "max_abs_err": err,
                          "rel": err / scale, "phase_rel": errp / scale}))
        assert err / scale < 1e-5, (cin, cout, err)
        assert errp / scale < 1e-5, ("phase", cin, cout, errp)
    print("EXACT: s2d k-expansion AND polyphase split reproduce the fine "
          "conv bit-for-bit (up to fp32 reassociation)")


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.reshape(leaf, (-1,))[0].astype(jnp.float32))


def t(fn, *args, n=20, warmup=5):
    f = jax.jit(fn)
    out = None
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / n


def timing(batch: int = 128):
    """L1-shaped DoubleConv (1->64 then 64->64 @256², conv+ReLU chain),
    fine layout vs exact s2d layout, fwd and fwd+bwd."""
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    global ACC_DTYPE
    ACC_DTYPE = bf

    x = jnp.asarray(rng.normal(size=(batch, 256, 256, 1)).astype(np.float32)).astype(bf)
    w1 = (rng.normal(size=(3, 3, 1, 64)) * 0.3).astype(np.float32)
    w2 = (rng.normal(size=(3, 3, 64, 64)) * 0.05).astype(np.float32)

    xs = s2d(x)
    w1e = expand_kernel(w1)
    w2e = expand_kernel(w2)

    w1p = [w.astype(bf) for w in expand_phase4(w1)]
    w2p = [w.astype(bf) for w in expand_phase4(w2)]

    def fine(x, w1, w2):
        y = jnp.maximum(conv(x, w1), 0).astype(bf)
        return jnp.maximum(conv(y, w2), 0).astype(bf)

    def fine_loss(x, w1, w2):
        # Sum in bf16 so the backward cotangents stay bf16 (mixed-dtype
        # cotangents crash conv_general_dilated's transpose); precision is
        # irrelevant for a timing probe.
        return jnp.sum(fine(x, w1, w2) ** 2).astype(jnp.float32)

    def phase(x, w1p, w2p):
        y = jnp.maximum(phase_conv(x, w1p), 0).astype(bf)
        return jnp.maximum(phase_conv(y, w2p), 0).astype(bf)

    def phase_loss(x, w1p, w2p):
        return jnp.sum(phase(x, w1p, w2p) ** 2).astype(jnp.float32)

    gflop_fine = 2 * batch * 256 * 256 * 9 * (1 * 64 + 64 * 64) / 1e9
    args_f = (x, jnp.asarray(w1).astype(bf), jnp.asarray(w2).astype(bf))
    args_s = (xs, jnp.asarray(w1e).astype(bf), jnp.asarray(w2e).astype(bf))
    args_p = (xs, w1p, w2p)
    # polyphase MACs = 4 phases x (2x2x4Cin xCout) at (H/2)² = 16/9 of fine
    gflop_phase = gflop_fine * 16 / 9

    for name, fn, args, gf in [
        ("fine_fwd", fine, args_f, gflop_fine),
        ("s2d_fwd", fine, args_s, 4 * gflop_fine),
        ("s2dp_fwd", phase, args_p, gflop_phase),
        ("fine_fwdbwd", jax.grad(fine_loss, argnums=(0, 1, 2)), args_f, 3 * gflop_fine),
        ("s2d_fwdbwd", jax.grad(fine_loss, argnums=(0, 1, 2)), args_s, 12 * gflop_fine),
        ("s2dp_fwdbwd", jax.grad(phase_loss, argnums=(0, 1, 2)), args_p,
         3 * gflop_phase),
    ]:
        dt = t(fn, *args)
        print(json.dumps({
            "probe": name, "ms": round(dt * 1e3, 2),
            "exec_TFLOPS": round(gf / dt / 1e3, 1),
            "useful_mfu_pct": round(100 * gflop_fine * (1 if "fwd" == name[-3:] else 3)
                                    / dt / 1e3 / 197, 1),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    a = ap.parse_args()
    if a.check:
        check()
    if a.time:
        timing(a.batch)
