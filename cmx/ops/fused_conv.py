"""Fused masked DoubleConv — the SparK hot-path Pallas kernels.

Reference semantics reproduced: the SparK sparse DoubleConv stage
(/root/reference/Pretraining/Spark/encoder.py:14-36 — dense conv, re-mask,
BN over active positions, ReLU, re-mask — composed twice per block, cf.
/root/reference/Finetuning/model.py:4-26). The reference computes this as
~7 separate CUDA launches with every intermediate round-tripping through
HBM; measured on v5e the L1/L2 stages of the UNet are pure
HBM-bandwidth-bound (RESULTS.md round-2 table: 26%/49% MFU), so the TPU-native
formulation is *traffic fusion*, not sparsity:

  pass K1:  y0 = conv3x3(x) + b, re-mask, inline per-channel {sum, sumsq}
  (XLA)     fold masked batch stats -> (inv0, shift0)          [tiny, (C,)]
  pass K2:  y1 = conv3x3(relu(y0*inv0+shift0)*m) + b, re-mask, inline stats
            -- the normalize/ReLU/mask of stage 0 happens in VMEM while
               streaming y0 as K2's input: the activated tensor h0 is NEVER
               materialized in HBM.
  (XLA)     fold -> (inv1, shift1); out = relu(y1*inv1+shift1)*m fuses into
            the consumer (maxpool / next conv) for free.

Inline stats remove the separate reduction pass XLA emits per BatchNorm;
skipping h0 removes one full write+read of the biggest tensors in the
network. Backward is a hand-derived masked-BN/conv VJP (jnp; XLA fuses it
well) — pallas_call has no autodiff.

The kernels run compiled on TPU and in interpret mode on CPU (tests).
Layout contract: NHWC, bf16 activations, fp32 stats/params (CLAUDE.md).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmx.ops.pallas_ops import _auto_interpret

# Strip height per program: divides every fused resolution (128, 256) and
# keeps per-program VMEM < ~8 MB at the widest fused stage (C=256 @ 128^2).
STRIP = 32
_EPS = 1e-5

# Use the Pallas backward mega-kernel inside fused_double_conv's VJP
# (False = hand-derived jnp backward, XLA-fused). Module-level for A/B.
FUSED_BWD = True

# Default gates for DoubleConv's fused path (models/blocks.py reads these
# when its own fused_* fields are None). Module-level — flax dataclass
# field defaults are frozen at class creation, so per-class attributes
# cannot be monkeypatched for A/Bs; these can.
FUSED_MIN_HW = 128  # only stages at >= this resolution are bandwidth-bound
# (RESULTS.md round-2 per-level table); deeper stages run at 66-74% MFU
# under XLA and keep the plain path.
FUSED_IMPL = "flat"  # "flat" = channel-major (B,C,H*W) kernels (no Mosaic
# lane-padding tax); "nhwc" = the strip kernels (kept for A/B — they pay
# padded HBM copies on sub-128-channel tensors).
FUSED_MAX_CIN = 128  # widest fused input: the 256-channel decoder concat
# stage's extra flat-layout residuals push the b128 SparK step ~100 MB past
# HBM; its XLA path already runs at ~50%+ MFU.

# Kernel compute/storage dtype. bf16 in production (CLAUDE.md precision
# contract); tests flip this to float32 to compare the hand-derived VJP
# against autodiff with no rounding-noise ambiguity.
COMPUTE_DTYPE = jnp.bfloat16


def _cdt():
    return COMPUTE_DTYPE


# The K2/mega kernels' in-kernel temporaries (fp32 strip casts, 9 conv tap
# products, the fp32 accumulator) exceed Mosaic's conservative 16M default
# scoped-VMEM budget at STRIP=32; v5e has 128M physical VMEM (round-2 flag
# sweep ran scoped-vmem at 48/96M without issue).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# K1 stem kernel: im2col matmul + mask + inline stats (no halo needed — the
# 9-tap patches are pre-built by XLA for the 1-channel input, which is tiny).
# ---------------------------------------------------------------------------


def _stem_kernel(p_ref, m_ref, w_ref, b_ref, y_ref, s_ref):
    """p (1,S,W,9) patches, m (1,S,W,1), w (9,C), b (C,) ->
    y (1,S,W,C) bf16, s (1,1,8,C) rows 0=sum 1=sumsq.

    The mask rides with a trailing singleton dim so every in-kernel reshape
    merges leading dims only — lane-splitting reshapes do not lower on
    Mosaic (see cmx/ops/pallas_ops.py)."""
    _, S, W, K = p_ref.shape
    C = w_ref.shape[1]
    p = p_ref[0].reshape(S * W, K)
    acc = jnp.dot(p, w_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    m = m_ref[0].reshape(S * W, 1).astype(jnp.float32)
    acc = acc * m
    y_ref[0] = acc.reshape(S, W, C).astype(y_ref.dtype)
    ssum = jnp.sum(acc, axis=0)  # (C,)
    sq = jnp.sum(acc * acc, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)
    s_ref[0, 0] = jnp.where(rows == 0, ssum[None, :],
                            jnp.where(rows == 1, sq[None, :], 0.0))


def conv_stem_stats(
    patches: jnp.ndarray, m: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """patches (B,H,W,9) bf16, m (B,H,W), w (9,C), b (C,).

    Returns (y (B,H,W,C) bf16, sum (C,) fp32, sumsq (C,) fp32)."""
    B, H, W, K = patches.shape
    C = w.shape[1]
    nS = H // STRIP
    y, s = pl.pallas_call(
        _stem_kernel,
        grid=(B, nS),
        in_specs=[
            pl.BlockSpec((1, STRIP, W, K), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STRIP, W, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, STRIP, W, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), _cdt()),
            jax.ShapeDtypeStruct((B, nS, 8, C), jnp.float32),
        ),
        interpret=_auto_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(patches, m[..., None], w, b)
    part = jnp.sum(s, axis=(0, 1))  # (8, C)
    return y, part[0], part[1]


def make_patches9(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W) -> (B,H,W,9) zero-padded 3x3 neighborhoods (XLA one-pass)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    H, W = x.shape[1], x.shape[2]
    taps = [xp[:, dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)]
    return jnp.stack(taps, axis=-1)


# ---------------------------------------------------------------------------
# K2 general kernel: [optional in-VMEM normalize+ReLU+mask of the input] ->
# 3x3 conv (9 shifted matmuls over a halo strip) -> +bias -> mask -> stats.
#
# Halo handling: the 1-row top/bottom neighbors arrive as separate
# pre-sliced block inputs (built by one cheap XLA strided slice outside the
# kernel, ~2/STRIP of a full pass). Manual HBM->VMEM halo DMA is NOT used:
# Mosaic cannot lower row-sliced DMAs from refs whose minor dim is under
# the 128-lane tiling (every 64-channel feature map and the 1-channel
# mask), and plain blocks get pallas's automatic double-buffered
# pipelining for free.
# ---------------------------------------------------------------------------


def _halo_rows(x: jnp.ndarray, S: int):
    """(B,H,...) -> (tops, bots), each (B, nS, ...): the row above/below
    every S-row strip, zeros at the image border (= conv SAME padding)."""
    H = x.shape[1]
    z = jnp.zeros_like(x[:, :1])
    tops = jnp.concatenate([z, x[:, S - 1:H - 1:S]], axis=1)
    bots = jnp.concatenate([x[:, S:H:S], z], axis=1)
    return tops, bots


def _strip_specs(W: int, C: int):
    """Block specs for (strip, top halo row, bottom halo row) of one
    (B,H,W,C) array passed as x, tops (B,nS,W,C), bots (B,nS,W,C)."""
    return [
        pl.BlockSpec((1, STRIP, W, C), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, W, C), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, W, C), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _with_halo(blk_ref, top_ref, bot_ref):
    """(1,S,W,C) + (1,1,W,C) x2 block refs -> (S+2,W,C) value."""
    return jnp.concatenate([top_ref[0], blk_ref[0], bot_ref[0]], axis=0)


def _conv_strip(h, w_ref, b_ref, mm_center, S, W):
    """Activated halo strip (S+2,W,Cin) -> masked biased conv (S*W,C) fp32."""
    Cin = h.shape[-1]
    C = w_ref.shape[3]
    zcol = jnp.zeros((S + 2, 1, Cin), h.dtype)
    hpad = jnp.concatenate([zcol, h, zcol], axis=1)  # (S+2, W+2, Cin)
    acc = jnp.zeros((S * W, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = hpad[dy:dy + S, dx:dx + W].reshape(S * W, Cin)
            acc = acc + jnp.dot(tap, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    return acc * mm_center


def _stats_rows(acc, C):
    ssum = jnp.sum(acc, axis=0)
    sq = jnp.sum(acc * acc, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)
    return jnp.where(rows == 0, ssum[None, :],
                     jnp.where(rows == 1, sq[None, :], 0.0))


def _conv_kernel(xb, xt, xbo, mb, mt, mbo, inv_ref, shift_ref, w_ref, b_ref,
                 y_ref, s_ref, *, S: int, W: int, pre_norm: bool):
    h = _with_halo(xb, xt, xbo)          # (S+2, W, Cin)
    mm = _with_halo(mb, mt, mbo)         # (S+2, W, 1)
    if pre_norm:
        # stage-0 epilogue, fused into this conv's input read: the activated
        # tensor exists only in VMEM.
        hf = h.astype(jnp.float32) * inv_ref[...] + shift_ref[...]
        h = (jnp.maximum(hf, 0.0)
             * mm.astype(jnp.float32)).astype(xb.dtype)
    mm_center = mm[1:1 + S].reshape(S * W, 1).astype(jnp.float32)
    acc = _conv_strip(h, w_ref, b_ref, mm_center, S, W)
    C = w_ref.shape[3]
    y_ref[0] = acc.reshape(S, W, C).astype(y_ref.dtype)
    s_ref[0, 0] = _stats_rows(acc, C)


def conv3x3_mask_stats(
    src: jnp.ndarray, m: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
    inv: Optional[jnp.ndarray] = None, shift: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused [normalize-ReLU-mask ->] conv3x3 -> +b -> mask -> inline stats.

    src (B,H,W,Cin) bf16 — raw conv output of the previous stage when
    inv/shift are given (pre_norm), else an already-activated tensor.
    m (B,H,W) mask; w (3,3,Cin,C); b (C,). Returns (y bf16, sum, sumsq).
    """
    B, H, W, Cin = src.shape
    C = w.shape[3]
    pre_norm = inv is not None
    if inv is None:
        inv = jnp.ones((Cin,), jnp.float32)
        shift = jnp.zeros((Cin,), jnp.float32)
    nS = H // STRIP
    src = src.astype(_cdt())
    m4 = m.astype(_cdt())[..., None]
    st, sb = _halo_rows(src, STRIP)
    mt_, mb_ = _halo_rows(m4, STRIP)
    kernel = functools.partial(
        _conv_kernel, S=STRIP, W=W, pre_norm=pre_norm)
    y, s = pl.pallas_call(
        kernel,
        grid=(B, nS),
        in_specs=[
            *_strip_specs(W, Cin),
            *_strip_specs(W, 1),
            pl.BlockSpec((Cin,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, Cin, C), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, STRIP, W, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), _cdt()),
            jax.ShapeDtypeStruct((B, nS, 8, C), jnp.float32),
        ),
        interpret=_auto_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(src, st, sb, m4, mt_, mb_, inv, shift, w, b)
    part = jnp.sum(s, axis=(0, 1))
    return y, part[0], part[1]


# ---------------------------------------------------------------------------
# Backward mega-kernel: per stage, ONE pass computes the masked-BN dy in
# VMEM (from g and the raw conv output y + per-channel scalars) and
# immediately performs both the transposed conv (dX, 9 shifted matmuls
# against the flipped/transposed weights) and the per-strip dW partials
# against the recomputed previous activation — the dy tensor and the
# recomputed h are never materialized in HBM. The tiny per-channel sums
# (S1 = sum dz, S2 = sum dz*xhat, which are also dbeta/dgamma) come from a
# single fused XLA reduction pass beforehand (a Pallas version would read
# the same bytes — no win there).
# ---------------------------------------------------------------------------


def _bwd_mega_kernel(gb, gt, gbo, yb, yt, ybo, sb, st_, sbo, mb, mt, mbo,
                     vecs_ref, prevf_ref, wt_ref, dh_ref, dw_ref,
                     *, S: int, W: int, pre_h: bool):
    C = gb.shape[3]
    Cin = sb.shape[3]
    g = _with_halo(gb, gt, gbo).astype(jnp.float32)   # (S+2, W, C)
    y = _with_halo(yb, yt, ybo).astype(jnp.float32)
    mm = _with_halo(mb, mt, mbo).astype(jnp.float32)  # (S+2, W, 1)

    inv = vecs_ref[0]
    shift = vecs_ref[1]
    mean = vecs_ref[2]
    rr = vecs_ref[3]
    s1n = vecs_ref[4]
    s2n = vecs_ref[5]

    gate = (y * inv + shift) > 0
    dz = g * mm * gate
    xh = (y - mean) * rr
    dyv = ((mm * inv) * (dz - s1n - xh * s2n)).astype(gb.dtype)

    zc = jnp.zeros((S + 2, 1, C), dyv.dtype)
    dyp = jnp.concatenate([zc, dyv, zc], axis=1)  # (S+2, W+2, C)

    acc = jnp.zeros((S * W, Cin), jnp.float32)
    for a in range(3):
        for b in range(3):
            tap = dyp[a:a + S, b:b + W].reshape(S * W, C)
            acc = acc + jnp.dot(tap, wt_ref[a, b],
                                preferred_element_type=jnp.float32)
    dh_ref[0] = acc.reshape(S, W, Cin).astype(dh_ref.dtype)

    h = _with_halo(sb, st_, sbo)
    if pre_h:
        hf = h.astype(jnp.float32) * prevf_ref[0, :] + prevf_ref[1, :]
        h = (jnp.maximum(hf, 0.0) * mm).astype(sb.dtype)
    zci = jnp.zeros((S + 2, 1, Cin), h.dtype)
    hp = jnp.concatenate([zci, h, zci], axis=1)
    dyc = dyp[1:1 + S, 1:1 + W].reshape(S * W, C)
    parts = []
    for a in range(3):
        for b in range(3):
            taph = hp[a:a + S, b:b + W].reshape(S * W, Cin)
            parts.append(jax.lax.dot_general(
                taph, dyc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # (Cin, C)
    dw_ref[0, 0] = jnp.concatenate(parts, axis=0)


def bwd_mega(g, y, src, m, inv, shift, mean, var, s1, s2, nact, w,
             prev_fold=None, interpret: Optional[bool] = None):
    """Fused stage backward. Returns (dh (B,H,W,Cin), dW (3,3,Cin,C)).

    g: upstream grad of this stage's activated output; y: the stage's raw
    masked conv output; src: previous stage's raw conv output (with
    prev_fold=(inv_p, shift_p) to recompute h in VMEM) or an
    already-activated input; s1/s2: global sum(dz), sum(dz*xhat). Halo
    rows arrive as pre-sliced block inputs (see the K2 section note)."""
    B, H, W, C = y.shape
    Cin = src.shape[3]
    rr = jax.lax.rsqrt(var + _EPS)
    zeros = jnp.zeros_like(inv)
    vecs = jnp.stack([inv, shift, mean, rr, s1 / nact, s2 / nact,
                      zeros, zeros]).astype(jnp.float32)
    if prev_fold is None:
        prevf = jnp.zeros((8, Cin), jnp.float32)
        pre_h = False
    else:
        zi = jnp.zeros((Cin,), jnp.float32)
        prevf = jnp.stack([prev_fold[0], prev_fold[1],
                           zi, zi, zi, zi, zi, zi]).astype(jnp.float32)
        pre_h = True
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).astype(_cdt())  # (3,3,C,Cin)
    nS = H // STRIP
    g = g.astype(_cdt())
    y = y.astype(_cdt())
    src = src.astype(_cdt())
    m4 = m.astype(_cdt())[..., None]
    gt, gbo = _halo_rows(g, STRIP)
    yt, ybo = _halo_rows(y, STRIP)
    st_, sbo = _halo_rows(src, STRIP)
    mt, mbo = _halo_rows(m4, STRIP)
    kernel = functools.partial(_bwd_mega_kernel, S=STRIP, W=W, pre_h=pre_h)
    dh, dwp = pl.pallas_call(
        kernel,
        grid=(B, nS),
        in_specs=[
            *_strip_specs(W, C),
            *_strip_specs(W, C),
            *_strip_specs(W, Cin),
            *_strip_specs(W, 1),
            pl.BlockSpec((8, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, Cin), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, STRIP, W, Cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9 * Cin, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Cin), _cdt()),
            jax.ShapeDtypeStruct((B, nS, 9 * Cin, C), jnp.float32),
        ),
        interpret=_auto_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(g, gt, gbo, y, yt, ybo, src, st_, sbo, m4, mt, mbo, vecs, prevf, wt)
    dw = jnp.sum(dwp, axis=(0, 1)).reshape(3, 3, Cin, C)
    return dh, dw


# ---------------------------------------------------------------------------
# The differentiable fused DoubleConv core.
# ---------------------------------------------------------------------------


def _fold(gamma, beta, mean, var):
    inv = gamma * jax.lax.rsqrt(var + _EPS)
    return inv, beta - mean * inv


def _stats(ssum, sq, nact):
    mean = ssum / nact
    var = jnp.maximum(sq / nact - mean * mean, 0.0)
    return mean, var


def _conv(x, w):
    """Pure NHWC 3x3 SAME conv in bf16 (flax nn.Conv equivalent)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_double_conv(x, m, w0, b0, g0, be0, w1, b1, g1, be1, interpret=None):
    """Masked DoubleConv (training mode), Pallas-fused forward.

    x (B,H,W,Cin) bf16 (pre-masked by the caller, as in the unfused path);
    m (B,H,W) {0,1}; per-stage conv kernels w_i (3,3,·,C) fp32, biases b_i,
    BN scale g_i / bias be_i fp32. Returns
    (out (B,H,W,C) bf16, (mean0, var0, mean1, var1)) — the stats feed the
    flax running-average update in blocks.DoubleConv.
    """
    out, stats, _ = _fwd_impl(x, m, w0, b0, g0, be0, w1, b1, g1, be1,
                              interpret)
    return out, stats


def _fwd_impl(x, m, w0, b0, g0, be0, w1, b1, g1, be1, interpret):
    B, H, W, Cin = x.shape
    mb = m.astype(_cdt())
    nact = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
    if Cin == 1:
        patches = make_patches9(x[..., 0].astype(_cdt()))
        y0, s0, q0 = conv_stem_stats(
            patches, mb, w0.reshape(9, -1).astype(_cdt()),
            b0, interpret=interpret)
    else:
        y0, s0, q0 = conv3x3_mask_stats(
            x.astype(_cdt()), mb, w0.astype(_cdt()), b0,
            interpret=interpret)
    mean0, var0 = _stats(s0, q0, nact)
    inv0, shift0 = _fold(g0, be0, mean0, var0)
    y1, s1, q1 = conv3x3_mask_stats(
        y0, mb, w1.astype(_cdt()), b1, inv0, shift0,
        interpret=interpret)
    mean1, var1 = _stats(s1, q1, nact)
    inv1, shift1 = _fold(g1, be1, mean1, var1)
    out = (jnp.maximum(y1.astype(jnp.float32) * inv1 + shift1, 0.0)
           * m.astype(jnp.float32)[..., None]).astype(_cdt())
    res = (x, m, w0, w1, g0, be0, g1, be1, y0, y1,
           mean0, var0, mean1, var1, nact)
    return out, (mean0, var0, mean1, var1), res


def _fused_fwd(x, m, w0, b0, g0, be0, w1, b1, g1, be1, interpret):
    out, stats, res = _fwd_impl(x, m, w0, b0, g0, be0, w1, b1, g1, be1,
                                interpret)
    return (out, stats), res


def _fused_bwd(interpret, res, cts):
    """Hand-derived VJP of the fused DoubleConv.

    Per stage (weights w_i = m_i / nact, sum(w) = 1, xhat = (y-mean)*r):
      dz     = g * m * 1[gamma*xhat + beta > 0]        (mask + ReLU gate)
      dgamma = sum(dz * xhat);  dbeta = sum(dz)
      dy     = m * gamma*r * (dz - (dbeta + xhat*dgamma) / nact)
    (the outer m in dy is the pre-BN re-mask's gradient; positions with
    m=0 contribute nothing to stats, so the weighted-BN correction terms
    carry m as the weight). Conv VJPs are delegated to jax.vjp of the pure
    lax conv — XLA's own dX/dW kernels. The `var = max(var, 0)` clamp's
    subgradient at exactly 0 is taken as 1 (matches jnp.maximum's VJP
    convention in the unfused path up to the tie case).

    Stats cotangents are structurally zero: they only feed the (non-
    differentiated) running-average update. mask is data (zero cotangent).
    """
    g_out, _ = cts
    (x, m, w0, w1, g0, be0, g1, be1, y0, y1,
     mean0, var0, mean1, var1, nact) = res
    mf = m.astype(jnp.float32)[..., None]
    red = (0, 1, 2)
    inv0, shift0 = _fold(g0, be0, mean0, var0)
    inv1, shift1 = _fold(g1, be1, mean1, var1)

    def stage_sums(dout, y, mean, var, inv, shift):
        """One fused XLA pass over (dout, y): (dgamma, dbeta) = the global
        per-channel sums the masked-BN backward needs."""
        yf = y.astype(jnp.float32)
        r = jax.lax.rsqrt(var + _EPS)
        gate = (yf * inv + shift) > 0
        dz = dout.astype(jnp.float32) * mf * gate
        return jnp.sum(dz * ((yf - mean) * r), axis=red), jnp.sum(dz, axis=red)

    def stage_bwd(dout, y, mean, var, gamma, beta, dgamma, dbeta):
        yf = y.astype(jnp.float32)
        r = jax.lax.rsqrt(var + _EPS)
        xhat = (yf - mean) * r
        gate = (gamma * xhat + beta) > 0
        dz = dout.astype(jnp.float32) * mf * gate
        return mf * (gamma * r) * (dz - (dbeta + xhat * dgamma) / nact)

    # stage 1: out -> y1 -> (h0, w1, b1)
    dg1, dbe1 = stage_sums(g_out, y1, mean1, var1, inv1, shift1)
    if FUSED_BWD:
        dh0, dw1 = bwd_mega(g_out, y1, y0, m, inv1, shift1, mean1, var1,
                            dbe1, dg1, nact, w1, prev_fold=(inv0, shift0),
                            interpret=interpret)
        # d(conv bias) is exactly 0 through batch norm (the normalization
        # absorbs any per-channel shift of active positions — verified vs
        # fp32 autodiff in tests); the unfused path's nonzero db is bf16
        # cast noise.
        db1 = jnp.zeros_like(dbe1)
    else:
        dy1 = stage_bwd(g_out, y1, mean1, var1, g1, be1, dg1, dbe1)
        db1 = jnp.sum(dy1, axis=red)
        h0 = (jnp.maximum(y0.astype(jnp.float32) * inv0 + shift0, 0.0)
              * mf).astype(_cdt())
        dh0, dw1 = _conv_vjp(h0, w1, dy1.astype(_cdt()))

    # stage 0: h0 -> y0 -> (x, w0, b0)
    dg0, dbe0 = stage_sums(dh0, y0, mean0, var0, inv0, shift0)
    if FUSED_BWD and x.shape[-1] >= 8:
        dx, dw0 = bwd_mega(dh0, y0, x.astype(_cdt()), m, inv0, shift0,
                           mean0, var0, dbe0, dg0, nact, w0,
                           prev_fold=None, interpret=interpret)
        db0 = jnp.zeros_like(dbe0)
    else:
        dy0 = stage_bwd(dh0, y0, mean0, var0, g0, be0, dg0, dbe0)
        db0 = jnp.sum(dy0, axis=red)
        dx, dw0 = _conv_vjp(x.astype(_cdt()), w0, dy0.astype(_cdt()))
    return (dx.astype(x.dtype), jnp.zeros_like(m),
            dw0.astype(jnp.float32), db0, dg0, dbe0,
            dw1.astype(jnp.float32), db1, dg1, dbe1)


def _conv_vjp(h, w, dy):
    """(dinput, dkernel) of the pure bf16 NHWC 3x3 SAME conv.

    Operates fully in bf16 (fp32 MXU accumulation inside) — the same
    precision profile the unfused flax path's autodiff has."""
    _, vjp = jax.vjp(_conv, h.astype(_cdt()), w.astype(_cdt()))
    dinp, dker = vjp(dy.astype(_cdt()))
    return dinp, dker


fused_double_conv.defvjp(_fused_fwd, _fused_bwd)


def double_conv_reference(x, m, w0, b0, g0, be0, w1, b1, g1, be1):
    """Unfused jnp reference of the same masked DoubleConv (training mode)
    for tests: mirrors blocks.DoubleConv's op order exactly."""
    mf = m.astype(jnp.float32)[..., None]
    nact = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
    stats = []

    def stage(h, w, b, gamma, beta):
        y = _conv(h.astype(_cdt()), w.astype(_cdt()))
        y = (y + b.astype(y.dtype)).astype(jnp.float32) * mf
        mean = jnp.sum(y, axis=(0, 1, 2)) / nact
        var = jnp.maximum(jnp.sum(y * y, axis=(0, 1, 2)) / nact - mean ** 2,
                          0.0)
        stats.append((mean, var))
        inv, shift = _fold(gamma, beta, mean, var)
        return (jnp.maximum(y * inv + shift, 0.0) * mf).astype(_cdt())

    h = stage(x, w0, b0, g0, be0)
    out = stage(h, w1, b1, g1, be1)
    return out, (stats[0][0], stats[0][1], stats[1][0], stats[1][1])
