"""Channel-major flat-layout fused conv kernels (the padding-free variant).

cmx/ops/fused_conv.py's NHWC strip kernels lower on Mosaic but pay a
lane-padding tax: every operand/output with channels < 128 gets a padded
tiled HBM copy (measured 6.6 GB temps for a 1 GB input — RESULTS.md round
3). This module stores feature maps CHANNEL-MAJOR and FLAT — (B, C, H*W)
— so the lane dimension is the pixel axis (always a multiple of 128) and
sublanes are channels: no padding, no in-kernel reshapes at all.

Kernel algebra (one 3x3 SAME conv + mask + inline stats):
  * strip block (1, C, S*W) + two halo-row blocks (1, C, W)
  * lane-concat -> (C, (S+2)W); horizontal taps = pltpu.roll(+-1 lane) with
    row-boundary columns re-zeroed (iota % W masks); vertical taps =
    128-aligned lane slices at dy*W offsets
  * 9 x dot_general((Cin, Cout), (Cin, L)) -> acc (Cout, L) fp32
  * + bias (C,1), * mask (1, S*W) sublane-broadcast, inline sum/sumsq
  (per-channel constants travel as (C,1) columns: channels are
  SUBLANES here, so 1-D lane-major vectors would need relayouts)

Reference semantics as fused_conv.py (Spark/encoder.py:14-36 stage).
NHWC <-> flat conversion happens only at fused-region boundaries:
(B,H,W,C) -> (B,C,H*W) is one XLA transpose; between fused stages the
data stays flat (maxpool runs on the free (B,C,H,W) view).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmx.ops.pallas_ops import _auto_interpret
from cmx.ops.fused_conv import _EPS, _COMPILER_PARAMS, _cdt, _fold, _stats

STRIP = 32  # rows per program


def nhwc_to_flat(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,C,H*W)."""
    B, H, W, C = x.shape
    return x.transpose(0, 3, 1, 2).reshape(B, C, H * W)


def flat_to_nhwc(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B,C,H*W) -> (B,H,W,C)."""
    B, C, _ = x.shape
    return x.reshape(B, C, H, W).transpose(0, 2, 3, 1)


def _edge_masks(C: int, L: int, W: int, dtype):
    """(C, L) multiplicative masks zeroing row-wrap columns after lane
    rolls. left tap (h[l-1] = roll +1): col 0 wrapped from the previous
    row's last column; right tap (h[l+1] = roll -1): col W-1 wrapped from
    the next row's first column."""
    col = jax.lax.broadcasted_iota(jnp.int32, (C, L), 1) % W
    left_ok = (col != 0).astype(dtype)
    right_ok = (col != W - 1).astype(dtype)
    return left_ok, right_ok


def _flat_conv_kernel(xb, xt, xbo, mb, inv_ref, shift_ref, w_ref, b_ref,
                      y_ref, s_ref, *, S: int, W: int, pre_norm: bool):
    C = w_ref.shape[2]
    Cin = xb.shape[1]
    L = S * W
    h = jnp.concatenate([xt[0, 0], xb[0], xbo[0, 0]], axis=1)  # (Cin,(S+2)W)
    mm = mb[0, 0]  # (1, S*W) -> broadcasts along sublanes
    if pre_norm:
        # previous stage's normalize+ReLU+mask fused into this read; the
        # caller passes the mask WITH halo rows as (1, (S+2)W).
        mmh = mb[0, 0]
        hf = h.astype(jnp.float32) * inv_ref[...] + shift_ref[...]
        h = (jnp.maximum(hf, 0.0) * mmh).astype(xb.dtype)
        mm = mmh[:, W:W + L]
    left_ok, right_ok = _edge_masks(Cin, h.shape[1], W, h.dtype)
    # Mosaic's lane rotate is 32-bit only ("Rotate with non-32-bit data"):
    # roll in fp32 and cast back. Shift must be non-negative (-1 == size-1).
    h32 = h.astype(jnp.float32)
    left = pltpu.roll(h32, 1, 1).astype(h.dtype) * left_ok    # h[l-1]
    right = pltpu.roll(h32, h.shape[1] - 1, 1).astype(h.dtype) * right_ok
    taps = (left, h, right)
    acc = jnp.zeros((C, L), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice_in_dim(taps[dx], dy * W, dy * W + L, axis=1)
            acc = acc + jax.lax.dot_general(
                w_ref[3 * dy + dx], tap, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    acc = acc * mm.astype(jnp.float32)
    y_ref[0] = acc.astype(y_ref.dtype)
    ssum = jnp.sum(acc, axis=1)  # (C,)
    sq = jnp.sum(acc * acc, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)
    part = jnp.where(rows == 0, ssum[None, :],
                     jnp.where(rows == 1, sq[None, :], 0.0))
    # TPU grids run sequentially and this output block's index is constant,
    # so it stays resident in VMEM: accumulate across ALL programs instead
    # of materializing (B, nS, 8, C) partials in HBM.
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        s_ref[0, 0] = part

    @pl.when(jnp.logical_not(first))
    def _():
        s_ref[0, 0] = s_ref[0, 0] + part


def flat_conv3x3_mask_stats(
    src: jnp.ndarray, m: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
    H: int, W: int,
    inv: Optional[jnp.ndarray] = None, shift: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """src (B,Cin,H*W) flat; m (B,1,H*W) {0,1}; w (3,3,Cin,C); b (C,).

    Returns (y (B,C,H*W) masked conv out, sum (C,), sumsq (C,)).
    With inv/shift given, src is the previous stage's RAW conv output and
    the normalize/ReLU/mask epilogue runs in VMEM on the fly (pre_norm).
    """
    B, Cin, HW = src.shape
    C = w.shape[3]
    pre_norm = inv is not None
    nS = H // STRIP
    L = STRIP * W
    # halo rows: (B, nS, Cin, W) top/bottom neighbor rows, zero at borders
    s4 = src.reshape(B, Cin, H, W)
    z = jnp.zeros((B, Cin, 1, W), src.dtype)
    tops = jnp.concatenate([z, s4[:, :, STRIP - 1:H - 1:STRIP]], axis=2)
    bots = jnp.concatenate([s4[:, :, STRIP:H:STRIP], z], axis=2)
    tops = tops.transpose(0, 2, 1, 3)  # (B, nS, Cin, W)
    bots = bots.transpose(0, 2, 1, 3)
    if pre_norm:
        # mask with halo rows: (B, nS, 1, (S+2)W)
        m4 = m.reshape(B, 1, H, W)
        mz = jnp.zeros((B, 1, 1, W), m.dtype)
        mtop = jnp.concatenate([mz, m4[:, :, STRIP - 1:H - 1:STRIP]], axis=2)
        mbot = jnp.concatenate([m4[:, :, STRIP:H:STRIP], mz], axis=2)
        mstr = m.reshape(B, 1, nS, L).transpose(0, 2, 1, 3)
        mfull = jnp.concatenate(
            [mtop.transpose(0, 2, 1, 3), mstr, mbot.transpose(0, 2, 1, 3)],
            axis=3)  # (B, nS, 1, (S+2)W)
        mask_arg = mfull
        mask_block = (1, 1, 1, (STRIP + 2) * W)
        w_inv = inv[:, None]
        w_shift = shift[:, None]
    else:
        mask_arg = m.reshape(B, 1, nS, L).transpose(0, 2, 1, 3)
        mask_block = (1, 1, 1, L)
        w_inv = jnp.ones((Cin, 1), jnp.float32)
        w_shift = jnp.zeros((Cin, 1), jnp.float32)
    wk = w.reshape(9, Cin, C).astype(src.dtype)
    kernel = functools.partial(
        _flat_conv_kernel, S=STRIP, W=W, pre_norm=pre_norm)
    y, s = pl.pallas_call(
        kernel,
        grid=(B, nS),
        in_specs=[
            pl.BlockSpec((1, Cin, L), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cin, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cin, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mask_block, lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cin, C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, C, L), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, C), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, C, HW), src.dtype),
            jax.ShapeDtypeStruct((1, 1, 8, C), jnp.float32),
        ),
        interpret=_auto_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(src, tops, bots, mask_arg, w_inv, w_shift, wk, b[:, None])
    return y, s[0, 0, 0], s[0, 0, 1]

# ---------------------------------------------------------------------------
# Flat backward mega-kernel (analog of fused_conv._bwd_mega_kernel): one
# pass computes the masked-BN dy in VMEM and immediately performs the
# transposed conv (dX) and the per-strip dW partials.
# ---------------------------------------------------------------------------


def _flat_bwd_kernel(gb, gt, gbo, yb, yt, ybo, sb, st_, sbo, mb,
                     vecs_ref, prevf_ref, wt_ref, dh_ref, dw_ref,
                     *, S: int, W: int, pre_h: bool):
    C = gb.shape[1]
    Cin = sb.shape[1]
    L = S * W
    g = jnp.concatenate([gt[0, 0], gb[0], gbo[0, 0]], axis=1).astype(jnp.float32)
    y = jnp.concatenate([yt[0, 0], yb[0], ybo[0, 0]], axis=1).astype(jnp.float32)
    mm = mb[0, 0].astype(jnp.float32)          # (1, (S+2)W) with halo

    inv = vecs_ref[:, 0:1]
    shift = vecs_ref[:, 1:2]
    mean = vecs_ref[:, 2:3]
    rr = vecs_ref[:, 3:4]
    s1n = vecs_ref[:, 4:5]
    s2n = vecs_ref[:, 5:6]

    gate = (y * inv + shift) > 0
    dz = g * mm * gate
    xh = (y - mean) * rr
    dyv = ((mm * inv) * (dz - s1n - xh * s2n))  # fp32 (C, (S+2)W)

    left_ok, right_ok = _edge_masks(C, dyv.shape[1], W, jnp.float32)
    dyl = pltpu.roll(dyv, 1, 1) * left_ok
    dyr = pltpu.roll(dyv, dyv.shape[1] - 1, 1) * right_ok
    dyb16 = dyv.astype(gb.dtype)
    taps = (dyl.astype(gb.dtype), dyb16, dyr.astype(gb.dtype))

    acc = jnp.zeros((Cin, L), jnp.float32)
    for a in range(3):
        for b in range(3):
            tap = jax.lax.slice_in_dim(taps[b], a * W, a * W + L, axis=1)
            acc = acc + jax.lax.dot_general(
                wt_ref[3 * a + b], tap, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    dh_ref[0] = acc.astype(dh_ref.dtype)

    h = jnp.concatenate([st_[0, 0], sb[0], sbo[0, 0]], axis=1)
    if pre_h:
        hf = h.astype(jnp.float32) * prevf_ref[:, 0:1] + prevf_ref[:, 1:2]
        h = (jnp.maximum(hf, 0.0) * mm).astype(sb.dtype)
    hl_ok, hr_ok = _edge_masks(Cin, h.shape[1], W, h.dtype)
    h32 = h.astype(jnp.float32)
    hleft = pltpu.roll(h32, 1, 1).astype(h.dtype) * hl_ok
    hright = pltpu.roll(h32, h.shape[1] - 1, 1).astype(h.dtype) * hr_ok
    htaps = (hleft, h, hright)
    dyc = jax.lax.slice_in_dim(dyb16, W, W + L, axis=1)  # center rows
    parts = []
    for a in range(3):
        for b in range(3):
            # dW[a,b][ci,co] = sum_l h[ci, l + (a-1,b-1)] * dy[co, l]
            taph = jax.lax.slice_in_dim(htaps[b], a * W, a * W + L, axis=1)
            parts.append(jax.lax.dot_general(
                taph, dyc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))  # (Cin, C)
    dwp = jnp.concatenate(parts, axis=0)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[0, 0] = dwp

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[0, 0] = dw_ref[0, 0] + dwp


def flat_bwd_mega(g, y, src, m, inv, shift, mean, var, s1, s2, nact, w,
                  H, W, prev_fold=None, interpret: Optional[bool] = None):
    """Flat-layout fused stage backward: (dh (B,Cin,HW), dW (3,3,Cin,C)).

    Same contract as fused_conv.bwd_mega but over (B,C,H*W) operands."""
    B, C, HW = y.shape
    Cin = src.shape[1]
    rr = jax.lax.rsqrt(var + _EPS)
    zeros = jnp.zeros_like(inv)
    vecs = jnp.stack([inv, shift, mean, rr, s1 / nact, s2 / nact,
                      zeros, zeros], axis=1).astype(jnp.float32)  # (C, 8)
    if prev_fold is None:
        prevf = jnp.zeros((Cin, 8), jnp.float32)
        pre_h = False
    else:
        prevf = jnp.stack(
            [prev_fold[0], prev_fold[1]] + [jnp.zeros((Cin,))] * 6,
            axis=1).astype(jnp.float32)
        pre_h = True
    # dX kernel: dh = conv(dy, W flipped + channel-transposed)
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # (3,3,C,Cin)
    wtk = wt.reshape(9, C, Cin).astype(g.dtype)
    nS = H // STRIP
    L = STRIP * W

    def halo(xf, Cx):
        x4 = xf.reshape(B, Cx, H, W)
        z = jnp.zeros((B, Cx, 1, W), xf.dtype)
        t = jnp.concatenate([z, x4[:, :, STRIP - 1:H - 1:STRIP]], axis=2)
        bo = jnp.concatenate([x4[:, :, STRIP:H:STRIP], z], axis=2)
        return t.transpose(0, 2, 1, 3), bo.transpose(0, 2, 1, 3)

    g = g.astype(_cdt())
    y = y.astype(_cdt())
    src = src.astype(_cdt())
    gt, gbo = halo(g, C)
    yt, ybo = halo(y, C)
    st_, sbo = halo(src, Cin)
    # mask with halos (B, nS, 1, (S+2)W)
    m4 = m.reshape(B, 1, H, W)
    mz = jnp.zeros((B, 1, 1, W), m.dtype)
    mtop = jnp.concatenate([mz, m4[:, :, STRIP - 1:H - 1:STRIP]], axis=2)
    mbot = jnp.concatenate([m4[:, :, STRIP:H:STRIP], mz], axis=2)
    mstr = m.reshape(B, 1, nS, L).transpose(0, 2, 1, 3)
    mfull = jnp.concatenate(
        [mtop.transpose(0, 2, 1, 3), mstr, mbot.transpose(0, 2, 1, 3)], axis=3)
    kernel = functools.partial(_flat_bwd_kernel, S=STRIP, W=W, pre_h=pre_h)
    dh, dwp = pl.pallas_call(
        kernel,
        grid=(B, nS),
        in_specs=[
            pl.BlockSpec((1, C, L), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, L), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cin, L), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cin, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cin, W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, (STRIP + 2) * W), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, Cin), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Cin, L), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9 * Cin, C), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Cin, HW), y.dtype),
            jax.ShapeDtypeStruct((1, 1, 9 * Cin, C), jnp.float32),
        ),
        interpret=_auto_interpret(interpret),
        compiler_params=_COMPILER_PARAMS,
    )(g, gt, gbo, y, yt, ybo, src, st_, sbo, mfull, vecs, prevf, wtk)
    dw = dwp[0, 0].reshape(3, 3, Cin, C)
    return dh, dw


# ---------------------------------------------------------------------------
# The differentiable flat DoubleConv core (drop-in semantics of
# fused_conv.fused_double_conv, flat layout inside).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def flat_double_conv(xf, mflat, w0, b0, g0, be0, w1, b1, g1, be1,
                     H, W, interpret=None):
    """Masked DoubleConv over flat operands: xf (B,Cin,H*W) pre-masked,
    mflat (B,1,H*W). Returns (out (B,C,H*W), (mean0,var0,mean1,var1))."""
    out, stats, _ = _flat_fwd_impl(xf, mflat, w0, b0, g0, be0, w1, b1, g1,
                                   be1, H, W, interpret)
    return out, stats


def _flat_fwd_impl(xf, mflat, w0, b0, g0, be0, w1, b1, g1, be1, H, W,
                   interpret):
    xf = xf.astype(_cdt())
    mflat = mflat.astype(_cdt())
    nact = jnp.maximum(jnp.sum(mflat.astype(jnp.float32)), 1.0)
    y0, s0, q0 = flat_conv3x3_mask_stats(
        xf, mflat, w0, b0, H, W, interpret=interpret)
    mean0, var0 = _stats(s0, q0, nact)
    inv0, shift0 = _fold(g0, be0, mean0, var0)
    y1, s1, q1 = flat_conv3x3_mask_stats(
        y0, mflat, w1, b1, H, W, inv0, shift0, interpret=interpret)
    mean1, var1 = _stats(s1, q1, nact)
    inv1, shift1 = _fold(g1, be1, mean1, var1)
    out = (jnp.maximum(
        y1.astype(jnp.float32) * inv1[:, None] + shift1[:, None], 0.0)
        * mflat.astype(jnp.float32)).astype(_cdt())
    res = (xf, mflat, w0, w1, g0, be0, g1, be1, y0, y1,
           mean0, var0, mean1, var1, nact)
    return out, (mean0, var0, mean1, var1), res


def _flat_fwd(xf, mflat, w0, b0, g0, be0, w1, b1, g1, be1, H, W, interpret):
    out, stats, res = _flat_fwd_impl(xf, mflat, w0, b0, g0, be0, w1, b1, g1,
                                     be1, H, W, interpret)
    return (out, stats), res


def _flat_bwd(H, W, interpret, res, cts):
    """Backward via flat_bwd_mega per stage (see fused_conv._fused_bwd for
    the masked-BN algebra; conv biases get exact-zero grads — batch norm
    absorbs them)."""
    g_out, _ = cts
    (xf, mflat, w0, w1, g0, be0, g1, be1, y0, y1,
     mean0, var0, mean1, var1, nact) = res
    mf = mflat.astype(jnp.float32)
    red = (0, 2)
    inv0, shift0 = _fold(g0, be0, mean0, var0)
    inv1, shift1 = _fold(g1, be1, mean1, var1)

    def stage_sums(dout, y, mean, var, inv, shift):
        yf = y.astype(jnp.float32)
        r = jax.lax.rsqrt(var + _EPS)
        gate = (yf * inv[:, None] + shift[:, None]) > 0
        dz = dout.astype(jnp.float32) * mf * gate
        xh = (yf - mean[:, None]) * r[:, None]
        return jnp.sum(dz * xh, axis=red), jnp.sum(dz, axis=red)

    dg1, dbe1 = stage_sums(g_out, y1, mean1, var1, inv1, shift1)
    dh0, dw1 = flat_bwd_mega(g_out, y1, y0, mflat, inv1, shift1, mean1,
                             var1, dbe1, dg1, nact, w1, H, W,
                             prev_fold=(inv0, shift0), interpret=interpret)
    dg0, dbe0 = stage_sums(dh0, y0, mean0, var0, inv0, shift0)
    dx, dw0 = flat_bwd_mega(dh0, y0, xf, mflat, inv0, shift0, mean0, var0,
                            dbe0, dg0, nact, w0, H, W,
                            prev_fold=None, interpret=interpret)
    zc = jnp.zeros_like(dbe1)
    return (dx.astype(xf.dtype), jnp.zeros_like(mflat),
            dw0.astype(jnp.float32), jnp.zeros_like(dbe0), dg0, dbe0,
            dw1.astype(jnp.float32), zc, dg1, dbe1)


flat_double_conv.defvjp(_flat_fwd, _flat_bwd)
