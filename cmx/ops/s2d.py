"""Space-to-depth (s2d) execution of the full-resolution UNet stage.

Motivation (RESULTS round 2/4): the L1 DoubleConv (256²×64ch) runs at 26%
MFU, bandwidth-bound, and is the largest single consumer of the SparK step;
64 output channels only half-fill the TPU's 128-wide lane axis. Executing
the SAME math on the s2d layout (B,H/2,W/2,4·C) fills the lanes (256
channels) and quarters the spatial extent.

Exactness: a stride-1 SAME 3×3 conv at fine resolution is exactly
re-expressible on the s2d layout. The dense k-expansion (4C→4C', 3×3) is
only 25% nonzero — the MXU would execute 4× the fine FLOPs, unwinnable.
This module uses the POLYPHASE decomposition instead: output phase
(di,dj) ∈ {0,1}² is a 2×2 conv over the 4C input with per-phase padding,

  out_fine[2i+di, 2j+dj] = Σ_ky in_fine[2i+di+ky-1]·w[ky]      (per dim)
  fine row 2i+di+ky-1 ≡ s2d row (2i+di+ky-1)//2, phase (2i+di+ky-1)%2

so the four phase kernels together execute EXACTLY the fine conv's MAC
count (each fine tap appears in exactly one phase kernel slot); density is
9/16 per phase kernel. Verified bit-exact (up to fp32 reassociation) in
tools/ab_s2d.py --check and tests/test_s2d.py.

Layout convention (matches s2d()): rank-5 (B, H/2, W/2, phase, C) with
phase = 2·(row parity) + (col parity); flattening (phase, C) gives the
phase-major rank-4 layout the phase convs consume.

Everything here consumes the STANDARD parameter tree (fine-layout 3×3
kernels, (C,) BN stats), expanding weights at trace time — s2d and fine
checkpoints are interchangeable by construction.

Reference parity: this changes nothing semantically vs
/root/reference/Finetuning/model.py:4-45 — it is an execution-layout
choice, exactness-tested against the fine path.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

PHASES: Sequence = ((0, 0), (0, 1), (1, 0), (1, 1))


def s2d5(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4, C); phase index = 2*ri + rj."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4, c)


def d2s5(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H/2, W/2, 4, C) -> (B, H, W, C)."""
    b, h2, w2, p, c = y.shape
    assert p == 4
    x = y.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def expand_kernel_phase(w: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """Fine (3,3,Cin,Cout) SAME stride-1 kernel -> the (2,2,4Cin,Cout)
    polyphase kernel for output phase (di,dj), used with explicit padding
    ((1-di, di), (1-dj, dj)). Static python loops; traced once per jit."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), w.shape
    we = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for si in (0, 1):
        for sj in (0, 1):
            for ri in (0, 1):
                for rj in (0, 1):
                    ky = 2 * (si - (1 - di)) + ri - di + 1
                    kx = 2 * (sj - (1 - dj)) + rj - dj + 1
                    if 0 <= ky <= 2 and 0 <= kx <= 2:
                        ci0 = (ri * 2 + rj) * cin
                        we = we.at[si, sj, ci0 : ci0 + cin].set(w[ky, kx])
    return we


def phase_conv5(x5: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """SAME stride-1 3×3 conv executed in s2d space.

    x5: (B,H2,W2,4,Cin) rank-5 s2d tensor; kernel: fine (3,3,Cin,Cout)
    fp32 param; bias: (Cout,). Returns (B,H2,W2,4,Cout).
    """
    b, h2, w2, p, cin = x5.shape
    x4 = x5.reshape(b, h2, w2, 4 * cin)
    outs = []
    for di, dj in PHASES:
        wp = expand_kernel_phase(kernel, di, dj).astype(dtype)
        outs.append(jax.lax.conv_general_dilated(
            x4, wp, (1, 1), [(1 - di, di), (1 - dj, dj)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dtype))
    out = jnp.stack(outs, axis=3)  # (B,H2,W2,4,Cout), phase = 2di+dj
    return out + bias.astype(dtype)


def phase_max(x5: jnp.ndarray) -> jnp.ndarray:
    """2×2 stride-2 max pool of the underlying fine tensor = max over the
    phase axis — the pool window IS the phase group. (B,H2,W2,4,C)->(B,H2,W2,C)."""
    return jnp.max(x5, axis=3)


def up_transpose5(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    """ConvTranspose(k=2, s=2) emitting the s2d layout directly.

    For non-overlapping k=s=2, out_fine[2i+di, 2j+dj, o] =
    Σ_c in[i,j,c]·K[di,dj,c,o] — one matmul per input pixel whose (di,dj,o)
    block IS the rank-5 phase layout, so no depth-to-space transpose is ever
    materialized (the transpose is what made PixelShuffleUpsample2x lose
    end-to-end, cmx/models/blocks.py:408-414). `kernel` is the standard
    nn.ConvTranspose (2,2,Cin,Cout) param — flipped here exactly like
    PixelShuffleUpsample2x so checkpoints interchange.
    """
    b, h2, w2, cin = x.shape
    cout = kernel.shape[-1]
    k = kernel[::-1, ::-1].astype(dtype)           # match nn.ConvTranspose
    k = k.transpose(2, 0, 1, 3).reshape(cin, 4 * cout)
    y = jnp.einsum("bhwc,ck->bhwk", x.astype(dtype), k,
                   preferred_element_type=jnp.float32)
    y = y.reshape(b, h2, w2, 4, cout)               # phase = 2di+dj
    return (y + bias.astype(jnp.float32)).astype(dtype)
