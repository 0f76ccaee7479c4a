"""UNet building blocks, TPU-first.

Functional (flax.linen) re-design of the reference blocks
(/root/reference/Finetuning/model.py:4-81): DoubleConv = Conv3x3-BN-ReLU x2,
DownBlock = DoubleConv -> maxpool2, UpBlock = (convT 2x2 s2 | bilinear x2) ->
skip-concat -> DoubleConv.

TPU-first choices (not a translation of the torch code):
  * NHWC layout — TPU conv kernels want channels-last so the channel dim maps
    onto the 128-lane axis of the MXU/VPU.
  * bf16 compute / fp32 params & BN stats — MXU native precision, fp32
    accumulation via `preferred_element_type` inside XLA's conv.
  * BatchNorm batch statistics are computed with plain jnp reductions over the
    (possibly sharded) batch axis; under pjit a batch-sharded input makes these
    reductions global, which *is* SyncBatchNorm (reference needs an explicit
    SyncBN wrapper + NCCL, cf. /root/reference/Pretraining/Spark/encoder.py:55).
  * Optional SparK-style activation mask: sparsity on TPU is expressed as a
    mask-multiply after each dense op (the reference does exactly this on GPU,
    Spark/encoder.py:20-23) and masked-moment BatchNorm instead of
    gather->BN1d->scatter (numerically identical, XLA-fusable).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# BatchNorm variance formulation — see the comment block inside
# MaskedBatchNorm.__call__ for the taxonomy and the measured A/B.
BN_VARIANT = os.environ.get("CMX_BN_VARIANT", "shift_ra")


class MaskedBatchNorm(nn.Module):
    """BatchNorm over *active* positions only.

    Reference semantics: SparK gathers active pixels, runs BN1d, scatters back
    (/root/reference/Pretraining/Spark/encoder.py:26-36). On TPU gather/scatter
    is hostile; the numerically identical formulation is mask-weighted moments:
      mean = sum(x * m) / sum(m);   var = sum((x - mean)^2 * m) / sum(m)
    computed per-channel, then normalize everywhere and re-mask downstream.
    (Implementation computes the variance via one-pass shifted moments — see
    the inline comment — accurate to ~1e-6 relerr incl. the |mean| >> std
    regime, without the two-pass form's -12% HBM cost; fp64 inputs use the
    exact two-pass form.)

    With `mask=None` this is exactly vanilla BatchNorm (used by the dense
    model). Running stats are stored in the `batch_stats` collection; under a
    batch-sharded pjit the reductions are global => SyncBN for free.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    features: Optional[int] = None  # required only for the x=None modes

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],
        mask: Optional[jnp.ndarray] = None,
        precomputed: Optional[tuple] = None,
    ):
        """Standard call: normalize x (batch or running stats).

        Two extra modes serve the fused DoubleConv path (cmx.ops.fused_conv),
        which computes the batch moments inside its Pallas kernels:
          * x=None, precomputed=None -> declare params only, return
            (scale, bias) so the caller can hand them to the kernel.
          * x=None, precomputed=(mean, var) -> apply the running-average
            update with the externally computed moments (bookkeeping only).
        Both keep this module's param/variable tree byte-identical to the
        standard path, so fused and unfused checkpoints interchange.
        """
        c = x.shape[-1] if x is not None else self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if x is None and precomputed is None:
            return scale, bias
        if precomputed is not None:
            mean, var = precomputed
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
            if x is None:
                return None
        elif self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # fp32 moment math for bf16 inputs; fp64 inputs keep fp64 (the
            # fp64 spatial-parity test needs full-precision reductions).
            stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
            xf = x.astype(stat_dtype)
            red = tuple(range(x.ndim - 1))  # (B, H, W)
            # Variance formula: plain E[x^2]-mean^2 ("naive") cancels
            # catastrophically once |mean| >> std (the UNet bottleneck
            # regime), but the exact two-pass centered form re-reads the
            # full activation (HBM-bound). Default compromise: one-pass
            # SHIFTED moments
            #   var = E[(x-s)^2] - E[x-s]^2
            # with s = stop-gradient of the stored RUNNING mean ("shift_ra").
            # The shift is a (C,)-sized constant known before the pass, so
            # the reductions fuse exactly like the naive form (no extra read
            # of x) and it is identical between a single device and any
            # sharded mesh (no reduction computes it). Accuracy: the
            # cancellation term is ~eps*(1+((mean-s)/std)^2); the running
            # mean lags the batch mean by ~10 steps of drift, which training
            # keeps << 1 sigma/step, so the error stays ~eps throughout
            # (envelope pinned in tests/test_masked_bn.py). On the FIRST
            # steps s=0 degrades to the naive formula — exactly when the
            # large-mean regime cannot have developed yet. Measured A/B
            # (v5e, SparK b128@256^2 step, RESULTS round 4):
            #   naive 390.2 img/s | shift_ra 386.7 | shift_max 351.8 |
            #   two_pass 339.5
            # shift_max (s = per-channel max of an 8-strided spatial
            # subsample; accurate from step 1) loses 10%: the extra
            # subsample reduction breaks XLA's fusion of the big moment
            # reductions. All variants stay selectable via CMX_BN_VARIANT.
            # fp64 inputs always use two_pass: the fp64 spatial-parity
            # harness needs ~1e-15 reductions and doesn't care about speed.
            variant = "two_pass" if stat_dtype == jnp.float64 else BN_VARIANT
            sub = (slice(None),) + (slice(None, None, 8),) * (x.ndim - 2)
            if mask is None:
                if variant == "two_pass":
                    mean = jnp.mean(xf, axis=red)
                    var = jnp.mean(jnp.square(xf - mean), axis=red)
                else:
                    if variant == "shift_ra":
                        s = jax.lax.stop_gradient(
                            ra_mean.value.astype(stat_dtype))
                    elif variant == "shift_max":
                        s = jax.lax.stop_gradient(jnp.max(xf[sub], axis=red))
                    else:  # naive
                        s = jnp.zeros((c,), stat_dtype)
                    d = xf - s
                    dm = jnp.mean(d, axis=red)
                    mean = dm + s
                    var = jnp.mean(jnp.square(d), axis=red) - jnp.square(dm)
            else:
                m = mask.astype(stat_dtype)
                if m.ndim == x.ndim - 1:
                    m = m[..., None]
                denom = jnp.maximum(jnp.sum(m, axis=red), 1.0)
                if variant == "two_pass":
                    mean = jnp.sum(xf * m, axis=red) / denom
                    var = jnp.sum(jnp.square(xf - mean) * m, axis=red) / denom
                else:
                    if variant == "shift_ra":
                        s = jax.lax.stop_gradient(
                            ra_mean.value.astype(stat_dtype))
                    elif variant == "shift_max":
                        # max over ACTIVE subsampled positions (-inf-fill
                        # the masked ones); all-masked subsample -> 0.
                        neg = jnp.asarray(-3e38, stat_dtype)
                        s = jnp.max(jnp.where(m[sub] > 0, xf[sub] * m[sub],
                                              neg), axis=red)
                        s = jax.lax.stop_gradient(
                            jnp.where(s < -1e37, jnp.zeros_like(s), s))
                    else:  # naive
                        s = jnp.zeros((c,), stat_dtype)
                    # masked shifted moments: sum((x-s)*m)/denom = mean - s
                    # (active fraction of m sums to denom), so mean = dm + s.
                    d = (xf - s) * m
                    dm = jnp.sum(d, axis=red) / denom
                    mean = dm + s
                    var = jnp.sum(jnp.square(d), axis=red) / denom \
                        - jnp.square(dm)
            mean = mean.astype(jnp.float32)
            var = jnp.maximum(var, 0.0).astype(jnp.float32)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        # Normalize as ONE fused multiply-add in the compute dtype: the
        # per-channel inv/shift are folded in fp32 (cheap, (C,)-sized), the
        # (B,H,W,C) math runs in `dtype`. In bf16 this halves the HBM traffic
        # of the normalize chain fwd+bwd vs materializing fp32 intermediates;
        # it matches the reference's AMP training precision (CM-UNet
        # AmpOptimWrapper, cmunet_config.py:76-78). With dtype=fp32 it equals
        # the textbook form up to one fp32 rounding (folded constants).
        out_dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        return x.astype(out_dtype) * inv.astype(out_dtype) + shift.astype(out_dtype)


class DoubleConv(nn.Module):
    """Two (Conv3x3 -> BN -> ReLU) stages.

    Mirrors /root/reference/Finetuning/model.py:4-26 behaviorally. When
    `mask` is given, each conv output is re-masked before BN (SparK sparse-conv
    semantics, Spark/encoder.py:20-23) and BN uses masked moments.
    """

    features: int
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    fused: bool = False
    # None -> the module-level defaults in cmx.ops.fused_conv
    # (FUSED_MIN_HW / FUSED_IMPL / FUSED_MAX_CIN — see rationale there).
    # Fields stay None in production so A/B tools can patch the globals;
    # flax freezes dataclass defaults at class creation, so patching class
    # attributes here would be a silent no-op (round-1 advisor finding).
    fused_min_hw: Optional[int] = None
    fused_impl: Optional[str] = None
    fused_max_cin: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        from cmx.ops import fused_conv as fc

        min_hw = fc.FUSED_MIN_HW if self.fused_min_hw is None else self.fused_min_hw
        max_cin = fc.FUSED_MAX_CIN if self.fused_max_cin is None else self.fused_max_cin
        impl = fc.FUSED_IMPL if self.fused_impl is None else self.fused_impl
        # The fused Pallas path targets the HBM-bandwidth-bound high-res
        # stages (see fused_conv module docstring). Training mode only —
        # eval reuses the plain path (not throughput-critical). Parameter
        # trees are identical either way.
        use_fused = (
            self.fused
            and not self.use_running_average
            and self.dtype == jnp.bfloat16
            and x.shape[1] >= min_hw
            and x.shape[1] % fc.STRIP == 0
            and x.shape[2] % 8 == 0
            and x.shape[-1] <= max_cin
        )
        if use_fused:
            cin = x.shape[-1]
            convs, bns, params = [], [], []
            for i in range(2):
                conv = nn.Conv(
                    self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv{i}")
                # Materialize the child's params without running the real
                # conv: a 1-px dummy call (DCE'd by XLA) binds the module.
                conv(jnp.zeros((1, 1, 1, cin if i == 0 else self.features),
                               self.dtype))
                bn = MaskedBatchNorm(
                    use_running_average=False, dtype=self.dtype,
                    features=self.features, name=f"bn{i}")
                scale, bias = bn(None)
                cv = conv.variables["params"]
                params += [cv["kernel"], cv["bias"], scale, bias]
                convs.append(conv)
                bns.append(bn)
            if mask is None:
                m = jnp.ones(x.shape[:3], jnp.bfloat16)
            else:
                m = (mask[..., 0] if mask.ndim == 4 else mask)
            if impl == "flat":
                from cmx.ops import fused_conv_flat as ff

                B, H, Wd, _ = x.shape
                xf = ff.nhwc_to_flat(x.astype(self.dtype))
                mflat = m.reshape(B, 1, H * Wd)
                outf, (mean0, var0, mean1, var1) = ff.flat_double_conv(
                    xf, mflat, *params, H, Wd)
                out = ff.flat_to_nhwc(outf, H, Wd)
            else:
                out, (mean0, var0, mean1, var1) = fc.fused_double_conv(
                    x.astype(self.dtype), m, *params)
            bns[0](None, precomputed=(mean0, var0))
            bns[1](None, precomputed=(mean1, var1))
            return out

        for i in range(2):
            x = nn.Conv(
                self.features,
                (3, 3),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            if mask is not None:
                x = x * mask.astype(x.dtype)
            x = MaskedBatchNorm(
                use_running_average=self.use_running_average,
                dtype=self.dtype,
                name=f"bn{i}",
            )(x, mask)
            x = nn.relu(x)
            if mask is not None:
                x = x * mask.astype(x.dtype)
        return x


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool, NHWC."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class DownBlock(nn.Module):
    """DoubleConv then 2x2 maxpool; returns (down, skip).

    Reference: /root/reference/Finetuning/model.py:29-45.
    """

    features: int
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        skip = DoubleConv(
            self.features,
            dtype=self.dtype,
            use_running_average=self.use_running_average,
            fused=self.fused,
            name="double_conv",
        )(x, mask)
        down = max_pool_2x2(skip)
        return down, skip


def bilinear_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample (align_corners=True to match torch Upsample).

    jax.image.resize has no align_corners; emulate align_corners=True with a
    gather-free linear interpolation on a corner-aligned grid. For the common
    power-of-two sizes this matches torch's `Upsample(align_corners=True)`.
    """
    b, h, w, c = x.shape
    nh, nw = 2 * h, 2 * w
    # Corner-aligned sample positions: new_i * (h-1)/(nh-1)
    def axis_weights(n_in, n_out):
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / max(n_out - 1, 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w_hi = pos - lo.astype(jnp.float32)
        return lo, hi, w_hi

    li, hi_, wi = axis_weights(h, nh)
    lj, hj, wj = axis_weights(w, nw)
    x32 = x.astype(jnp.float32)
    top = x32[:, li, :, :] * (1 - wi)[None, :, None, None] + x32[:, hi_, :, :] * wi[None, :, None, None]
    out = top[:, :, lj, :] * (1 - wj)[None, None, :, None] + top[:, :, hj, :] * wj[None, None, :, None]
    return out.astype(x.dtype)


class PixelShuffleUpsample2x(nn.Module):
    """ConvTranspose(k=2, s=2) computed as 1x1-conv + depth-to-space.

    For non-overlapping k=s=2 the transposed conv is exactly
    out[2i+a, 2j+b, o] = sum_c in[i, j, c] * kernel[a, b, c, o] — a pure
    matmul producing the (a, b, o) block, then a pixel-shuffle reshape.
    Mathematically identical to flax nn.ConvTranspose (same param shape and
    name, numeric-equivalence tested), ~25% faster fwd+bwd on v5e because it
    maps onto one clean MXU matmul instead of an input-dilated conv.
    """

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # lax.conv_transpose applies the kernel spatially FLIPPED relative to
        # the direct scatter formula; flip so params stay interchangeable
        # with nn.ConvTranspose. (2,2,Cin,O) -> (Cin, 2*2*O), (a,b,o) packed.
        k = kernel[::-1, ::-1].astype(self.dtype)
        k = k.transpose(2, 0, 1, 3).reshape(cin, 4 * self.features)
        y = jnp.einsum(
            "bhwc,ck->bhwk", x.astype(self.dtype), k,
            preferred_element_type=jnp.float32,
        )
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, self.features)
        return (y + bias).astype(self.dtype)


class UpBlock(nn.Module):
    """Upsample (convT 2x2 s2 or bilinear), concat skip, DoubleConv.

    Reference: /root/reference/Finetuning/model.py:48-81.
    """

    features: int
    up_sample_mode: str = "conv_transpose"
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray):
        if self.up_sample_mode == "conv_transpose":
            # NOTE: PixelShuffleUpsample2x is numerically identical and ~25%
            # faster in isolation, but in the full UNet its depth-to-space
            # transpose breaks fusion with the following concat+conv and the
            # end-to-end step is ~10% SLOWER (A/B on v5e: 342 vs 382 img/s) —
            # so the input-dilated conv_transpose stays.
            x = nn.ConvTranspose(
                self.features,
                (2, 2),
                strides=(2, 2),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="up",
            )(x)
        elif self.up_sample_mode == "bilinear":
            x = bilinear_upsample_2x(x)
        else:
            raise ValueError(
                "up_sample_mode must be 'conv_transpose' or 'bilinear', got "
                f"{self.up_sample_mode!r}"
            )
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return DoubleConv(
            self.features,
            dtype=self.dtype,
            use_running_average=self.use_running_average,
            fused=self.fused,
            name="double_conv",
        )(x)
