"""Architecture parity: our flax UNet == the reference's torch UNet.

Builds the reference architecture in torch (from its documented structure:
Finetuning/model.py — DoubleConv = Conv3x3(pad 1)-BN-ReLU x2, DownBlock =
DoubleConv + maxpool2, UpBlock = ConvT2x2s2 + skip-concat + DoubleConv,
channels 1-64-128-256-512-1024 mirrored, 1x1 head), transfers ONE set of
random weights into both implementations, and checks the forward outputs
match to float tolerance. This is the strongest possible "same model family"
guarantee without copying reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from cmx.models.unet import UNet


class TorchDoubleConv(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.seq = tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=1), tnn.BatchNorm2d(cout), tnn.ReLU(),
            tnn.Conv2d(cout, cout, 3, padding=1), tnn.BatchNorm2d(cout), tnn.ReLU(),
        )

    def forward(self, x):
        return self.seq(x)


class TorchUNet(tnn.Module):
    def __init__(self, out_classes=2):
        super().__init__()
        widths = [64, 128, 256, 512]
        cin = 1
        self.downs = tnn.ModuleList()
        for w in widths:
            self.downs.append(TorchDoubleConv(cin, w))
            cin = w
        self.pool = tnn.MaxPool2d(2)
        self.bottleneck = TorchDoubleConv(512, 1024)
        self.ups = tnn.ModuleList()
        self.upconvs = tnn.ModuleList()
        for w in reversed(widths):
            self.upconvs.append(tnn.ConvTranspose2d(2 * w, w, 2, stride=2))
            self.ups.append(TorchDoubleConv(2 * w, w))
        self.head = tnn.Conv2d(64, out_classes, 1)

    def forward(self, x):
        x = x.unsqueeze(1)
        skips = []
        for d in self.downs:
            s = d(x)
            skips.append(s)
            x = self.pool(s)
        x = self.bottleneck(x)
        for up, conv, s in zip(self.upconvs, self.ups, reversed(skips)):
            x = up(x)
            x = torch.cat([x, s], dim=1)
            x = conv(x)
        return self.head(x)


def _conv_w(t):  # torch (O,I,kh,kw) -> flax (kh,kw,I,O)
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))


def _convT_w(t):
    # torch ConvTranspose2d (I,O,kh,kw) -> flax ConvTranspose (kh,kw,I,O)
    # with SPATIAL FLIP: lax.conv_transpose correlates with the kernel as
    # given, while torch's transposed conv applies the conv-gradient
    # (spatially flipped) kernel. Verified exact for k=2 s=2.
    return jnp.asarray(t.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy())


def _vec(t):
    return jnp.asarray(t.detach().numpy())


def _double_conv_params(tdc: TorchDoubleConv):
    seq = tdc.seq
    return (
        {
            "conv0": {"kernel": _conv_w(seq[0].weight), "bias": _vec(seq[0].bias)},
            "bn0": {"scale": _vec(seq[1].weight), "bias": _vec(seq[1].bias)},
            "conv1": {"kernel": _conv_w(seq[3].weight), "bias": _vec(seq[3].bias)},
            "bn1": {"scale": _vec(seq[4].weight), "bias": _vec(seq[4].bias)},
        },
        {
            "bn0": {"mean": _vec(seq[1].running_mean), "var": _vec(seq[1].running_var)},
            "bn1": {"mean": _vec(seq[4].running_mean), "var": _vec(seq[4].running_var)},
        },
    )


@pytest.mark.slow
def test_forward_parity_with_torch_reference():
    torch.manual_seed(0)
    tmodel = TorchUNet(out_classes=2).eval()
    # randomize running stats so BN parity is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    params = {"encoder": {}, "decoder": {}}
    stats = {"encoder": {}, "decoder": {}}
    for i, d in enumerate(tmodel.downs):
        p, s = _double_conv_params(d)
        params["encoder"][f"down{i+1}"] = {"double_conv": p}
        stats["encoder"][f"down{i+1}"] = {"double_conv": s}
    p, s = _double_conv_params(tmodel.bottleneck)
    params["encoder"]["bottleneck"] = p
    stats["encoder"]["bottleneck"] = s
    for j, (upc, dc) in enumerate(zip(tmodel.upconvs, tmodel.ups)):
        name = f"up{4-j}"
        p, s = _double_conv_params(dc)
        params["decoder"][name] = {
            "up": {"kernel": _convT_w(upc.weight), "bias": _vec(upc.bias)},
            "double_conv": p,
        }
        stats["decoder"][name] = {"double_conv": s}
    params["decoder"]["head"] = {
        "kernel": _conv_w(tmodel.head.weight), "bias": _vec(tmodel.head.bias)
    }

    model = UNet(out_classes=2, dtype=jnp.float32, use_running_average=True)
    x_np = np.random.default_rng(0).normal(size=(2, 64, 64)).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.tensor(x_np)).numpy()  # (B, 2, H, W)

    j_out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_np)
    )
    j_out = np.asarray(j_out).transpose(0, 3, 1, 2)  # NHWC -> NCHW

    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=1e-3)
