"""tools/import_torch_checkpoint.py: reference-checkpoint -> encoder.npz.

Mirrors the reference's 5-format dispatch (Finetuning/train.py:240-308):
each container flavor must normalize to the same weights, and the converted
npz loaded into a cmx UNet must reproduce the torch model's forward pass
(the same bar as tests/test_torch_parity.py, but through the file format).
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cmx.ckpt.checkpoint import load_encoder, load_model_npz
from cmx.models.unet import UNet
from tests.test_torch_parity import TorchUNet
from tools.import_torch_checkpoint import (convert,
                                           normalize_reference_state_dict)


def _reference_named_state_dict(tmodel: TorchUNet) -> dict:
    """Re-key TorchUNet tensors with the reference fine-tune UNet names
    (down_conv1..4 / double_conv / up_conv4..1 / conv_last,
    Finetuning/model.py:96-110)."""
    sd = {}

    def add_dc(prefix, tdc):
        for torch_i in (0, 1, 3, 4):
            mod = tdc.seq[torch_i]
            for field, t in mod.state_dict().items():
                sd[f"{prefix}.double_conv.{torch_i}.{field}"] = t

    for i, d in enumerate(tmodel.downs):
        add_dc(f"down_conv{i+1}.double_conv", d)
    add_dc("double_conv", tmodel.bottleneck)
    for j, (upc, dc) in enumerate(zip(tmodel.upconvs, tmodel.ups)):
        lvl = 4 - j
        sd[f"up_conv{lvl}.up_sample.weight"] = upc.weight
        sd[f"up_conv{lvl}.up_sample.bias"] = upc.bias
        add_dc(f"up_conv{lvl}.double_conv", dc)
    sd["conv_last.weight"] = tmodel.head.weight
    sd["conv_last.bias"] = tmodel.head.bias
    return {k: v.detach().clone() for k, v in sd.items()}


def _torch_model():
    torch.manual_seed(0)
    tmodel = TorchUNet(out_classes=2).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    return tmodel


@pytest.mark.parametrize("flavor", ["raw", "spark", "mmengine", "moco", "pt"])
def test_format_sniffing_normalizes_identically(flavor):
    sd = _reference_named_state_dict(_torch_model())
    if flavor == "raw":
        ckpt = dict(sd)
    elif flavor == "spark":  # train.py:250-260
        enc = {f"sparse_encoder.sp_cnn.{k}": v for k, v in sd.items()
               if "up_conv" not in k and k not in
               ("conv_last.weight", "conv_last.bias")}
        dec = {f"dense_decoder.{k}": v for k, v in sd.items()
               if "up_conv" in k or k.startswith("conv_last")}
        ckpt = {"module": {**enc, **dec}}
    elif flavor == "mmengine":  # train.py:262-273
        enc = {f"backbone.{k}": v for k, v in sd.items()
               if k.startswith(("down_conv", "double_conv"))}
        dec = {f"pixel_decoder.{k}": v for k, v in sd.items()
               if k.startswith(("up_conv", "conv_last"))}
        ckpt = {"meta": {"mmengine_version": "0.8"},
                "state_dict": {**enc, **dec}}
    elif flavor == "moco":  # train.py:287-296
        ckpt = {"state_dict": {f"encoder_q.{k}": v for k, v in sd.items()}}
    else:  # generic "pretrained pt", train.py:298-306
        ckpt = {"state_dict": {f"module.{k}": v for k, v in sd.items()}}

    norm = normalize_reference_state_dict(ckpt)
    assert set(norm) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(norm[k], sd[k].numpy())


def test_full_model_roundtrip_forward_parity(tmp_path):
    tmodel = _torch_model()
    ckpt_path = tmp_path / "ref.pth"
    torch.save(_reference_named_state_dict(tmodel), ckpt_path)

    out = tmp_path / "model.npz"
    convert(str(ckpt_path), str(out), full=True)

    import jax
    model = UNet(out_classes=2, dtype=jnp.float32, use_running_average=True)
    x_np = np.random.default_rng(0).normal(size=(2, 64, 64)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np))
    params, stats = load_model_npz(
        str(out), variables["params"], variables["batch_stats"])

    with torch.no_grad():
        t_out = tmodel(torch.tensor(x_np)).numpy()
    j_out = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x_np))
    j_out = np.asarray(j_out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=1e-3)


def test_encoder_npz_loads_into_finetune_path(tmp_path):
    tmodel = _torch_model()
    ckpt_path = tmp_path / "ref.pth"
    # MoCo-style container exercises sniffing + encoder-only output together
    torch.save({"state_dict": {f"encoder_q.{k}": v for k, v in
                               _reference_named_state_dict(tmodel).items()}},
               ckpt_path)
    out = tmp_path / "encoder.npz"
    convert(str(ckpt_path), str(out), full=False)

    import jax
    model = UNet(out_classes=2, dtype=jnp.float32, use_running_average=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64)))
    params, stats = load_encoder(
        str(out), variables["params"], variables["batch_stats"])

    # Every encoder conv kernel must have been replaced by the torch weights
    got = params["encoder"]["down1"]["double_conv"]["conv0"]["kernel"]
    want = tmodel.downs[0].seq[0].weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    got_var = stats["encoder"]["bottleneck"]["bn1"]["var"]
    want_var = tmodel.bottleneck.seq[4].running_var.numpy()
    np.testing.assert_allclose(np.asarray(got_var), want_var, rtol=1e-6)
    # Decoder stays at its fresh init (encoder.npz carries no decoder)
    assert "up1" in params["decoder"]
