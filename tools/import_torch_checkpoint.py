"""Import a reference (torch) checkpoint into cmx's encoder.npz format.

The reference fine-tuner accepts five checkpoint flavors and sniffs them
with string surgery (/root/reference/Finetuning/train.py:240-308):

  1. SparK deepspeed dict  — key "module", prefixes "sparse_encoder.sp_cnn."
     (encoder) and "dense_decoder." (decoder)
  2. CM-UNet mmengine dict — checkpoint["meta"]["mmengine_version"],
     prefixes "backbone." (encoder) and "pixel_decoder." (decoder)
  3. MoCo lightning .ckpt  — checkpoint["state_dict"], prefix "encoder_q."
  4. generic "pretrained pt" — checkpoint["state_dict"], prefix "module."
  5. raw encoder state_dict .pth — keys are the fine-tune UNet's own names

All five reduce to: strip the silo prefix, keep the keys that match the
fine-tune UNet naming (down_conv*/double_conv/up_conv*/conv_last,
Finetuning/model.py:84-110), load non-strict. cmx replaced the sniffing
with ONE interchange format (encoder.npz, cmx/ckpt/checkpoint.py:94-120);
this tool is the bridge: it performs the same normalization, then converts
layouts (NCHW conv kernels -> HWIO, ConvTranspose2d with the spatial flip
lax.conv_transpose needs — transform validated by
tests/test_torch_parity.py) and writes encoder.npz (+ optionally a
whole-model npz for `load_model_npz`).

Usage:
  python tools/import_torch_checkpoint.py ref_ckpt.pth -o encoder.npz
  python tools/import_torch_checkpoint.py ref_ckpt.pth -o model.npz --full
"""

from __future__ import annotations

import argparse
import re
from typing import Dict, Tuple

import numpy as np


def _to_numpy_state_dict(obj) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        if isinstance(v, np.ndarray):
            out[k] = v
    return out


def normalize_reference_state_dict(ckpt) -> Dict[str, np.ndarray]:
    """The 5-format dispatch of Finetuning/train.py:240-308, minus torch.

    Returns a flat dict in the fine-tune UNet's naming (down_conv1..4,
    double_conv, up_conv4..1, conv_last), prefixes stripped.
    """
    if hasattr(ckpt, "state_dict"):  # whole-model torch.save(model)
        ckpt = ckpt.state_dict()
    if not isinstance(ckpt, dict):
        raise ValueError(f"unsupported checkpoint object: {type(ckpt)}")

    if "module" in ckpt:  # SparK deepspeed (train.py:250-260)
        sd, strip = ckpt["module"], ("sparse_encoder.sp_cnn.", "dense_decoder.")
    elif isinstance(ckpt.get("meta"), dict) and "mmengine_version" in ckpt["meta"]:
        sd, strip = ckpt["state_dict"], ("backbone.", "pixel_decoder.")
    elif "state_dict" in ckpt:  # MoCo .ckpt / generic pt (train.py:287-306)
        sd = ckpt["state_dict"]
        strip = ("encoder_q.", "module.")
    else:  # raw state_dict (train.py:276-285)
        sd, strip = ckpt, ("module.",)

    out = {}
    for key, v in _to_numpy_state_dict(sd).items():
        for p in strip:
            if key.startswith(p):
                key = key[len(p):]
                break
        out[key] = v
    return out


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O,I,kh,kw) -> flax (kh,kw,I,O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kh,kw) -> flax ConvTranspose (kh,kw,I,O)
    with the spatial flip (lax.conv_transpose correlates; torch applies the
    conv-gradient kernel). Exactness: tests/test_torch_parity.py::_convT_w."""
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


# fine-tune UNet module -> (cmx tree path, is_decoder)
_DOWN = re.compile(r"^down_conv(\d)\.double_conv\.double_conv\.(\d)\.(\w+)$")
_BNECK = re.compile(r"^double_conv\.double_conv\.(\d)\.(\w+)$")
_UPDC = re.compile(r"^up_conv(\d)\.double_conv\.double_conv\.(\d)\.(\w+)$")
_UPS = re.compile(r"^up_conv(\d)\.up_sample\.(\w+)$")
_HEAD = re.compile(r"^conv_last\.(\w+)$")

# Sequential index within the reference DoubleConv (model.py:16-22):
# 0 conv, 1 bn, 3 conv, 4 bn.
_SEQ = {"0": ("conv0", "conv"), "1": ("bn0", "bn"),
        "3": ("conv1", "conv"), "4": ("bn1", "bn")}
_BN_PARAM = {"weight": ("params", "scale"), "bias": ("params", "bias"),
             "running_mean": ("batch_stats", "mean"),
             "running_var": ("batch_stats", "var")}


def to_cmx_trees(sd: Dict[str, np.ndarray]
                 ) -> Tuple[dict, dict, dict, dict]:
    """Reference-named state_dict -> cmx (enc_params, enc_stats,
    dec_params, dec_stats) nested trees (cmx/models/unet.py naming)."""
    enc_p: dict = {}
    enc_s: dict = {}
    dec_p: dict = {}
    dec_s: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    def add_dc(p_tree, s_tree, base, seq_idx, field, v):
        name, kind = _SEQ[seq_idx]
        if kind == "conv":
            if field == "weight":
                put(p_tree, base + [name, "kernel"], _conv_w(v))
            elif field == "bias":
                put(p_tree, base + [name, "bias"], v)
        else:
            if field == "num_batches_tracked":
                return
            coll, leaf = _BN_PARAM[field]
            tree = p_tree if coll == "params" else s_tree
            put(tree, base + [name, leaf], v)

    for key, v in sd.items():
        m = _DOWN.match(key)
        if m:
            i, si, f = m.groups()
            add_dc(enc_p, enc_s, [f"down{i}", "double_conv"], si, f, v)
            continue
        m = _BNECK.match(key)
        if m:
            si, f = m.groups()
            add_dc(enc_p, enc_s, ["bottleneck"], si, f, v)
            continue
        m = _UPDC.match(key)
        if m:
            i, si, f = m.groups()
            add_dc(dec_p, dec_s, [f"up{i}", "double_conv"], si, f, v)
            continue
        m = _UPS.match(key)
        if m:
            i, f = m.groups()
            if f == "weight":
                put(dec_p, [f"up{i}", "up", "kernel"], _convT_w(v))
            elif f == "bias":
                put(dec_p, [f"up{i}", "up", "bias"], v)
            continue
        m = _HEAD.match(key)
        if m:
            f = m.group(1)
            if f == "weight":
                put(dec_p, ["head", "kernel"], _conv_w(v))
            elif f == "bias":
                put(dec_p, ["head", "bias"], v)
    return enc_p, enc_s, dec_p, dec_s


def _flatten(tree: dict, root: str) -> Dict[str, np.ndarray]:
    out = {}
    def visit(node, keys):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, keys + [k])
        else:
            out["/".join([root] + keys)] = np.asarray(node, np.float32)
    visit(tree, [])
    return out


def convert(ckpt_path: str, out_path: str, full: bool = False) -> dict:
    import torch

    try:
        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = normalize_reference_state_dict(ckpt)
    enc_p, enc_s, dec_p, dec_s = to_cmx_trees(sd)
    if not enc_p:
        raise ValueError(
            "no encoder weights recognized — is this a reference-format "
            f"checkpoint? (keys sample: {list(sd)[:5]})")

    if full:
        # Whole-model layout for cmx.ckpt.load_model_npz (same flat names
        # export_model produces: params/encoder/..., params/decoder/...).
        arrays = {
            **_flatten({"encoder": enc_p, "decoder": dec_p}, "params"),
            **_flatten({"encoder": enc_s, "decoder": dec_s}, "batch_stats"),
        }
    else:
        # encoder.npz interchange layout (cmx/ckpt/checkpoint.py:94-120).
        arrays = {**_flatten(enc_p, "params"), **_flatten(enc_s, "batch_stats")}
    np.savez(out_path, **arrays)
    return arrays


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="reference .pth/.ckpt/.pt file")
    ap.add_argument("-o", "--out", default="encoder.npz")
    ap.add_argument("--full", action="store_true",
                    help="write a whole-model npz (encoder+decoder+head) "
                         "for cmx.ckpt.load_model_npz instead of encoder.npz")
    args = ap.parse_args(argv)
    arrays = convert(args.checkpoint, args.out, full=args.full)
    enc = sum(k.startswith("params") for k in arrays)
    print(f"wrote {args.out}: {len(arrays)} arrays ({enc} params, "
          f"{len(arrays) - enc} batch stats)")


if __name__ == "__main__":
    main()
