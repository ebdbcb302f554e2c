"""Convert reference PyTorch checkpoints into this framework's parameter trees.

Supported inputs
----------------
* HiFi-GAN generator checkpoints (`g_XXXXXXXX`, key 'generator' —
  `train.py:201-203`): conv weights incl. weight-norm (v, g) pairs map onto the
  Generator module's {v, g, b} params with layout transposes
  (torch Conv1d (out,in,k) -> HIO (k,in,out); ConvTranspose1d (in,out,k) ->
  (k,in,out); weight_g keepdims reshaped accordingly).
* Discriminator checkpoints (`do_XXXXXXXX`, keys 'mpd'/'msd') including the
  spectral-norm tensors (weight_orig -> w, weight_u -> norm_stats/u).
* Acoustic model checkpoints (`model_state_dict` from
  `train_mri_acoustic_model.py:511-520`): timm tf_efficientnetv2_b2 backbone
  keys -> `models/effnetv2.py` names, torch LSTM -> the scan BiLSTM params
  (bias_ih + bias_hh fused), Linear head transposed.

Usage:
    python tools/convert_torch_checkpoint.py --kind generator \
        --torch_ckpt g_00065000 --out g_00065000.msgpack
"""
from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _set(tree: Dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# vocoder generator
# ---------------------------------------------------------------------------

def convert_generator(state: Dict[str, Any]) -> Dict:
    """torch Generator state_dict -> flax params for models/vocoder.Generator."""
    params: Dict = {}
    for key, val in state.items():
        v = _t(val)
        parts = key.split(".")
        if parts[0] == "conv_pre":
            # plain conv: weight (out,in,k) -> w (k,in,out)
            if parts[1] == "weight":
                _set(params, ("conv_pre", "w"), v.transpose(2, 1, 0))
            else:
                _set(params, ("conv_pre", "b"), v)
        elif parts[0] == "ups":
            i = int(parts[1])
            name = f"ups_{i}"
            if parts[2] == "weight_v":  # ConvTranspose (in,out,k) -> (k,in,out)
                _set(params, (name, "v"), v.transpose(2, 0, 1))
            elif parts[2] == "weight_g":  # (in,1,1) -> (1,in,1)
                _set(params, (name, "g"), v.transpose(1, 0, 2))
            elif parts[2] == "weight":  # folded checkpoints
                _set(params, (name, "w"), v.transpose(2, 0, 1))
            else:
                _set(params, (name, "b"), v)
        elif parts[0] == "resblocks":
            i = int(parts[1])
            block = f"resblocks_{i}"
            conv_list = parts[2]          # convs1 | convs2 | convs
            j = int(parts[3])
            conv = f"{conv_list}_{j}"
            kind = parts[4]
            if kind == "weight_v":
                _set(params, (block, conv, "v"), v.transpose(2, 1, 0))
            elif kind == "weight_g":      # (out,1,1) -> (1,1,out)
                _set(params, (block, conv, "g"), v.transpose(2, 1, 0))
            elif kind == "weight":
                _set(params, (block, conv, "w"), v.transpose(2, 1, 0))
            else:
                _set(params, (block, conv, "b"), v)
        elif parts[0] == "conv_post":
            if parts[1] == "weight_v":
                _set(params, ("conv_post", "v"), v.transpose(2, 1, 0))
            elif parts[1] == "weight_g":
                _set(params, ("conv_post", "g"), v.transpose(2, 1, 0))
            elif parts[1] == "weight":
                _set(params, ("conv_post", "w"), v.transpose(2, 1, 0))
            else:
                _set(params, ("conv_post", "b"), v)
        else:
            raise KeyError(f"Unrecognised generator key: {key}")
    return params


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------

def convert_discriminator_conv(key_parts, v, params, norm_stats, *, conv2d: bool):
    """Shared mapping for MPD (Conv2d) / MSD (Conv1d) conv stacks."""
    *scope, kind = key_parts
    name = tuple(scope)
    if kind == "weight_v":
        t = v.transpose(2, 3, 1, 0) if conv2d else v.transpose(2, 1, 0)
        _set(params, name + ("v",), t)
    elif kind == "weight_g":
        t = v.transpose(2, 3, 1, 0) if conv2d else v.transpose(2, 1, 0)
        _set(params, name + ("g",), t)
    elif kind in ("weight_orig", "weight"):
        t = v.transpose(2, 3, 1, 0) if conv2d else v.transpose(2, 1, 0)
        _set(params, name + ("w",), t)
    elif kind == "weight_u":
        _set(norm_stats, name + ("u",), v)
    elif kind == "weight_v_sn":  # spectral-norm power-iter v: not persisted
        pass
    elif kind == "bias":
        _set(params, name + ("b",), v)


def _disc_scope(parts, conv2d_names=("convs", "conv_post")):
    """torch 'discriminators.N.convs.M.<kind>' -> our scope tuple."""
    out = []
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if p in ("discriminators",):
            out.append(f"discriminators_{parts[i + 1]}")
            i += 2
        elif p in ("convs", "convs1", "convs2"):
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return out + [parts[-1]]


def convert_mpd(state: Dict[str, Any]):
    params: Dict = {}
    for key, val in state.items():
        parts = _disc_scope(key.split("."))
        convert_discriminator_conv(parts, _t(val), params, {}, conv2d=True)
    return params


def convert_msd(state: Dict[str, Any]):
    params: Dict = {}
    norm_stats: Dict = {}
    for key, val in state.items():
        parts = _disc_scope(key.split("."))
        # spectral-norm 'weight_v' collides with weight-norm naming in torch;
        # disambiguate: discriminators_0 is the spectral-norm one
        if parts[0] == "discriminators_0" and parts[-1] == "weight_v":
            parts = parts[:-1] + ["weight_v_sn"]
        convert_discriminator_conv(parts, _t(val), params, norm_stats, conv2d=False)
    return params, norm_stats


# ---------------------------------------------------------------------------
# acoustic model (timm EffNetV2-B2 + LSTM + head)
# ---------------------------------------------------------------------------

_TIMM_STAGE_RE = re.compile(r"blocks\.(\d+)\.(\d+)\.(.+)")


def convert_acoustic(state: Dict[str, Any]):
    """torch OTNLikeCNNBiLSTM state_dict -> (params, batch_stats)."""
    params: Dict = {}
    batch_stats: Dict = {}

    def put_conv(scope, name, w):
        _set(params, scope + (name, "kernel"), _t(w).transpose(2, 3, 1, 0))

    def put_bn(scope, name, prefix, sd):
        _set(params, scope + (name, "scale"), _t(sd[prefix + ".weight"]))
        _set(params, scope + (name, "bias"), _t(sd[prefix + ".bias"]))
        _set(batch_stats, scope + (name, "mean"), _t(sd[prefix + ".running_mean"]))
        _set(batch_stats, scope + (name, "var"), _t(sd[prefix + ".running_var"]))

    cnn_sd = {k[len("cnn.backbone."):]: v for k, v in state.items() if k.startswith("cnn.backbone.")}
    if cnn_sd:
        put_conv(("cnn",), "stem_conv", cnn_sd["conv_stem.weight"])
        put_bn(("cnn",), "stem_bn", "bn1", cnn_sd)
        handled = {"conv_stem.weight"} | {f"bn1.{s}" for s in ("weight", "bias", "running_mean", "running_var", "num_batches_tracked")}
        stages: Dict = {}
        for k in cnn_sd:
            m = _TIMM_STAGE_RE.match(k)
            if m:
                stages.setdefault((int(m.group(1)), int(m.group(2))), {})[m.group(3)] = cnn_sd[k]
        for (si, bi), sd in stages.items():
            scope = ("cnn", f"s{si}_b{bi}")
            if "conv.weight" in sd:  # ConvBnAct
                _set(params, scope + ("conv", "kernel"), _t(sd["conv.weight"]).transpose(2, 3, 1, 0))
                put_bn(scope, "bn", "bn1", sd)
            elif "conv_exp.weight" in sd:  # EdgeResidual
                _set(params, scope + ("conv_exp", "kernel"), _t(sd["conv_exp.weight"]).transpose(2, 3, 1, 0))
                put_bn(scope, "bn1", "bn1", sd)
                _set(params, scope + ("conv_pwl", "kernel"), _t(sd["conv_pwl.weight"]).transpose(2, 3, 1, 0))
                put_bn(scope, "bn2", "bn2", sd)
            else:  # InvertedResidual
                _set(params, scope + ("conv_pw", "kernel"), _t(sd["conv_pw.weight"]).transpose(2, 3, 1, 0))
                put_bn(scope, "bn1", "bn1", sd)
                _set(params, scope + ("conv_dw", "kernel"), _t(sd["conv_dw.weight"]).transpose(2, 3, 1, 0))
                put_bn(scope, "bn2", "bn2", sd)
                if "se.conv_reduce.weight" in sd:
                    _set(params, scope + ("se", "reduce", "kernel"), _t(sd["se.conv_reduce.weight"]).transpose(2, 3, 1, 0))
                    _set(params, scope + ("se", "reduce", "bias"), _t(sd["se.conv_reduce.bias"]))
                    _set(params, scope + ("se", "expand", "kernel"), _t(sd["se.conv_expand.weight"]).transpose(2, 3, 1, 0))
                    _set(params, scope + ("se", "expand", "bias"), _t(sd["se.conv_expand.bias"]))
                _set(params, scope + ("conv_pwl", "kernel"), _t(sd["conv_pwl.weight"]).transpose(2, 3, 1, 0))
                put_bn(scope, "bn3", "bn3", sd)

    # BiLSTM (torch lstm -> scan LSTM; bias_ih + bias_hh fused)
    for torch_sfx, ours in (("l0", "fwd"), ("l0_reverse", "bwd")):
        w_ih = state.get(f"rnn.lstm.weight_ih_{torch_sfx}")
        if w_ih is None:
            continue
        _set(params, ("rnn", f"w_ih_{ours}"), _t(w_ih).T)
        _set(params, ("rnn", f"w_hh_{ours}"), _t(state[f"rnn.lstm.weight_hh_{torch_sfx}"]).T)
        _set(
            params,
            ("rnn", f"b_{ours}"),
            _t(state[f"rnn.lstm.bias_ih_{torch_sfx}"]) + _t(state[f"rnn.lstm.bias_hh_{torch_sfx}"]),
        )

    if "head.weight" in state:
        _set(params, ("head", "kernel"), _t(state["head.weight"]).T)
        _set(params, ("head", "bias"), _t(state["head.bias"]))
    return params, batch_stats


def timm_b2_key_manifest() -> Dict[str, list]:
    """Expected timm `tf_efficientnetv2_b2` (features_only) state-dict contract.

    This is the input contract of `convert_acoustic`'s backbone mapping: key
    names follow timm's efficientnet block naming (conv_stem/bn1, ConvBnAct
    `conv`+`bn1`, EdgeResidual `conv_exp`/`conv_pwl`+`bn1`/`bn2`,
    InvertedResidual `conv_pw`/`conv_dw`/`se.conv_reduce|expand`/`conv_pwl`+
    `bn1`/`bn2`/`bn3`); shapes are torch layouts ((out,in,kh,kw); depthwise
    (mid,1,k,k); SE reduced dim = max(1, int(in_ch * 0.25))). Pinned as
    `tests/fixtures/timm_tf_efficientnetv2_b2_manifest.json` so converter or
    spec drift trips a test. timm is not installed here, so this manifest (not
    a live timm model) defines the port; the offline conversion recipe is:

        # on any machine with timm + torch:
        import timm, torch
        m = timm.create_model("tf_efficientnetv2_b2", pretrained=True,
                              features_only=True)
        torch.save({"model_state_dict":
                    {f"cnn.backbone.{k}": v for k, v in m.state_dict().items()}},
                   "b2_pretrained.pth")
        # here:
        python tools/convert_torch_checkpoint.py --kind acoustic \
            --torch_ckpt b2_pretrained.pth --out b2_pretrained.msgpack

    Reference anchor: `mri2speech_code/mri_acoustic_model.py:28-36`
    (cnn_pretrained=True pulls these timm weights).
    """
    import sys
    from pathlib import Path

    repo_root = str(Path(__file__).resolve().parents[1])
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from mri2speech_tpu.models.effnetv2 import EFFNETV2_B2_SPEC, EFFNETV2_B2_STEM

    manifest: Dict[str, list] = {}

    def put_bn(prefix, ch):
        for sfx in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{prefix}.{sfx}"] = [ch]
        manifest[f"{prefix}.num_batches_tracked"] = []

    manifest["conv_stem.weight"] = [EFFNETV2_B2_STEM, 3, 3, 3]
    put_bn("bn1", EFFNETV2_B2_STEM)
    in_ch = EFFNETV2_B2_STEM
    for si, st in enumerate(EFFNETV2_B2_SPEC):
        for bi in range(st.repeats):
            p = f"blocks.{si}.{bi}"
            if st.block == "cn":
                manifest[f"{p}.conv.weight"] = [st.channels, in_ch, st.kernel, st.kernel]
                put_bn(f"{p}.bn1", st.channels)
            elif st.block == "er":
                mid = in_ch * st.expand
                manifest[f"{p}.conv_exp.weight"] = [mid, in_ch, st.kernel, st.kernel]
                put_bn(f"{p}.bn1", mid)
                manifest[f"{p}.conv_pwl.weight"] = [st.channels, mid, 1, 1]
                put_bn(f"{p}.bn2", st.channels)
            else:
                mid = in_ch * st.expand
                manifest[f"{p}.conv_pw.weight"] = [mid, in_ch, 1, 1]
                put_bn(f"{p}.bn1", mid)
                manifest[f"{p}.conv_dw.weight"] = [mid, 1, st.kernel, st.kernel]
                put_bn(f"{p}.bn2", mid)
                red = max(1, int(in_ch * st.se_ratio))
                manifest[f"{p}.se.conv_reduce.weight"] = [red, mid, 1, 1]
                manifest[f"{p}.se.conv_reduce.bias"] = [red]
                manifest[f"{p}.se.conv_expand.weight"] = [mid, red, 1, 1]
                manifest[f"{p}.se.conv_expand.bias"] = [mid]
                manifest[f"{p}.conv_pwl.weight"] = [st.channels, mid, 1, 1]
                put_bn(f"{p}.bn3", st.channels)
            in_ch = st.channels
    return manifest


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main() -> None:
    import sys
    from pathlib import Path

    # runnable as `python tools/convert_torch_checkpoint.py` from anywhere
    repo_root = str(Path(__file__).resolve().parents[1])
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    import torch

    from mri2speech_tpu.train import checkpoint as ckpt_io

    ap = argparse.ArgumentParser(description="Convert reference torch checkpoints.")
    ap.add_argument("--kind", required=True, choices=["generator", "do", "acoustic"])
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    obj = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    if args.kind == "generator":
        params = convert_generator(obj["generator"])
        ckpt_io.save_checkpoint(args.out, {"generator": params})
    elif args.kind == "do":
        mpd = convert_mpd(obj["mpd"])
        msd, msd_stats = convert_msd(obj["msd"])
        ckpt_io.save_checkpoint(
            args.out,
            {"mpd": mpd, "msd": msd, "msd_norm_stats": msd_stats,
             "steps": np.int64(obj.get("steps", 0)), "epoch": np.int64(obj.get("epoch", 0))},
        )
    else:
        state = obj.get("model_state_dict", obj)
        params, batch_stats = convert_acoustic(state)
        ckpt_io.save_checkpoint(args.out, {"params": params, "batch_stats": batch_stats})
    print(f"[DONE] wrote {args.out}")


if __name__ == "__main__":
    main()
