"""Export this framework's checkpoints back into reference torch format.

The inverse of `tools/convert_torch_checkpoint.py`, closing the migration
loop: models trained HERE can be loaded by the reference ecosystem unchanged
(`scripts/run_mri_video_inference.py:89-148` / `inference.py` for the
generator; `train_mri_acoustic_model.py:393-462` resume format for the
acoustic model).

Supported outputs
-----------------
* Generator: flax params (weight-norm {v, g, b} or folded {w, b}) ->
  `torch.save({"generator": state_dict})` — the `g_XXXXXXXX` layout the
  reference scans for (`utils.py:38-57`). Layouts are the exact inverse
  transposes of the forward converter.
* Acoustic: {"params", "batch_stats"} -> `torch.save({"model_state_dict":
  ...})` with timm `tf_efficientnetv2_b2` backbone naming. The scan BiLSTM's
  fused bias is emitted as bias_ih with bias_hh = 0 — torch adds the two, so
  the module computes identically (the split is not unique; the sum is).

Usage:
    python tools/export_torch_checkpoint.py --kind generator \
        --ckpt g_00065000.msgpack --out g_00065000
"""
from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np


def _flatten(tree: Dict, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# vocoder generator (inverse of convert_generator)
# ---------------------------------------------------------------------------

def generator_to_torch(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """flax Generator params -> torch Generator state_dict arrays."""
    sd: Dict[str, np.ndarray] = {}
    for path, v in _flatten(params).items():
        scope, kind = path[:-1], path[-1]
        name = scope[0]
        if name == "conv_pre":
            key = "conv_pre"
            if kind == "w":
                sd[f"{key}.weight"] = v.transpose(2, 1, 0)
            elif kind == "v":
                sd[f"{key}.weight_v"] = v.transpose(2, 1, 0)
            elif kind == "g":
                sd[f"{key}.weight_g"] = v.transpose(2, 1, 0)
            else:
                sd[f"{key}.bias"] = v
        elif name.startswith("ups_"):
            i = int(name.split("_")[1])
            key = f"ups.{i}"
            # ConvTranspose: ours (k,in,out) -> torch (in,out,k)
            if kind == "w":
                sd[f"{key}.weight"] = v.transpose(1, 2, 0)
            elif kind == "v":
                sd[f"{key}.weight_v"] = v.transpose(1, 2, 0)
            elif kind == "g":  # ours (1,in,1) -> torch (in,1,1)
                sd[f"{key}.weight_g"] = v.transpose(1, 0, 2)
            else:
                sd[f"{key}.bias"] = v
        elif name.startswith("resblocks_"):
            i = int(name.split("_")[1])
            conv_list, j = scope[1].rsplit("_", 1)
            key = f"resblocks.{i}.{conv_list}.{j}"
            if kind == "w":
                sd[f"{key}.weight"] = v.transpose(2, 1, 0)
            elif kind == "v":
                sd[f"{key}.weight_v"] = v.transpose(2, 1, 0)
            elif kind == "g":
                sd[f"{key}.weight_g"] = v.transpose(2, 1, 0)
            else:
                sd[f"{key}.bias"] = v
        elif name == "conv_post":
            if kind == "w":
                sd["conv_post.weight"] = v.transpose(2, 1, 0)
            elif kind == "v":
                sd["conv_post.weight_v"] = v.transpose(2, 1, 0)
            elif kind == "g":
                sd["conv_post.weight_g"] = v.transpose(2, 1, 0)
            else:
                sd["conv_post.bias"] = v
        else:
            raise KeyError(f"Unrecognised generator param scope: {path}")
    return sd


# ---------------------------------------------------------------------------
# acoustic model (inverse of convert_acoustic)
# ---------------------------------------------------------------------------

_STAGE_RE = re.compile(r"s(\d+)_b(\d+)$")


def acoustic_to_torch(
    params: Dict[str, Any], batch_stats: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    """flax acoustic {params, batch_stats} -> torch state_dict arrays
    (timm backbone names under cnn.backbone.*, rnn.lstm.*, head.*)."""
    sd: Dict[str, np.ndarray] = {}
    flat_p = _flatten(params)
    flat_b = _flatten(batch_stats)

    def conv_back(v):  # ours (kh,kw,in,out) -> torch (out,in,kh,kw)
        return v.transpose(3, 2, 0, 1)

    bn_names = {  # our module name -> timm bn name per block kind
        "stem_bn": "bn1", "bn": "bn1", "bn1": "bn1", "bn2": "bn2", "bn3": "bn3",
    }
    conv_names = {
        "stem_conv": "conv_stem", "conv": "conv", "conv_exp": "conv_exp",
        "conv_pw": "conv_pw", "conv_dw": "conv_dw", "conv_pwl": "conv_pwl",
    }

    def timm_prefix(scope) -> str:
        m = _STAGE_RE.match(scope)
        if m:
            return f"cnn.backbone.blocks.{m.group(1)}.{m.group(2)}"
        return "cnn.backbone"

    for path, v in flat_p.items():
        top = path[0]
        if top == "cnn":
            scope, rest = path[1], path[2:]
            if scope in conv_names and rest == ("kernel",):
                # stem: path = ("cnn", "stem_conv", "kernel")
                sd[f"cnn.backbone.{conv_names[scope]}.weight"] = conv_back(v)
            elif scope in bn_names:
                tname = f"cnn.backbone.{bn_names[scope]}"
                sd[f"{tname}.weight" if rest == ("scale",) else f"{tname}.bias"] = v
            else:
                pre = timm_prefix(scope)
                name, rest2 = path[2], path[3:]
                if name in conv_names and rest2 == ("kernel",):
                    sd[f"{pre}.{conv_names[name]}.weight"] = conv_back(v)
                elif name in bn_names:
                    t = f"{pre}.{bn_names[name]}"
                    sd[f"{t}.weight" if rest2 == ("scale",) else f"{t}.bias"] = v
                elif name == "se":
                    sub = "conv_reduce" if path[3] == "reduce" else "conv_expand"
                    if path[4] == "kernel":
                        sd[f"{pre}.se.{sub}.weight"] = conv_back(v)
                    else:
                        sd[f"{pre}.se.{sub}.bias"] = v
                else:
                    raise KeyError(f"Unrecognised cnn param: {path}")
        elif top == "rnn":
            name = path[1]
            sfx = {"fwd": "l0", "bwd": "l0_reverse"}[name.rsplit("_", 1)[-1]]
            if name.startswith("w_ih"):
                sd[f"rnn.lstm.weight_ih_{sfx}"] = v.T
            elif name.startswith("w_hh"):
                sd[f"rnn.lstm.weight_hh_{sfx}"] = v.T
            elif name.startswith("b_"):
                # fused bias -> bias_ih (bias_hh = 0); torch sums the two
                sd[f"rnn.lstm.bias_ih_{sfx}"] = v
                sd[f"rnn.lstm.bias_hh_{sfx}"] = np.zeros_like(v)
            else:
                raise KeyError(f"Unrecognised rnn param: {path}")
        elif top == "head":
            if path[1] == "kernel":
                sd["head.weight"] = v.T
            else:
                sd["head.bias"] = v
        else:
            raise KeyError(f"Unrecognised param scope: {path}")

    for path, v in flat_b.items():
        if path[0] != "cnn":
            raise KeyError(f"Unrecognised batch_stats scope: {path}")
        scope = path[1]
        if scope in bn_names:  # stem
            t = f"cnn.backbone.{bn_names[scope]}"
        else:
            t = f"{timm_prefix(scope)}.{bn_names[path[2]]}"
        kind = path[-1]
        sd[f"{t}.running_mean" if kind == "mean" else f"{t}.running_var"] = v
        # torch BatchNorm buffers include a step counter we don't track
        sd.setdefault(f"{t}.num_batches_tracked", np.asarray(0, np.int64))
    return sd


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main() -> None:
    import sys
    from pathlib import Path

    repo_root = str(Path(__file__).resolve().parents[1])
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    import torch

    from mri2speech_tpu.train import checkpoint as ckpt_io

    ap = argparse.ArgumentParser(
        description="Export framework checkpoints to reference torch format."
    )
    ap.add_argument("--kind", required=True, choices=["generator", "acoustic"])
    ap.add_argument("--ckpt", required=True, help="msgpack checkpoint path")
    ap.add_argument("--out", required=True, help="output torch .pth path")
    args = ap.parse_args()

    obj = ckpt_io.load_checkpoint_raw(args.ckpt)
    if args.kind == "generator":
        params = obj.get("generator", obj)
        sd = {k: torch.from_numpy(np.array(v))  # copy: msgpack arrays are read-only
              for k, v in generator_to_torch(params).items()}
        torch.save({"generator": sd}, args.out)
    else:
        params = obj.get("params", obj.get("model_state_dict", obj))
        sd = {k: torch.from_numpy(np.array(v))
              for k, v in acoustic_to_torch(params, obj.get("batch_stats", {})).items()}
        torch.save({"model_state_dict": sd}, args.out)
    print(f"[DONE] wrote {args.out}")


if __name__ == "__main__":
    main()
