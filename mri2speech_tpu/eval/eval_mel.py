"""Offline mel evaluation: masked MSE/MAE + MCD-like distance.

Parity target `mri2speech_code/eval_mel.py` — with its two defects FIXED:
* the reference imports a nonexistent `model.RevisedCNNBiLSTM` (`eval_mel.py:15`)
  and cannot run; this evaluator loads the actual acoustic model
* the reference defaults sr=11866 (`:46,61,105,171`) against the pipeline's
  11413; the default here is 11413

Metrics:
* simple masked loss 0.8*MSE + 0.2*MAE over valid frames (`eval_mel.py:19-32`)
* MCD-like: de-standardise -> dB -> power -> pseudo-MFCC (DCT-II ortho over the
  re-dB'd mel power, librosa.feature.mfcc(S=...) semantics) ->
  (10/ln10)*sqrt(2)*RMSE (`eval_mel.py:46-82`)
"""
from __future__ import annotations

import argparse
import json
import math
import os
from typing import Dict, Optional, Tuple

import numpy as np
from scipy.fft import dct

import jax
import jax.numpy as jnp

from mri2speech_tpu.ops.mel import power_to_db_np as _power_to_db_np


def simple_masked_loss(
    pred: np.ndarray, target: np.ndarray, mask: np.ndarray,
    w_mse: float = 0.8, w_mae: float = 0.2,
) -> Tuple[float, float, float]:
    """(B,T,M) masked 0.8*MSE + 0.2*MAE (`eval_mel.py:19-32`)."""
    m = mask[..., None]
    diff = (pred - target) * m
    denom = max(m.sum(), 1.0)
    mse = float((diff ** 2).sum() / denom)
    mae = float(np.abs(diff).sum() / denom)
    return w_mse * mse + w_mae * mae, mse, mae




def _meldb_to_mfcc(mel_db: np.ndarray, n_mfcc: int = 13) -> np.ndarray:
    """(T, n_mels) dB -> (T, n_mfcc) pseudo-MFCC.

    librosa.feature.mfcc(S=power_to_db(mel_power)) semantics: DCT-II with ortho
    norm along the mel axis, first n_mfcc coefficients (`eval_mel.py:46-59`).
    The round-trip dB->power->dB re-applies the per-array 80 dB floor, which is
    intentional in the reference.
    """
    mel_power = np.power(10.0, mel_db.T / 10.0)      # (n_mels, T)
    S_db = _power_to_db_np(mel_power)
    mfcc = dct(S_db, type=2, axis=0, norm="ortho")[:n_mfcc]
    return mfcc.T


def mcd_like(
    mel_pred: np.ndarray,
    mel_gt: np.ndarray,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    n_mfcc: int = 13,
) -> Optional[float]:
    """(T, n_mels) standardised mels -> MCD-like scalar, or None without stats."""
    if mean is None or std is None:
        return None
    pred_db = mel_pred * std + mean
    gt_db = mel_gt * std + mean
    mfcc_pred = _meldb_to_mfcc(pred_db, n_mfcc=n_mfcc)
    mfcc_gt = _meldb_to_mfcc(gt_db, n_mfcc=n_mfcc)
    T = min(mfcc_pred.shape[0], mfcc_gt.shape[0])
    D = mfcc_pred[:T] - mfcc_gt[:T]
    const = (10.0 / math.log(10.0)) * math.sqrt(2.0)
    rmse = np.sqrt((D ** 2).sum(axis=1)).mean()
    return float(const * rmse)


def evaluate(
    model,
    variables: dict,
    loader,
    stats: Optional[dict] = None,
    n_mfcc: int = 13,
) -> Dict[str, float]:
    """Run the eval loop over a batch iterable of {mri, mel, mask}."""
    variables = jax.device_put(variables)
    # the mask must reach the model, not just the loss: the BiLSTM's backward
    # direction would otherwise propagate padded-frame CNN features into every
    # real frame (collate pads batches; see models/lstm.py lstm_direction) —
    # metrics would then disagree with the exact masked serving path
    forward_ = jax.jit(
        lambda v, mri, mask: model.apply(v, mri, train=False, mask=mask)
    )
    tot_loss = tot_mse = tot_mae = 0.0
    n_batches = 0
    mcd_vals = []

    mean = std = None
    if stats is not None:
        mean = np.asarray(stats["mean"], dtype=np.float32).reshape(1, -1)
        std = np.asarray(stats["std"], dtype=np.float32).reshape(1, -1)

    for batch in loader:
        mel = np.asarray(batch["mel"], dtype=np.float32)
        mask = np.asarray(batch["mask"], dtype=np.float32)
        pred = np.asarray(
            forward_(variables, jnp.asarray(batch["mri"]), jnp.asarray(mask))
        )
        loss, mse, mae = simple_masked_loss(pred, mel, mask)
        tot_loss += loss
        tot_mse += mse
        tot_mae += mae
        n_batches += 1

        if mean is not None:
            for b in range(pred.shape[0]):
                valid = mask[b].astype(bool)
                if not valid.any():
                    continue
                val = mcd_like(pred[b, valid], mel[b, valid], mean, std, n_mfcc=n_mfcc)
                if val is not None and np.isfinite(val):
                    mcd_vals.append(val)

    out = {
        "loss": tot_loss / max(1, n_batches),
        "mse": tot_mse / max(1, n_batches),
        "mae": tot_mae / max(1, n_batches),
    }
    if mcd_vals:
        out["mcd_like"] = float(np.mean(mcd_vals))
    return out


def main() -> None:
    from mri2speech_tpu.data.dataset import BatchLoader, FixedLenPairDataset, split_indices
    from mri2speech_tpu.models.acoustic import AcousticModel
    from mri2speech_tpu.train import checkpoint as ckpt_io

    p = argparse.ArgumentParser(description="Masked MSE/MAE + MCD-like evaluation.")
    p.add_argument("--processed_dir", required=True)
    p.add_argument("--ckpt", default="best_mri_acoustic_model.ckpt")
    p.add_argument("--split", default="val", choices=["val", "test"])
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--ref_frames", type=int, default=4)
    p.add_argument(
        "--dataset", default="pairs", choices=["pairs", "var"],
        help="'pairs' = fixed ref_frames windows; 'var' = full variable-length "
             "utterances over <stem>_video/_audio.npy (the reference eval's "
             "MRIMelDataset path, `eval_mel.py:85-101`)",
    )
    p.add_argument("--seq_len", type=int, default=None,
                   help="Optional fixed length for --dataset var.")
    p.add_argument("--stats_json", default=None)
    p.add_argument("--sr", type=int, default=11413)  # fixed: pipeline-consistent
    p.add_argument("--n_mels", type=int, default=64)
    p.add_argument("--rnn_hidden", type=int, default=640)
    args = p.parse_args()

    if args.dataset == "var":
        from mri2speech_tpu.data.vardataset import MRIMelDataset, collate_pad

        vds = MRIMelDataset(args.processed_dir, sequence_length=args.seq_len)
        tr, va, te = split_indices(len(vds), seed=42)
        subset = va if args.split == "val" else te

        def var_batches():
            for s in range(0, len(subset), args.batch_size):
                items = [vds[int(i)] for i in subset[s : s + args.batch_size]]
                yield collate_pad(items, pad_to_multiple=8)

        loader = list(var_batches())
    else:
        ds = FixedLenPairDataset(args.processed_dir, ref_frames=args.ref_frames)
        tr, va, te = split_indices(len(ds), seed=42)
        subset = va if args.split == "val" else te
        loader = BatchLoader(ds, subset, args.batch_size, shuffle=False, drop_last=False)

    model = AcousticModel(n_mels=args.n_mels, rnn_hidden=args.rnn_hidden)
    obj = ckpt_io.load_checkpoint_raw(args.ckpt)
    variables = {
        "params": obj.get("params", obj.get("model_state_dict", obj)),
        "batch_stats": obj.get("batch_stats", {}),
    }

    stats = None
    if args.stats_json and os.path.isfile(args.stats_json):
        with open(args.stats_json, "r") as f:
            stats = json.load(f)
        if "mean" not in stats or "std" not in stats:
            print("[WARN] stats_json missing mean/std; skipping MCD-like.")
            stats = None

    res = evaluate(model, variables, loader, stats=stats)
    print(f"\n=== Evaluation (split: {args.split}) ===")
    print("masked loss: {:.6f}".format(res["loss"]))
    print("masked mse : {:.6f}".format(res["mse"]))
    print("masked mae : {:.6f}".format(res["mae"]))
    if "mcd_like" in res:
        print("MCD-like   : {:.4f}".format(res["mcd_like"]))
    else:
        print("MCD-like   : (skipped: no stats)")


if __name__ == "__main__":
    main()
