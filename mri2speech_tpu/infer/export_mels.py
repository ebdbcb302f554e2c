"""Mel exporters for vocoder fine-tuning.

* Predicted mels (`scripts/export_predicted_mels.py:43-99`): run the acoustic
  model over `samples/<ID>/mri.npy`, denormalise with scaler.json, bridge
  dB -> ln-power, save `(n_mels, T)` .npy per sample.
* Ground-truth mels (`scripts/export_groundtruth_mels.py:7-16,22-55`): pure
  dB -> ln-power transpose of `mel_db.npy`.

TPU design: the acoustic forward + denorm + bridge run as one jitted program
over frame buckets (mask-exact BiLSTM under padding); utterances stream through
the same compiled executable.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.ops.mel import mel_db_to_log_power
from mri2speech_tpu.ops.scaler import MelScaler
from mri2speech_tpu.train import checkpoint as ckpt_io

_FRAME_BUCKET = 64


def convert_mel_db_to_log_power(mel_db: np.ndarray) -> np.ndarray:
    """(T, n_mels) dB -> (n_mels, T) ln-power (`export_groundtruth_mels.py:7-16`)."""
    if mel_db.ndim != 2:
        raise ValueError(f"Expected 2-D mel array (T, n_mels), got shape {mel_db.shape}")
    return np.asarray(mel_db_to_log_power(jnp.asarray(mel_db))).T.astype(np.float32)


class PredictedMelExporter:
    def __init__(self, model: AcousticModel, variables: dict, scaler: MelScaler):
        self.model = model
        # jit ARGUMENT, not a closure constant (avoids giant HLO literals)
        self.variables = jax.device_put(variables)
        self.mean = jnp.asarray(scaler.mean)
        self.std = jnp.asarray(scaler.std)
        self._fn = jax.jit(self._forward)

    def _forward(self, variables, frames, mask):
        pred_norm = self.model.apply(variables, frames, train=False, mask=mask)
        mel_db = pred_norm * self.std + self.mean
        return mel_db_to_log_power(mel_db)

    def export(self, mri: np.ndarray) -> np.ndarray:
        """(T, H, W) [0,1] frames -> (n_mels, T) ln-power mel."""
        T = mri.shape[0]
        Tp = ((T + _FRAME_BUCKET - 1) // _FRAME_BUCKET) * _FRAME_BUCKET
        buf = np.zeros((1, Tp, 1) + mri.shape[1:], dtype=np.float32)
        buf[0, :T, 0] = mri
        if Tp > T:
            buf[0, T:, 0] = mri[-1]
        mask = np.zeros((1, Tp), dtype=np.float32)
        mask[0, :T] = 1.0
        mel_log = np.asarray(
            self._fn(self.variables, jnp.asarray(buf), jnp.asarray(mask))
        )[0, :T]
        return mel_log.T.astype(np.float32)  # (n_mels, T)


def export_predicted_mels(args: argparse.Namespace) -> None:
    processed_dir = Path(args.processed_dir).resolve()
    samples_dir = processed_dir / "samples"
    if not samples_dir.is_dir():
        raise SystemExit(f"samples directory not found: {samples_dir}")
    output_dir = Path(args.output_dir).resolve()
    output_dir.mkdir(parents=True, exist_ok=True)

    scaler = MelScaler.load(args.scaler_json)
    model = AcousticModel(n_mels=scaler.n_mels, rnn_hidden=args.rnn_hidden, dropout=0.5)
    obj = ckpt_io.load_checkpoint_raw(args.mri_checkpoint)
    params = obj.get("params", obj)
    variables = {"params": params, "batch_stats": obj.get("batch_stats", {})}
    exporter = PredictedMelExporter(model, variables, scaler)

    sample_dirs = sorted((p for p in samples_dir.iterdir() if p.is_dir()), key=lambda p: p.name)
    if not sample_dirs:
        raise SystemExit(f"No sample folders found under {samples_dir}")
    for sample_path in sample_dirs:
        out_path = output_dir / f"{sample_path.name}.npy"
        if out_path.exists() and not args.overwrite:
            continue
        mri_path = sample_path / "mri.npy"
        if not mri_path.is_file():
            print(f"[WARN] MRI file missing for {sample_path.name}, skipping")
            continue
        mri = np.load(mri_path).astype(np.float32)
        np.save(out_path, exporter.export(mri))
    print(f"[DONE] Exported predicted mels to {output_dir}")


def export_groundtruth_mels(args: argparse.Namespace) -> None:
    processed_dir = Path(args.processed_dir).resolve()
    samples_dir = processed_dir / "samples"
    if not samples_dir.is_dir():
        raise SystemExit(f"samples directory not found: {samples_dir}")
    output_dir = Path(args.output_dir).resolve()
    output_dir.mkdir(parents=True, exist_ok=True)

    converted = skipped = 0
    for sample_path in sorted(p for p in samples_dir.iterdir() if p.is_dir()):
        src = sample_path / "mel_db.npy"
        if not src.is_file():
            print(f"[WARN] mel_db.npy missing in {sample_path}, skipping")
            skipped += 1
            continue
        dst = output_dir / f"{sample_path.name}.npy"
        if dst.exists() and not args.overwrite:
            skipped += 1
            continue
        np.save(dst, convert_mel_db_to_log_power(np.load(src).astype(np.float32)))
        converted += 1
    print(f"[DONE] Converted {converted} mel files. Skipped {skipped}. Output dir: {output_dir}")


def main_predicted() -> None:
    parser = argparse.ArgumentParser(
        description="Export predicted log-mel features for HiFi-GAN fine-tuning."
    )
    parser.add_argument("--processed_dir", required=True)
    parser.add_argument("--mri_checkpoint", required=True)
    parser.add_argument("--scaler_json", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--rnn_hidden", type=int, default=640)
    parser.add_argument("--overwrite", action="store_true")
    export_predicted_mels(parser.parse_args())


def main_groundtruth() -> None:
    parser = argparse.ArgumentParser(
        description="Export ground-truth mels (log-power, [n_mels, T]) from mel_db.npy."
    )
    parser.add_argument("--processed_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--overwrite", action="store_true")
    export_groundtruth_mels(parser.parse_args())


if __name__ == "__main__":
    main_predicted()
