"""Per-mel-bin z-score scaler (scaler.json contract).

Parity: `preprocess_rtmri_data.py:168-195` (stats computation + JSON schema) and
`run_mri_video_inference.py:77-86,160-163` (load + denormalise).
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Union

import jax
import numpy as np

Array = jax.Array


@dataclass(frozen=True)
class MelScaler:
    """mean/std per mel bin, float32, 1-D each."""

    mean: np.ndarray
    std: np.ndarray

    def __post_init__(self) -> None:
        if self.mean.ndim != 1 or self.std.ndim != 1:
            raise ValueError("Scaler mean/std must be 1-D lists")
        if self.mean.shape != self.std.shape:
            raise ValueError("Scaler mean/std length mismatch")

    @property
    def n_mels(self) -> int:
        return int(self.mean.shape[0])

    @classmethod
    def load(cls, path: Union[str, Path]) -> "MelScaler":
        with open(path, "r", encoding="utf-8") as f:
            stats = json.load(f)
        if "mean" not in stats or "std" not in stats:
            raise KeyError("Scaler JSON must contain 'mean' and 'std' lists")
        return cls(
            mean=np.asarray(stats["mean"], dtype=np.float32),
            std=np.asarray(stats["std"], dtype=np.float32),
        )

    def save(self, path: Union[str, Path], count_frames: int = 0) -> None:
        stats = {
            "mean": self.mean.astype(np.float64).tolist(),
            "std": self.std.astype(np.float64).tolist(),
            "count_frames": int(count_frames),
        }
        with open(path, "w", encoding="utf-8") as f:
            json.dump(stats, f, indent=2)

    def normalize(self, mel_db: Array) -> Array:
        """(..., n_mels) dB -> z-scored (`preprocess_rtmri_data.py:232`)."""
        return (mel_db - self.mean) / self.std

    def denormalize(self, mel_norm: Array) -> Array:
        """z-scored -> dB (`run_mri_video_inference.py:160-163`)."""
        return mel_norm * self.std + self.mean


class StreamingMelStats:
    """Single-pass per-bin mean/std accumulator in float64.

    Matches `pass2_compute_stats` (`preprocess_rtmri_data.py:168-195`):
    var = E[x^2] - E[x]^2, std = sqrt(max(var, 1e-12)).
    """

    def __init__(self, n_mels: int) -> None:
        self._sum = np.zeros(n_mels, dtype=np.float64)
        self._sumsq = np.zeros(n_mels, dtype=np.float64)
        self._count = 0

    def update(self, mel_db: np.ndarray) -> None:
        if mel_db.size == 0:
            return
        m = mel_db.astype(np.float64)
        self._sum += m.sum(axis=0)
        self._sumsq += (m ** 2).sum(axis=0)
        self._count += m.shape[0]

    @property
    def count_frames(self) -> int:
        return self._count

    def finalize(self) -> MelScaler:
        if self._count == 0:
            raise RuntimeError("no mel frames collected; check the input data set")
        mean = self._sum / self._count
        var = self._sumsq / self._count - mean ** 2
        std = np.sqrt(np.maximum(var, 1e-12))
        return MelScaler(mean=mean.astype(np.float32), std=std.astype(np.float32))
