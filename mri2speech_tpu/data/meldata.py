"""Vocoder training dataset: audio crops + optional precomputed mels.

Parity target `meldataset.py:95-227` (MelDataset + get_dataset_filelist), with
one deliberate TPU-first change: the dataset does **no DSP**. The reference
computes both the generator-input mel and the loss mel per item inside CPU
dataloader workers (`meldataset.py:192-224`); here the host only loads, crops
and normalises audio, and the jitted train step computes the mels on device,
batched and fused with the rest of the step.

Modes:
* scratch  — item = random `segment_size` audio crop (peak-normalised * 0.95);
             the step derives input mel (fmax) and loss mel (fmax_for_loss)
* fine-tune — item = precomputed mel crop (20 frames) from a **weighted random
             mel directory** (`mel_dirs`/`mel_weights`, `meldataset.py:199`) +
             the aligned audio crop; the step derives only the loss mel
"""
from __future__ import annotations

import math
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mri2speech_tpu.data.audio_io import MAX_WAV_VALUE, load_wav, normalize_peak


def get_dataset_filelist(a) -> Tuple[List[str], List[str]]:
    """training/validation wav paths from `stem|...` filelists (`meldataset.py:95-103`)."""

    def read(path: str) -> List[str]:
        with open(path, "r", encoding="utf-8") as fi:
            return [
                os.path.join(a.input_wavs_dir, line.split("|")[0] + ".wav")
                for line in fi.read().split("\n")
                if len(line) > 0
            ]

    return read(a.input_training_file), read(a.input_validation_file)


class MelDataset:
    """Host-side item store for vocoder training (scratch or fine-tuning)."""

    def __init__(
        self,
        training_files: Sequence[str],
        segment_size: int,
        n_fft: int,
        num_mels: int,
        hop_size: int,
        win_size: int,
        sampling_rate: int,
        fmin: float,
        fmax: Optional[float],
        *,
        split: bool = True,
        shuffle: bool = True,
        fmax_loss: Optional[float] = None,
        fine_tuning: bool = False,
        base_mels_path: Optional[str] = None,
        mel_dirs: Optional[Sequence[str]] = None,
        mel_weights: Optional[Sequence[float]] = None,
        seed: int = 1234,
    ) -> None:
        self.audio_files = list(training_files)
        self._rng = random.Random(seed)
        if shuffle:
            self._rng.shuffle(self.audio_files)
        self.segment_size = segment_size
        self.sampling_rate = sampling_rate
        self.split = split
        self.n_fft = n_fft
        self.num_mels = num_mels
        self.hop_size = hop_size
        self.win_size = win_size
        self.fmin = fmin
        self.fmax = fmax
        self.fmax_loss = fmax_loss
        self.fine_tuning = fine_tuning
        self.frames_per_seg = math.ceil(segment_size / hop_size)

        # weighted multi-directory mel sampling (`meldataset.py:130-149`)
        self.mel_dirs: Optional[List[str]] = None
        self.mel_weights: Optional[List[float]] = None
        if mel_dirs is not None:
            if mel_weights is None:
                mel_weights = [1.0] * len(mel_dirs)
            if len(mel_dirs) != len(mel_weights):
                raise ValueError("mel_dirs and mel_weights must be the same length")
            filtered = [(d, w) for d, w in zip(mel_dirs, mel_weights) if d and w > 0]
            if not filtered:
                filtered = [(mel_dirs[0], 1.0)]
            dirs, weights = zip(*filtered)
            total = sum(weights)
            if total <= 0:
                raise ValueError("mel_weights sum must be > 0")
            self.mel_dirs = list(dirs)
            self.mel_weights = [w / total for w in weights]
        elif base_mels_path is not None:
            self.mel_dirs = [base_mels_path]
            self.mel_weights = [1.0]

    def __len__(self) -> int:
        return len(self.audio_files)

    def _load_audio(self, filename: str) -> np.ndarray:
        data, sr = load_wav(filename)
        if sr != self.sampling_rate:
            raise ValueError(f"{sr} SR doesn't match target {self.sampling_rate} SR")
        audio = np.asarray(data, dtype=np.float32) / MAX_WAV_VALUE
        if not self.fine_tuning:
            audio = normalize_peak(audio) * 0.95
        return audio

    def __getitem__(self, index: int) -> Dict[str, object]:
        """Returns {'audio': (L,), 'mel': (num_mels, frames) or None, 'filename'}.

        `audio` has length segment_size when split=True (zero-padded if short);
        full utterance length otherwise. `mel` is populated only in fine-tuning
        mode (loaded, cropped); the caller computes device-side mels.
        """
        filename = self.audio_files[index]
        audio = self._load_audio(filename)
        mel: Optional[np.ndarray] = None

        if not self.fine_tuning:
            if self.split:
                if audio.shape[0] >= self.segment_size:
                    start = self._rng.randint(0, audio.shape[0] - self.segment_size)
                    audio = audio[start : start + self.segment_size]
                else:
                    audio = np.pad(audio, (0, self.segment_size - audio.shape[0]))
        else:
            if not self.mel_dirs:
                raise ValueError("Fine-tuning requires mel directories to be specified.")
            stem = os.path.splitext(os.path.split(filename)[-1])[0]
            mel_dir = self._rng.choices(self.mel_dirs, weights=self.mel_weights, k=1)[0]
            mel_path = os.path.join(mel_dir, stem + ".npy")
            if not os.path.exists(mel_path):
                raise FileNotFoundError(f"Mel file not found: {mel_path}")
            mel = np.load(mel_path)
            if mel.ndim < 3:
                mel = mel[None, ...]  # (1, num_mels, T)

            if self.split:
                fps = self.frames_per_seg
                if audio.shape[0] >= self.segment_size:
                    mel_start = self._rng.randint(0, mel.shape[2] - fps - 1)
                    mel = mel[:, :, mel_start : mel_start + fps]
                    audio = audio[mel_start * self.hop_size : (mel_start + fps) * self.hop_size]
                    if audio.shape[0] < self.segment_size:
                        audio = np.pad(audio, (0, self.segment_size - audio.shape[0]))
                else:
                    mel = np.pad(mel, ((0, 0), (0, 0), (0, fps - mel.shape[2])))
                    audio = np.pad(audio, (0, self.segment_size - audio.shape[0]))
            mel = np.squeeze(mel, axis=0)

        return {"audio": audio.astype(np.float32), "mel": mel, "filename": filename}

    def gather_batch(self, indices: Sequence[int]) -> Dict[str, object]:
        items = [self[int(i)] for i in indices]
        batch: Dict[str, object] = {
            "audio": np.stack([it["audio"] for it in items]),
            "filename": [it["filename"] for it in items],
        }
        if items[0]["mel"] is not None:
            batch["mel"] = np.stack([it["mel"] for it in items])
        else:
            batch["mel"] = None
        return batch
