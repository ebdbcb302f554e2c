"""Real-hardware smoke training: full-size models on a synthetic corpus.

Builds a small synthetic rtMRI corpus (structured video frames correlated with
tone audio), runs the full preprocessing pipeline, then trains the FULL-SIZE
acoustic model (EffNetV2-B2 + BiLSTM-640) and the FULL-SIZE vocoder on the
attached chip for a bounded number of steps, reporting loss trajectories.

This validates the complete train path — preprocess -> mmap datasets ->
jitted steps -> checkpoints — at production model scale with live hardware.
Prints JSON lines with first/last losses.
"""
from __future__ import annotations

import json
import tempfile
import time
from pathlib import Path

import numpy as np

import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import jax

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.data import audio_io
from mri2speech_tpu.data.dataset import BatchLoader, FixedLenPairDataset, split_indices
from mri2speech_tpu.data.meldata import MelDataset
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.train.acoustic import AcousticTrainer, AcousticTrainerConfig
from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig

SR, HOP = 11413, 420


def build_corpus(root: Path, n_utt: int = 6, seconds: float = 2.0) -> Path:
    import cv2

    data = root / "data"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for u in range(n_utt):
        t = np.arange(int(seconds * SR)) / SR
        f0 = 150 + 30 * u
        y = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
        audio_io.write_wav(str(data / f"u{u:02d}.wav"), SR, (y * 32767).astype(np.int16))

        n_frames = int(seconds * SR / HOP) + 2
        fourcc = cv2.VideoWriter_fourcc(*"MJPG")
        w = cv2.VideoWriter(str(data / f"u{u:02d}.avi"), fourcc, SR / HOP, (256, 256))
        for i in range(n_frames):
            # frames structurally correlated with the utterance id + time
            yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
            img = 127 + 80 * np.sin(xx / (8 + u) + i * 0.3) * np.cos(yy / (10 + u))
            img += rng.normal(0, 8, (256, 256))
            frame = np.clip(img, 0, 255).astype(np.uint8)
            w.write(cv2.cvtColor(frame, cv2.COLOR_GRAY2BGR))
        w.release()
    return data


def main() -> None:
    backend = jax.default_backend()
    root = Path(tempfile.mkdtemp(prefix="m2s_smoke_"))
    data = build_corpus(root)
    processed = root / "processed"

    from mri2speech_tpu.data.convert import convert_npz_to_npy
    from mri2speech_tpu.data.preprocess import make_parser, run_preprocess

    t0 = time.time()
    run_preprocess(
        make_parser().parse_args(
            ["--data_dir", str(data), "--out_dir", str(processed), "--video_exts", ".avi"]
        )
    )
    convert_npz_to_npy(processed / "pairs_ref4", processed / "pairs_ref4_npy")
    print(json.dumps({"stage": "preprocess", "seconds": round(time.time() - t0, 1)}))

    # ---- full-size acoustic training ----
    ds = FixedLenPairDataset(str(processed), ref_frames=4)
    tr, va, _ = split_indices(len(ds), seed=42)
    train_loader = BatchLoader(ds, tr, batch_size=8, drop_last=True, prefetch=2)
    model = AcousticModel(use_checkpoint=True)  # full B2 + BiLSTM 640 + remat
    trainer = AcousticTrainer(
        model, AcousticTrainerConfig(micro_batch_size=2, max_train_steps=40)
    )
    state = trainer.init_state(ds.gather_batch(tr[:2]))
    t0 = time.time()
    state, metrics = trainer.train_epoch(state, train_loader, epoch_idx=1)
    first_epoch = metrics
    state, metrics2 = trainer.train_epoch(state, train_loader, epoch_idx=2)
    print(
        json.dumps(
            {
                "stage": "acoustic_train",
                "backend": backend,
                "steps": 2 * min(40, len(train_loader)),
                "epoch1_loss": round(first_epoch["loss"], 4),
                "epoch2_loss": round(metrics2["loss"], 4),
                "improved": bool(metrics2["loss"] < first_epoch["loss"]),
                "seconds": round(time.time() - t0, 1),
                **{k: round(v, 4) for k, v in trainer.step_timer.summary().items()},
            }
        )
    )

    # ---- full-size vocoder training (scratch) ----
    h = default_vocoder_config()
    vt = VocoderTrainer(h, VocoderTrainerConfig(fine_tuning=False))
    gstate = vt.init_state(jax.random.PRNGKey(h["seed"]))
    wavs = sorted((data).glob("*.wav"))
    vds = MelDataset(
        [str(p) for p in wavs], h["segment_size"], h["n_fft"], h["num_mels"],
        h["hop_size"], h["win_size"], h["sampling_rate"], h["fmin"], h["fmax"],
        fmax_loss=h["fmax_for_loss"],
    )
    t0 = time.time()
    mel_errs = []
    rng = np.random.default_rng(0)
    for step in range(30):
        idx = rng.integers(0, len(vds), size=h["batch_size"])
        batch = vds.gather_batch(idx)
        gstate, m = vt.train_step(gstate, batch)
        mel_errs.append(float(m["mel_error"]))
    print(
        json.dumps(
            {
                "stage": "vocoder_train",
                "backend": backend,
                "steps": 30,
                "mel_error_first5": [round(v, 3) for v in mel_errs[:5]],
                "mel_error_last5": [round(v, 3) for v in mel_errs[-5:]],
                "improved": bool(np.mean(mel_errs[-5:]) < np.mean(mel_errs[:5])),
                "seconds": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
