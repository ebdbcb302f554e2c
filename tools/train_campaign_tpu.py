"""Real-hardware training CAMPAIGN: the full reference recipe, end to end.

Runs the reference's documented training pipeline (`/root/reference/
docs/thesis_model_settings.md:61,71`, `README.md:129-144`) on the attached
chip with a synthetic corpus, entirely through product surfaces:

1. corpus -> 4-pass preprocessing (`data.preprocess`)
2. full-size acoustic training (EffNetV2-B2 + BiLSTM-640, a bounded number
   of steps — enough for usable predicted mels on the synthetic corpus)
3. predicted-mel export (`infer.export_mels::export_predicted_mels`) and
   ground-truth-mel export (`::export_groundtruth_mels`)
4. vocoder SCRATCH training through the product CLI loop
   (`cli.train_vocoder.run_training`): 512-ch generator + MPD/MSD, batch 16 x
   segment 8400, bf16, ~N_SCRATCH steps, checkpoints every CKPT_EVERY
5. vocoder FINE-TUNE continuation in the same checkpoint lineage with the
   reference's 0.8 GT / 0.2 predicted mel sampling mix (`train.py`
   fine_tuning mode; --extra_mels_weight 0.8)
6. checkpoint sweep (`eval.checkpoint_sweep`) over every g_* produced,
   on a fixed utterance set -> sweep_results.json + HTML gallery

Artifacts land in --out (default docs/campaign_r4/): campaign.json with
per-stage wall times, step-time percentiles (stability), train/validation
mel-error trajectories, and the sweep summary. Run bounded:
`timeout 3600 python tools/train_campaign_tpu.py`.
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

_repo = str(Path(__file__).resolve().parents[1])
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import jax

SR, HOP = 11413, 420


def build_corpus(root: Path, n_utt: int, seconds: float) -> Path:
    """Synthetic rtMRI-like corpus: tone-mixture audio + structured video
    whose content is correlated with the utterance id and time (same design
    as tools/smoke_train_tpu.py, larger)."""
    import cv2

    from mri2speech_tpu.data import audio_io

    data = root / "data"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for u in range(n_utt):
        t = np.arange(int(seconds * SR)) / SR
        f0 = 140 + 17 * u
        y = (
            0.4 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
            + 0.1 * np.sin(2 * np.pi * 3.1 * f0 * t)
        )
        audio_io.write_wav(str(data / f"u{u:02d}.wav"), SR, (y * 32767).astype(np.int16))
        n_frames = int(seconds * SR / HOP) + 2
        fourcc = cv2.VideoWriter_fourcc(*"MJPG")
        w = cv2.VideoWriter(str(data / f"u{u:02d}.avi"), fourcc, SR / HOP, (256, 256))
        yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
        for i in range(n_frames):
            img = 127 + 80 * np.sin(xx / (8 + u) + i * 0.3) * np.cos(yy / (10 + u))
            img += rng.normal(0, 8, (256, 256))
            w.write(cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR))
        w.release()
    return data


class _Tee(io.TextIOBase):
    """stdout tee: keep live output AND capture it for log parsing."""

    def __init__(self, stream):
        self.stream = stream
        self.buf = io.StringIO()

    def write(self, s):
        self.stream.write(s)
        self.buf.write(s)
        return len(s)

    def flush(self):
        self.stream.flush()


def _parse_cli_log(text: str) -> dict:
    steps = re.findall(
        r"Steps : (\d+), Gen Loss Total : ([\d.]+), Mel-Spec\. Error : ([\d.]+), s/b : ([\d.]+)",
        text,
    )
    vals = re.findall(r"Validation mel-spec error : ([\d.]+) \(step (\d+)\)", text)
    sb = np.asarray([float(s[3]) for s in steps[2:]])  # drop compile steps
    out = {
        "steps_logged": len(steps),
        "gen_loss_first": float(steps[0][1]) if steps else None,
        "gen_loss_last": float(steps[-1][1]) if steps else None,
        "mel_error_first": float(steps[0][2]) if steps else None,
        "mel_error_last": float(steps[-1][2]) if steps else None,
        "val_mel_error_trajectory": [
            {"step": int(s), "mel_error": float(v)} for v, s in vals
        ],
    }
    if sb.size:
        out["step_seconds"] = {
            "p50": float(np.percentile(sb, 50)),
            "p90": float(np.percentile(sb, 90)),
            "max": float(sb.max()),
            "n": int(sb.size),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/campaign_r5")
    ap.add_argument("--work", default=None, help="working dir (default: temp)")
    ap.add_argument("--n_utt", type=int, default=20)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--scratch_steps", type=int, default=1000)
    ap.add_argument("--finetune_steps", type=int, default=300)
    ap.add_argument("--ckpt_every", type=int, default=250)
    ap.add_argument("--acoustic_steps", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    from mri2speech_tpu.utils.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    backend = jax.default_backend()

    import tempfile

    root = Path(a.work) if a.work else Path(tempfile.mkdtemp(prefix="m2s_campaign_"))
    root.mkdir(parents=True, exist_ok=True)
    out_dir = Path(a.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    campaign: dict = {"backend": backend, "n_utt": a.n_utt, "seconds_per_utt": a.seconds}

    # ---- stage 1: corpus + preprocessing (product CLI path) ----
    t0 = time.time()
    data = build_corpus(root, a.n_utt, a.seconds)
    from mri2speech_tpu.data.convert import convert_npz_to_npy
    from mri2speech_tpu.data.filelists import create_filelists
    from mri2speech_tpu.data.preprocess import make_parser, run_preprocess

    processed = root / "processed"
    run_preprocess(
        make_parser().parse_args(
            ["--data_dir", str(data), "--out_dir", str(processed), "--video_exts", ".avi"]
        )
    )
    convert_npz_to_npy(processed / "pairs_ref4", processed / "pairs_ref4_npy")
    create_filelists(data, root / "lists", valid_ratio=0.2, seed=42)
    campaign["preprocess"] = {"seconds": round(time.time() - t0, 1)}
    print(json.dumps({"stage": "preprocess", **campaign["preprocess"]}), flush=True)

    # ---- stage 2: acoustic training (full-size, bounded) ----
    from mri2speech_tpu.data.dataset import BatchLoader, FixedLenPairDataset, split_indices
    from mri2speech_tpu.models.acoustic import AcousticModel
    from mri2speech_tpu.train import checkpoint as ckpt_io
    from mri2speech_tpu.train.acoustic import AcousticTrainer, AcousticTrainerConfig

    t0 = time.time()
    ds = FixedLenPairDataset(str(processed), ref_frames=4)
    tr, va, _ = split_indices(len(ds), seed=42)
    loader = BatchLoader(ds, tr, batch_size=8, drop_last=True, prefetch=2)
    model = AcousticModel(use_checkpoint=True)
    trainer = AcousticTrainer(
        model, AcousticTrainerConfig(micro_batch_size=2, max_train_steps=a.acoustic_steps)
    )
    state = trainer.init_state(ds.gather_batch(tr[:2]))
    state, m1 = trainer.train_epoch(state, loader, epoch_idx=1)
    state, m2 = trainer.train_epoch(state, loader, epoch_idx=2)
    acoustic_ckpt = root / "acoustic.ckpt"
    ckpt_io.save_checkpoint(
        str(acoustic_ckpt),
        {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        },
    )
    campaign["acoustic"] = {
        "steps": 2 * min(a.acoustic_steps, len(loader)),
        "epoch1_loss": round(m1["loss"], 4),
        "epoch2_loss": round(m2["loss"], 4),
        "improved": bool(m2["loss"] < m1["loss"]),
        "seconds": round(time.time() - t0, 1),
        **{k: round(v, 4) for k, v in trainer.step_timer.summary().items()},
    }
    print(json.dumps({"stage": "acoustic", **campaign["acoustic"]}), flush=True)

    # ---- stage 3: predicted + GT mel export ----
    import types

    from mri2speech_tpu.infer.export_mels import (
        export_groundtruth_mels,
        export_predicted_mels,
    )

    t0 = time.time()
    mels_pred, mels_gt = root / "mels_pred", root / "mels_gt"
    export_predicted_mels(types.SimpleNamespace(
        processed_dir=str(processed), mri_checkpoint=str(acoustic_ckpt),
        scaler_json=str(processed / "scaler.json"), output_dir=str(mels_pred),
        rnn_hidden=640, overwrite=True,
    ))
    export_groundtruth_mels(types.SimpleNamespace(
        processed_dir=str(processed), output_dir=str(mels_gt), overwrite=True,
    ))
    campaign["export_mels"] = {
        "n_pred": len(list(mels_pred.glob("*.npy"))),
        "n_gt": len(list(mels_gt.glob("*.npy"))),
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps({"stage": "export_mels", **campaign["export_mels"]}), flush=True)

    # ---- stage 4+5: vocoder scratch then fine-tune, PRODUCT CLI loop ----
    from mri2speech_tpu.config import AttrDict, default_vocoder_config
    from mri2speech_tpu.cli.train_vocoder import run_training

    h = AttrDict(dict(default_vocoder_config()))  # 512 ch, batch 16, seg 8400
    cp = root / "cp_hifigan"
    (root / "config.json").write_text(json.dumps(dict(h)))
    n_train = int(a.n_utt * 0.8 + 0.5)
    steps_per_epoch = max(1, n_train // h["batch_size"])

    def cli_args(epochs: int, fine: bool):
        return types.SimpleNamespace(
            group_name=None,
            input_wavs_dir=str(data),
            input_mels_dir=str(mels_pred),
            input_training_file=str(root / "lists" / "training.txt"),
            input_validation_file=str(root / "lists" / "validation.txt"),
            checkpoint_path=str(cp),
            config=str(root / "config.json"),
            training_epochs=epochs,
            stdout_interval=10,
            checkpoint_interval=a.ckpt_every,
            summary_interval=100,
            validation_interval=max(50, a.ckpt_every // 2),
            fine_tuning=fine,
            extra_mels_dir=str(mels_gt) if fine else None,
            extra_mels_weight=0.8 if fine else 0.0,
            bf16=backend == "tpu",
            # tiny-corpus guard: epochs here are 1-2 steps, so the
            # reference's step-every-epoch plateau scheduler would collapse
            # the LR on stale val errors (measured round 5: generator frozen
            # from step ~125, checkpoints byte-identical)
            plateau_on_fresh_val=True,
            bf16_opt_state=False,
            num_devices=1,
            no_preempt_guard=False,
        )

    scratch_epochs = a.scratch_steps // steps_per_epoch
    t0 = time.time()
    tee = _Tee(sys.stdout)
    with contextlib.redirect_stdout(tee):
        run_training(cli_args(scratch_epochs, fine=False), h)
    campaign["vocoder_scratch"] = {
        "target_steps": a.scratch_steps,
        "seconds": round(time.time() - t0, 1),
        **_parse_cli_log(tee.buf.getvalue()),
    }
    print(json.dumps({"stage": "vocoder_scratch", **campaign["vocoder_scratch"]}), flush=True)

    ft_epochs = scratch_epochs + a.finetune_steps // steps_per_epoch
    t0 = time.time()
    tee = _Tee(sys.stdout)
    with contextlib.redirect_stdout(tee):
        run_training(cli_args(ft_epochs, fine=True), h)
    campaign["vocoder_finetune"] = {
        "target_steps": a.finetune_steps,
        "gt_weight": 0.8,
        "pred_weight": 0.2,
        "seconds": round(time.time() - t0, 1),
        **_parse_cli_log(tee.buf.getvalue()),
    }
    print(json.dumps({"stage": "vocoder_finetune", **campaign["vocoder_finetune"]}), flush=True)

    # ---- stage 6: checkpoint sweep over every g_* produced ----
    # fixed 4-utterance set (the reference's listening-test protocol uses a
    # small fixed ID set, rtmri_pipeline_notes.md:117-131); sweep audio stays
    # in the temp workdir, only the JSON + HTML artifacts are kept
    import shutil

    from mri2speech_tpu.eval.checkpoint_sweep import discover_checkpoints, run_sweep

    t0 = time.time()
    mels_sweep = root / "mels_sweep"
    mels_sweep.mkdir(exist_ok=True)
    for p in sorted(mels_gt.glob("*.npy"))[:4]:
        shutil.copyfile(p, mels_sweep / p.name)
    sweep_dir = root / "checkpoint_sweep"
    cps = discover_checkpoints(str(cp))
    results = run_sweep(
        str(mels_sweep), str(sweep_dir), cps, str(root / "config.json"),
        gt_wav_dir=str(data),
    )
    campaign["sweep"] = {
        "n_checkpoints": len(cps),
        "best_checkpoint": results.get("best_checkpoint"),
        "seconds": round(time.time() - t0, 1),
        "seconds_per_checkpoint": round((time.time() - t0) / max(1, len(cps)), 2),
    }
    print(json.dumps({"stage": "sweep", **campaign["sweep"]}), flush=True)

    for name in ("sweep_results.json", "checkpoint_sweep.html"):
        src = sweep_dir / name
        if src.is_file():
            shutil.copyfile(src, out_dir / name)
    (out_dir / "campaign.json").write_text(json.dumps(campaign, indent=1))
    print(f"[campaign] artifacts -> {out_dir}/", flush=True)


if __name__ == "__main__":
    main()
