"""End-to-end slice: preprocess -> train acoustic -> export mels -> fine-tune
vocoder -> video->wav inference, all on a tiny synthetic corpus.

This is the integration test the reference never had (SURVEY §4): every on-disk
contract and model hand-off in the product path is exercised in one flow.
"""
import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.data.dataset import BatchLoader, FixedLenPairDataset, split_indices
from mri2speech_tpu.data.meldata import MelDataset
from mri2speech_tpu.infer.export_mels import PredictedMelExporter, convert_mel_db_to_log_power
from mri2speech_tpu.infer.pipeline import VideoToSpeechPipeline
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator
from mri2speech_tpu.ops.scaler import MelScaler
from mri2speech_tpu.train.acoustic import AcousticTrainer, AcousticTrainerConfig
from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig

from test_data import _write_video, _write_wav  # synthetic corpus helpers

TINY_SPEC = (
    StageSpec("cn", 3, 1, 1, 8, 1),
    StageSpec("er", 3, 2, 2, 8, 1),
    StageSpec("ir", 3, 2, 2, 16, 1, 0.25),
)
HW = 64


@pytest.fixture(scope="module")
def slice_dirs(tmp_path_factory):
    """Corpus -> processed dataset at 64x64 resolution."""
    from mri2speech_tpu.data.preprocess import make_parser, run_preprocess

    root = tmp_path_factory.mktemp("e2e")
    data = root / "data"
    data.mkdir()
    for stem, seconds, frames in (("001_a", 1.6, 42), ("002_b", 1.3, 34)):
        _write_wav(data / f"{stem}.wav", seconds)
        _write_video(data / f"{stem}.avi", frames, hw=(HW, HW))
    processed = root / "processed"
    args = make_parser().parse_args(
        [
            "--data_dir", str(data), "--out_dir", str(processed),
            "--video_exts", ".avi", "--resize_h", str(HW), "--resize_w", str(HW),
        ]
    )
    run_preprocess(args)
    return root, data, processed


def test_full_slice(slice_dirs, tmp_path):
    root, data, processed = slice_dirs

    # ---- 1. train the acoustic model a few steps ----
    ds = FixedLenPairDataset(str(processed), ref_frames=4, expected_hw=(HW, HW))
    tr, va, te = split_indices(len(ds), seed=42)
    train_loader = BatchLoader(ds, tr, batch_size=4, drop_last=True, prefetch=0)
    val_loader = BatchLoader(ds, va, batch_size=4, shuffle=False, drop_last=False, prefetch=0)

    model = AcousticModel(n_mels=64, rnn_hidden=16, cnn_spec=TINY_SPEC, cnn_stem=8)
    trainer = AcousticTrainer(
        model,
        AcousticTrainerConfig(micro_batch_size=2, max_train_steps=2, max_val_steps=2),
    )
    state = trainer.init_state(next(iter(val_loader)))
    ckpt_path = str(tmp_path / "best_acoustic.ckpt")
    state = trainer.fit(state, train_loader, val_loader, epochs=2, save_path=ckpt_path)
    assert Path(ckpt_path).is_file()

    # ---- 2. export predicted + GT mels for fine-tuning ----
    scaler = MelScaler.load(processed / "scaler.json")
    exporter = PredictedMelExporter(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        scaler,
    )
    mels_pred = tmp_path / "mels_pred"
    mels_gt = tmp_path / "mels_gt"
    mels_pred.mkdir()
    mels_gt.mkdir()
    meta = json.loads((processed / "meta.json").read_text())
    for stem in meta["stems"]:
        mri = np.load(processed / "samples" / stem / "mri.npy")
        mel_log = exporter.export(mri)
        assert mel_log.shape == (64, mri.shape[0])
        np.save(mels_pred / f"{stem}.npy", mel_log)
        mel_db = np.load(processed / "samples" / stem / "mel_db.npy")
        np.save(mels_gt / f"{stem}.npy", convert_mel_db_to_log_power(mel_db))

    # ---- 3. vocoder fine-tuning step on the mel mix ----
    h = default_vocoder_config(upsample_initial_channel=16)
    vt = VocoderTrainer(h, VocoderTrainerConfig(fine_tuning=True))
    gstate = vt.init_state(jax.random.PRNGKey(0))
    ft_ds = MelDataset(
        [str(data / f"{stem}.wav") for stem in meta["stems"]],
        h.segment_size, h.n_fft, h.num_mels, h.hop_size, h.win_size,
        h.sampling_rate, h.fmin, h.fmax, fmax_loss=h.fmax_for_loss,
        fine_tuning=True, mel_dirs=[str(mels_pred), str(mels_gt)],
        mel_weights=[0.2, 0.8], shuffle=False,
    )
    batch = ft_ds.gather_batch([0, 1])
    assert batch["mel"].shape == (2, 64, 20)
    gstate, metrics = vt.train_step(gstate, batch)
    assert np.isfinite(float(metrics["loss_gen_all"]))
    vt.save(str(tmp_path / "cp"), gstate, steps=1, epoch=0)

    # ---- 4. fused video->wav inference with the trained weights ----
    gen = Generator(h=dict(h), use_weight_norm=False)
    folded = fold_weight_norm(jax.device_get(gstate.gen_params))
    pipe = VideoToSpeechPipeline(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        gen, folded, scaler, frame_bucket=16,
    )
    frames = np.load(processed / "samples" / meta["stems"][0] / "mri.npy")
    audio, mel_db, mel_log = pipe(frames)
    assert audio.shape == (frames.shape[0] * 420,)
    assert np.all(np.isfinite(audio)) and np.max(np.abs(audio)) <= 1.0
    assert mel_db.shape == (frames.shape[0], 64)

    # mel domain sanity: denormalised dB values land in a plausible dB range
    assert -120.0 < float(mel_db.mean()) < 40.0
