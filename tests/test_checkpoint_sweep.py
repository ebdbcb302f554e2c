"""Checkpoint-sweep evaluator: gallery + metrics across vocoder checkpoints.

Automates the reference's manual listening comparison
(`docs/rtmri_pipeline_notes.md:117-131`: infer the same utterances at several
checkpoints). The sweep must (a) produce per-checkpoint wavs identical to the
single-checkpoint mel-inference path, (b) compute the trainer's validation
mel-L1 per (checkpoint, utterance), and (c) emit the self-contained HTML
gallery + JSON summary.
"""
import json
import os

import numpy as np
import pytest

import jax

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.data.audio_io import MAX_WAV_VALUE, write_wav
from mri2speech_tpu.eval.checkpoint_sweep import discover_checkpoints, run_sweep
from mri2speech_tpu.models.vocoder import Generator
from mri2speech_tpu.train import checkpoint as ckpt_io


@pytest.fixture(scope="module")
def sweep_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("sweep")
    h = dict(default_vocoder_config(upsample_initial_channel=32))

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    with open(ckpt_dir / "config.json", "w") as f:
        json.dump(h, f)
    gen_wn = Generator(h=h)
    for i, seed in ((1, 1), (2, 99)):
        params = gen_wn.init(
            jax.random.PRNGKey(seed), np.zeros((1, 64, 4), np.float32)
        )["params"]
        ckpt_io.save_checkpoint(
            str(ckpt_dir / f"g_{i:08d}"), {"generator": jax.device_get(params)}
        )

    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    rng = np.random.default_rng(0)
    for stem, T in (("utt_a", 6), ("utt_b", 9)):
        mel = (rng.standard_normal((64, T)) - 4.0).astype(np.float32)
        np.save(mel_dir / f"{stem}.npy", mel)

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    gt = (rng.standard_normal(6 * h["hop_size"]) * 0.1 * MAX_WAV_VALUE).astype(
        np.int16
    )
    write_wav(str(gt_dir / "utt_a.wav"), h["sampling_rate"], gt)
    return tmp_path, ckpt_dir, mel_dir, gt_dir, h


def test_discover_checkpoints_order(sweep_setup):
    _, ckpt_dir, _, _, _ = sweep_setup
    cps = discover_checkpoints(str(ckpt_dir))
    assert [os.path.basename(c) for c in cps] == ["g_00000001", "g_00000002"]


def test_sweep_outputs_and_metrics(sweep_setup):
    tmp_path, ckpt_dir, mel_dir, gt_dir, h = sweep_setup
    out = tmp_path / "out"
    cps = discover_checkpoints(str(ckpt_dir))
    results = run_sweep(
        str(mel_dir), str(out), cps, str(ckpt_dir / "config.json"),
        gt_wav_dir=str(gt_dir),
    )

    assert set(results["checkpoints"]) == {"g_00000001", "g_00000002"}
    assert results["best_checkpoint"] in results["checkpoints"]
    for cp_name, s in results["checkpoints"].items():
        assert np.isfinite(s["mean_mel_error"])
        assert set(s["utterances"]) == {"utt_a", "utt_b"}
        for stem, T in (("utt_a", 6), ("utt_b", 9)):
            wav = out / cp_name / f"{stem}_from_mel.wav"
            assert wav.is_file()
            from scipy.io.wavfile import read

            sr, data = read(str(wav))
            assert sr == h["sampling_rate"] and data.dtype == np.int16
            assert len(data) == T * h["hop_size"]
            assert np.isfinite(s["utterances"][stem]["mel_error"])
        # GT metrics only where GT audio exists
        assert "gt_mel_l1" in s["utterances"]["utt_a"]
        assert "gt_mel_l1" not in s["utterances"]["utt_b"]
        assert np.isfinite(s["utterances"]["utt_a"]["gt_mel_l1"])

    # the two checkpoints are different random inits -> different audio
    from scipy.io.wavfile import read

    _, a1 = read(str(out / "g_00000001" / "utt_a_from_mel.wav"))
    _, a2 = read(str(out / "g_00000002" / "utt_a_from_mel.wav"))
    assert not np.array_equal(a1, a2)

    # artifacts: JSON mirror + self-contained gallery + copied GT audio
    with open(out / "sweep_results.json") as f:
        assert json.load(f)["best_checkpoint"] == results["best_checkpoint"]
    html_text = (out / "checkpoint_sweep.html").read_text()
    assert "g_00000001/utt_a_from_mel.wav" in html_text
    assert "g_00000002/utt_b_from_mel.wav" in html_text
    assert "gt/utt_a.wav" in html_text
    assert (out / "gt" / "utt_a.wav").is_file()


def test_sweep_matches_single_checkpoint_inference(sweep_setup):
    """The param-swap sweep path must reproduce the standalone mel-inference
    CLI's waveform for the same checkpoint (one compiled program serving
    every checkpoint is an optimization, not a semantic change)."""
    tmp_path, ckpt_dir, mel_dir, _, h = sweep_setup
    from mri2speech_tpu.infer.mel_inference import run_mel_inference

    out_sweep = tmp_path / "out_match"
    run_sweep(
        str(mel_dir), str(out_sweep),
        [str(ckpt_dir / "g_00000002")], str(ckpt_dir / "config.json"),
    )
    out_single = tmp_path / "out_single"
    run_mel_inference(
        str(mel_dir), str(out_single), str(ckpt_dir / "g_00000002"),
        str(ckpt_dir / "config.json"),
    )
    from scipy.io.wavfile import read

    _, a_sweep = read(str(out_sweep / "g_00000002" / "utt_a_from_mel.wav"))
    _, a_single = read(str(out_single / "utt_a_generated_e2e.wav"))
    # both int16 from the same float audio; sweep clips before scaling,
    # random-weight tanh output stays within [-1, 1] so paths agree exactly
    np.testing.assert_array_equal(a_sweep, a_single)
