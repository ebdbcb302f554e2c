"""Integration test for the vocoder training CLI epoch loop.

Exercises `cli/train_vocoder.run_training` end to end on a tiny corpus/config:
stdout/summary/checkpoint/validation cadences, TensorBoard writes, g_/do_
checkpoints, and resume-on-restart.
"""
import json
import types
from pathlib import Path

import numpy as np
import pytest

from mri2speech_tpu.config import AttrDict, default_vocoder_config
from mri2speech_tpu.data.filelists import create_filelists

from test_data import _write_wav

SR = 11413


@pytest.fixture(scope="module")
def vocoder_cli_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_cli")
    wavs = root / "wavs"
    wavs.mkdir()
    for i in range(6):
        _write_wav(wavs / f"utt{i:03d}.wav", 1.0, freq=180 + 20 * i)
    create_filelists(wavs, root / "lists", valid_ratio=0.2, seed=42)

    cfg = dict(default_vocoder_config(upsample_initial_channel=16, batch_size=2))
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    return root, wavs, cfg_path


def _args(root, wavs, cfg_path, ckpt_dir, num_devices=1):
    return types.SimpleNamespace(
        group_name=None,
        input_wavs_dir=str(wavs),
        input_mels_dir="unused",
        input_training_file=str(root / "lists" / "training.txt"),
        input_validation_file=str(root / "lists" / "validation.txt"),
        checkpoint_path=str(ckpt_dir),
        config=str(cfg_path),
        training_epochs=2,
        stdout_interval=1,
        checkpoint_interval=2,
        summary_interval=1,
        validation_interval=2,
        fine_tuning=False,
        extra_mels_dir=None,
        extra_mels_weight=0.0,
        num_devices=num_devices,
    )


def test_vocoder_cli_epoch_and_resume(vocoder_cli_setup, tmp_path):
    from mri2speech_tpu.cli.train_vocoder import run_training

    root, wavs, cfg_path = vocoder_cli_setup
    ckpt_dir = tmp_path / "cp"
    with open(cfg_path) as f:
        h = AttrDict(json.load(f))

    run_training(_args(root, wavs, cfg_path, ckpt_dir), h)

    # checkpoints written at the cadence, logs directory exists
    gs = sorted(ckpt_dir.glob("g_*"))
    dos = sorted(ckpt_dir.glob("do_*"))
    assert gs and dos and len(gs) == len(dos)
    assert (ckpt_dir / "logs").is_dir()

    # resume: a second "epoch 0 run" starts from the scanned checkpoint
    # (same epoch range -> loop is skipped or continues without error)
    run_training(_args(root, wavs, cfg_path, ckpt_dir), h)


def test_vocoder_cli_num_devices_8(vocoder_cli_setup, tmp_path):
    """`--num_devices 8` trains data-parallel on the virtual 8-device mesh.

    The product surface of the reference's distributed path
    (`train.py:300-307`), driven through the real CLI epoch loop.
    """
    from mri2speech_tpu.cli.train_vocoder import run_training

    root, wavs, cfg_path = vocoder_cli_setup
    ckpt_dir = tmp_path / "cp_dp"
    with open(cfg_path) as f:
        cfg = json.load(f)
    # 6 utterances, batch 8: crops are per-utterance so reuse stems via a
    # batch the corpus can fill — bump the corpus instead
    for i in range(6, 10):
        _write_wav(wavs / f"utt{i:03d}.wav", 1.0, freq=180 + 20 * i)
    create_filelists(wavs, root / "lists8", valid_ratio=0.2, seed=42)
    cfg["batch_size"] = 8
    cfg8 = root / "config8.json"
    cfg8.write_text(json.dumps(cfg))
    h = AttrDict(cfg)

    a = _args(root, wavs, cfg8, ckpt_dir, num_devices=8)
    a.input_training_file = str(root / "lists8" / "training.txt")
    a.input_validation_file = str(root / "lists8" / "validation.txt")
    a.training_epochs = 2  # 1 batch/epoch -> step 1 hits checkpoint_interval=1
    a.checkpoint_interval = 1
    run_training(a, h)
    assert sorted(ckpt_dir.glob("g_*")) and sorted(ckpt_dir.glob("do_*"))
