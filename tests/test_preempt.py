"""Preemption-safe training: signal -> safe-point snapshot -> exact resume.

A production-robustness surface the reference lacks entirely (an interrupted
acoustic run there loses everything since the last best-val epoch,
`train_mri_acoustic_model.py:508-521`; a vocoder run up to 5000 steps,
`train.py:199-211`). The contract under test is ours: SIGTERM stops at a
step boundary, the emergency snapshot restores bit-identically, the stale
snapshot is cleaned up after a completed run, and the end-to-end CLI
round-trips (kill -TERM -> rc 0 -> auto-resume).
"""
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

import jax

from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.effnetv2 import StageSpec
from mri2speech_tpu.train.acoustic import AcousticTrainer, AcousticTrainerConfig
from mri2speech_tpu.train.preempt import PreemptionGuard, maybe_resume_path

TINY_SPEC = (
    StageSpec("cn", 3, 1, 1, 8, 1),
    StageSpec("er", 3, 2, 2, 8, 1),
)


def _tiny_model():
    return AcousticModel(
        n_mels=8, rnn_hidden=16, dropout=0.1, cnn_spec=TINY_SPEC, cnn_stem=8
    )


def _batch(rng, B=4, T=4, HW=32, M=8):
    return {
        "mri": rng.random((B, T, 1, HW, HW)).astype(np.float32),
        "mel": rng.standard_normal((B, T, M)).astype(np.float32),
        "mask": np.ones((B, T), dtype=np.float32),
    }


class _Loader:
    """Deterministic list-backed loader that can trip a guard mid-epoch."""

    def __init__(self, batches, trip_guard=None, trip_after=None):
        self.batches = batches
        self.trip_guard = trip_guard
        self.trip_after = trip_after

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        for i, b in enumerate(self.batches):
            if self.trip_guard is not None and i == self.trip_after:
                self.trip_guard.trip()  # as if SIGTERM arrived mid-step
            yield b


def test_guard_signal_and_restore():
    """A real OS signal sets the flag; previous handlers come back."""
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard(signals=(signal.SIGTERM,)) as guard:
        assert not guard.triggered and not guard.should_stop()
        os.kill(os.getpid(), signal.SIGTERM)
        # delivery is synchronous for self-signals on the main thread
        assert guard.triggered and guard.should_stop()
    assert signal.getsignal(signal.SIGTERM) is before


def test_maybe_resume_path(tmp_path):
    emer = tmp_path / "ckpt.preempt"
    assert maybe_resume_path(None, str(emer)) is None
    assert maybe_resume_path("/explicit", str(emer)) == "/explicit"
    emer.write_bytes(b"x")
    assert maybe_resume_path(None, str(emer)) == str(emer)
    # the snapshot is strictly newer progress of this exact lineage: it wins
    # even over an explicit --resume_ckpt (re-running the identical command
    # after a preemption must not resume the older checkpoint)
    assert maybe_resume_path("/explicit", str(emer)) == str(emer)


def test_trainer_stops_saves_and_resumes_exactly(tmp_path):
    """Mid-epoch trip: fit stops at the step boundary, the snapshot restores
    the exact params/opt/step, and the interrupted epoch repeats."""
    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(4)]

    guard = PreemptionGuard()  # not installed: no handler needed for trip()
    trainer = AcousticTrainer(
        _tiny_model(), AcousticTrainerConfig(micro_batch_size=2, lr=1e-3),
        preempt=guard,
    )
    state0 = trainer.init_state(batches[0])
    save = str(tmp_path / "best.ckpt")
    emer = save + ".preempt"

    loader = _Loader(batches, trip_guard=guard, trip_after=2)
    state = trainer.fit(state0, loader, _Loader(batches[:1]), epochs=3,
                        save_path=save)
    # tripped while batch 2 was in flight -> that step completes (the safe
    # point is the step boundary), then the loop stops: 3 of 4 steps ran
    assert int(jax.device_get(state.global_step)) == 3
    assert os.path.exists(emer)
    assert not os.path.exists(save)  # never reached a best save

    # fresh trainer auto-resumes: same params bit-for-bit, epoch 1 repeats
    trainer2 = AcousticTrainer(
        _tiny_model(), AcousticTrainerConfig(micro_batch_size=2, lr=1e-3)
    )
    state_r, start_epoch = trainer2.resume_from_checkpoint(
        emer, trainer2.init_state(batches[0])
    )
    assert start_epoch == 1
    assert int(jax.device_get(state_r.global_step)) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
        ),
        jax.device_get(state_r.params), jax.device_get(state.params),
    )
    assert trainer2.best_val == float("inf")  # NaN/inf snapshot didn't pollute

    # completing the resumed run clears the stale emergency snapshot
    trainer2.preempt = PreemptionGuard()  # active guard, never tripped
    trainer2.fit(state_r, _Loader(batches[:1]), _Loader(batches[:1]),
                 epochs=1, save_path=save)
    assert not os.path.exists(emer)


def test_emergency_keeps_best_val_bar(tmp_path):
    """The snapshot carries the current best_val so a resumed run doesn't
    re-save 'best' checkpoints for worse validation losses."""
    rng = np.random.default_rng(1)
    batches = [_batch(rng) for _ in range(2)]
    guard = PreemptionGuard()
    trainer = AcousticTrainer(
        _tiny_model(), AcousticTrainerConfig(micro_batch_size=2, lr=1e-3),
        preempt=guard,
    )
    state = trainer.init_state(batches[0])
    trainer.best_val = 0.123  # as if an earlier epoch had validated
    trainer.save_emergency(str(tmp_path / "e.ckpt"), state, epoch=5)

    trainer2 = AcousticTrainer(
        _tiny_model(), AcousticTrainerConfig(micro_batch_size=2, lr=1e-3)
    )
    state_r, start_epoch = trainer2.resume_from_checkpoint(
        str(tmp_path / "e.ckpt"), trainer2.init_state(batches[0])
    )
    assert start_epoch == 5  # epoch-1=4 recorded -> epoch 5 repeats
    assert trainer2.best_val == pytest.approx(0.123)


def test_vocoder_cli_preempt_saves_and_resumes(tmp_path):
    """A tripped guard stops the vocoder epoch loop after the in-flight step
    with a g_/do_ save; the scan-resume continues from it."""
    import types

    from test_data import _write_wav

    from mri2speech_tpu.config import AttrDict, default_vocoder_config
    from mri2speech_tpu.data.filelists import create_filelists

    root = tmp_path
    wavs = root / "wavs"
    wavs.mkdir()
    for i in range(4):
        _write_wav(wavs / f"utt{i:03d}.wav", 1.0, freq=200 + 25 * i)
    create_filelists(wavs, root / "lists", valid_ratio=0.25, seed=42)
    cfg = dict(default_vocoder_config(upsample_initial_channel=16, batch_size=2))
    (root / "config.json").write_text(json.dumps(cfg))
    h = AttrDict(cfg)

    def args(ckpt_dir):
        return types.SimpleNamespace(
            group_name=None, input_wavs_dir=str(wavs), input_mels_dir="unused",
            input_training_file=str(root / "lists" / "training.txt"),
            input_validation_file=str(root / "lists" / "validation.txt"),
            checkpoint_path=str(ckpt_dir), config=str(root / "config.json"),
            training_epochs=2, stdout_interval=100, checkpoint_interval=1000,
            summary_interval=1000, validation_interval=1000,
            fine_tuning=False, extra_mels_dir=None, extra_mels_weight=0.0,
            num_devices=1,
        )

    from mri2speech_tpu.cli.train_vocoder import run_training

    ckpt_dir = root / "cp"
    tripped = PreemptionGuard()
    tripped.trip()  # "signal" arrives during the first step
    run_training(args(ckpt_dir), h, preempt_guard=tripped)
    # exactly one step ran before the stop; its checkpoint pair exists
    assert (ckpt_dir / "g_00000000").exists()
    assert (ckpt_dir / "do_00000000").exists()

    # untripped rerun resumes from step 0 and completes both tiny epochs
    run_training(args(ckpt_dir), h, preempt_guard=PreemptionGuard())
    assert len(list(ckpt_dir.glob("g_*"))) >= 1


CLI_CORPUS = r"""
import sys
import numpy as np
root = sys.argv[1]
rng = np.random.default_rng(0)
from pathlib import Path
for stem in ("001_a", "002_b", "003_c"):
    d = Path(root) / "pairs_ref4_npy" / stem
    d.mkdir(parents=True, exist_ok=True)
    n = 6
    np.save(d / "mri.npy", rng.random((n, 4, 1, 32, 32)).astype(np.float32))
    np.save(d / "mel.npy", rng.standard_normal((n, 4, 64)).astype(np.float32))
    np.save(d / "mask.npy", np.ones((n, 4), dtype=np.float32))
print("corpus ok")
"""


def test_cli_sigterm_roundtrip(tmp_path):
    """Real process, real signal: m2s-train-acoustic gets SIGTERM mid-run,
    exits 0 with an emergency snapshot, and the rerun auto-resumes it."""
    corpus = tmp_path / "data"
    script = tmp_path / "mkcorpus.py"
    script.write_text(CLI_CORPUS)
    repo_root = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    # PYTHONPATH deliberately EXCLUDES the axon site dir: its bootstrap pins
    # jax_platforms to the tunneled TPU via jax.config, which outranks the
    # env var — without it, JAX_PLATFORMS=cpu genuinely selects the host CPU
    env["PYTHONPATH"] = repo_root
    subprocess.run([sys.executable, str(script), str(corpus)], check=True,
                   env=env, timeout=120)

    ckpt = tmp_path / "model.ckpt"
    args = [
        sys.executable, "-m", "mri2speech_tpu.cli.train_acoustic",
        "--processed_dir", str(corpus), "--out_ckpt", str(ckpt),
        "--epochs", "500", "--batch_size", "2", "--micro_batch_size", "1",
        "--val_batch_size", "2",
    ]
    proc = subprocess.Popen(args, env=env, cwd=repo_root,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    # wait for training to actually start (first epoch line), then SIGTERM
    deadline = time.time() + 900
    started = []
    for line in proc.stdout:
        started.append(line)
        if line.startswith("[TRAIN] Start training") or time.time() > deadline:
            break
    time.sleep(3)  # let at least one step dispatch
    proc.send_signal(signal.SIGTERM)
    out = proc.stdout.read()
    rc = proc.wait(timeout=900)
    full = "".join(started) + out
    assert rc == 0, full[-3000:]
    assert "[PREEMPT] Signal received" in full, full[-3000:]
    assert os.path.exists(str(ckpt) + ".preempt")

    # rerun with a tiny budget: must auto-resume from the snapshot
    r2 = subprocess.run(
        args[:args.index("500")] + ["2"] + args[args.index("500") + 1:]
        + ["--max_train_steps", "1", "--max_val_steps", "1"],
        env=env, cwd=repo_root, capture_output=True, text=True, timeout=900,
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-1000:]
    assert "[PREEMPT] Auto-resuming from emergency snapshot" in r2.stdout
    assert "[RESUME]" in r2.stdout
