"""HiFi-GAN vocoder training CLI.

Parity target `train.py:265-309` (argument surface) and the epoch/step loop
(`train.py:131-262`): stdout/summary/checkpoint/validation intervals, TB
scalars + audio + spectrogram figures, per-epoch plateau scheduler on the last
validation mel error, fine-tuning GT/predicted mel mixing.

Fixes over the reference (documented):
* `--fine_tuning` is a real boolean flag (the reference's `type=bool` makes any
  non-empty string truthy, `train.py:282`)
* one host program drives the mesh — no `mp.spawn`, no per-rank scheduler drift
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax

from mri2speech_tpu.config import AttrDict, build_env
from mri2speech_tpu.data.meldata import MelDataset, get_dataset_filelist
from mri2speech_tpu.parallel.mesh import (  # noqa: F401 (resolve_mesh re-exported; it lived here through round 3)
    add_distributed_flags,
    host_is_primary,
    initialize_distributed_from_args,
    make_mesh,
    resolve_mesh,
)
from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig
from mri2speech_tpu.utils.plotting import plot_spectrogram

_audio_log_warned = False


class _NullWriter:
    """No-op TB writer for non-primary hosts (rank-0 gating, `train.py:114-126`)."""

    def __getattr__(self, name):
        return lambda *a, **k: None


def _safe_add_audio(sw, tag, audio, step, sr) -> None:
    """tensorboardX add_audio needs soundfile; degrade gracefully without it."""
    global _audio_log_warned
    try:
        sw.add_audio(tag, audio, step, sr)
    except ModuleNotFoundError as exc:
        if not _audio_log_warned:
            print(f"[TB] audio logging disabled ({exc}); scalars/figures still on")
            _audio_log_warned = True


def run_training(a: argparse.Namespace, h: AttrDict, preempt_guard=None) -> None:
    from mri2speech_tpu.train.preempt import PreemptionGuard

    # SIGTERM/SIGINT -> save g_/do_ at the current step and exit cleanly;
    # the scan-resume picks it up on the next run (no new restore path).
    # The reference loses up to checkpoint_interval=5000 steps on a
    # preemption (`train.py:199-211`). An injected guard (tests/
    # preemption-notice watchers) is used as-is and not uninstalled here.
    installed = None
    if preempt_guard is not None:
        guard = preempt_guard
    elif getattr(a, "no_preempt_guard", False):
        guard = None
    else:
        guard = installed = PreemptionGuard().install()
    try:
        _run_training(a, h, guard)
    finally:
        if installed is not None:
            installed.uninstall()


def _run_training(a: argparse.Namespace, h: AttrDict, guard) -> None:
    from tensorboardX import SummaryWriter

    mesh = resolve_mesh(getattr(a, "num_devices", 1))
    if mesh is not None:
        print(f"[MESH] data-parallel over {mesh.shape['data']} devices")
    trainer = VocoderTrainer(
        h,
        VocoderTrainerConfig(
            fine_tuning=a.fine_tuning,
            bf16=getattr(a, "bf16", False),
            bf16_opt_state=getattr(a, "bf16_opt_state", False),
            bf16_grads=getattr(a, "bf16_grads", False),
        ),
        mesh=mesh,
    )
    state = trainer.init_state(jax.random.PRNGKey(h.seed))

    os.makedirs(a.checkpoint_path, exist_ok=True)
    print("checkpoints directory :", a.checkpoint_path)
    state, steps, last_epoch = trainer.resume(a.checkpoint_path, state)
    if steps:
        print(f"[RESUME] restored checkpoint at step {steps - 1}, epoch {last_epoch}")

    training_filelist, validation_filelist = get_dataset_filelist(a)

    train_mel_dirs = train_mel_weights = None
    valid_mel_dirs = valid_mel_weights = None
    if a.fine_tuning:
        base_dir = a.input_mels_dir
        train_mel_dirs, train_mel_weights = [base_dir], [1.0]
        mix_prob = max(0.0, min(1.0, float(a.extra_mels_weight)))
        if a.extra_mels_dir and mix_prob > 0.0:
            train_mel_dirs = [base_dir, a.extra_mels_dir]
            train_mel_weights = [max(1.0 - mix_prob, 0.0), mix_prob]
        valid_mel_dirs, valid_mel_weights = [base_dir], [1.0]

    trainset = MelDataset(
        training_filelist, h.segment_size, h.n_fft, h.num_mels, h.hop_size,
        h.win_size, h.sampling_rate, h.fmin, h.fmax, shuffle=True,
        fmax_loss=h.fmax_for_loss, fine_tuning=a.fine_tuning,
        base_mels_path=a.input_mels_dir, mel_dirs=train_mel_dirs,
        mel_weights=train_mel_weights, seed=h.seed,
    )
    validset = MelDataset(
        validation_filelist, h.segment_size, h.n_fft, h.num_mels, h.hop_size,
        h.win_size, h.sampling_rate, h.fmin, h.fmax, split=False, shuffle=False,
        fmax_loss=h.fmax_for_loss, fine_tuning=a.fine_tuning,
        base_mels_path=a.input_mels_dir, mel_dirs=valid_mel_dirs,
        mel_weights=valid_mel_weights, seed=h.seed,
    )

    sw = (
        SummaryWriter(os.path.join(a.checkpoint_path, "logs"))
        if host_is_primary()
        else _NullWriter()
    )
    n = len(trainset)
    batches_per_epoch = max(1, n // h.batch_size)
    last_val_err = 0.0
    n_vals = 0           # validation passes completed
    n_vals_stepped = 0   # value of n_vals at the last scheduler step

    for epoch in range(max(0, last_epoch), a.training_epochs):
        start = time.time()
        print("Epoch: {}".format(epoch + 1))
        # keyed by (seed, epoch) like the reference's sampler.set_epoch
        # (train.py:136-137) and the acoustic BatchLoader: a resumed run
        # continues the shuffle sequence instead of replaying epoch 0's
        # data order at every restart
        perm = np.random.default_rng((h.seed, epoch)).permutation(n)

        for i in range(batches_per_epoch):
            start_b = time.time()
            idx = perm[i * h.batch_size : (i + 1) * h.batch_size]
            if len(idx) < h.batch_size:
                break
            batch = trainset.gather_batch(idx)
            state, metrics = trainer.train_step(state, batch)

            if steps % a.stdout_interval == 0:
                print(
                    "Steps : {:d}, Gen Loss Total : {:4.3f}, Mel-Spec. Error : {:4.3f}, s/b : {:4.3f}".format(
                        steps, float(metrics["loss_gen_all"]),
                        float(metrics["mel_error"]), time.time() - start_b,
                    )
                )
            if steps % a.checkpoint_interval == 0 and steps != 0:
                trainer.save(a.checkpoint_path, state, steps, epoch)
            if steps % a.summary_interval == 0:
                sw.add_scalar("training/gen_loss_total", float(metrics["loss_gen_all"]), steps)
                sw.add_scalar("training/disc_loss_total", float(metrics["loss_disc_all"]), steps)
                sw.add_scalar("training/mel_spec_error", float(metrics["mel_error"]), steps)

            if steps % a.validation_interval == 0:
                val_err_tot = 0.0
                count = 0
                for j in range(len(validset)):
                    item = validset[j]
                    err, y_hat = trainer.validation_mel_error(
                        state, item["audio"], item.get("mel")
                    )
                    val_err_tot += err
                    count += 1
                    if j <= 4:
                        if steps == 0:
                            _safe_add_audio(
                                sw, f"gt/y_{j}", item["audio"][None, :], steps, h.sampling_rate
                            )
                        _safe_add_audio(
                            sw, f"generated/y_hat_{j}", y_hat[None, :], steps, h.sampling_rate
                        )
                        mel_fig = np.asarray(
                            trainer._infer_mel(np.asarray(y_hat[None, :]))
                        )[0]
                        sw.add_figure(
                            f"generated/y_hat_spec_{j}", plot_spectrogram(mel_fig), steps
                        )
                if count:
                    last_val_err = val_err_tot / count
                    n_vals += 1
                    sw.add_scalar("validation/mel_spec_error", last_val_err, steps)
                    # stdout too (the reference logs this to TB only,
                    # train.py:215-216): headless runs and the training
                    # campaign harness read the trajectory from the log
                    print(
                        "Validation mel-spec error : {:4.3f} (step {:d})".format(
                            last_val_err, steps
                        )
                    )

            if guard is not None and guard.should_stop():
                trainer.save(a.checkpoint_path, state, steps, epoch)
                print(
                    f"[PREEMPT] Signal received: checkpoint saved at step "
                    f"{steps}; resume will continue from step {steps + 1}."
                )
                return
            steps += 1

        # Reference semantics (`train.py:258-259`): step the plateau
        # scheduler EVERY epoch on the last validation error. On corpora
        # where an epoch is only a few steps and validation refreshes less
        # often, patience then counts repeats of a stale measurement and the
        # LR collapses to ~0 within ~p*patience epochs (reproduced on the
        # round-5 training campaign: generator froze from step ~125, every
        # later checkpoint byte-identical). --plateau_on_fresh_val opts into
        # stepping only when a NEW validation measurement has arrived.
        if not getattr(a, "plateau_on_fresh_val", False) or n_vals > n_vals_stepped:
            trainer.sched_g.step(last_val_err)
            trainer.sched_d.step(last_val_err)
            n_vals_stepped = n_vals
        print("Time taken for epoch {} is {} sec\n".format(epoch + 1, int(time.time() - start)))


def main() -> None:
    print("Initializing Training Process..")
    parser = argparse.ArgumentParser()
    parser.add_argument("--group_name", default=None)
    parser.add_argument("--input_wavs_dir", default="LJSpeech-1.1/wavs")
    parser.add_argument("--input_mels_dir", default="ft_dataset")
    parser.add_argument("--input_training_file", default="LJSpeech-1.1/training.txt")
    parser.add_argument("--input_validation_file", default="LJSpeech-1.1/validation.txt")
    parser.add_argument("--checkpoint_path", default="cp_hifigan")
    parser.add_argument("--config", default="")
    parser.add_argument("--training_epochs", default=3100, type=int)
    parser.add_argument("--stdout_interval", default=5, type=int)
    parser.add_argument("--checkpoint_interval", default=5000, type=int)
    parser.add_argument("--summary_interval", default=100, type=int)
    parser.add_argument("--validation_interval", default=1000, type=int)
    parser.add_argument("--fine_tuning", action="store_true")
    parser.add_argument(
        "--no_preempt_guard", action="store_true",
        help="Disable SIGTERM/SIGINT-triggered checkpointing (on by "
             "default: a preemption notice saves g_/do_ at the current "
             "step; the scan-resume continues from it next run).",
    )
    parser.add_argument("--extra_mels_dir", default=None)
    parser.add_argument("--extra_mels_weight", default=0.0, type=float)
    parser.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 G/D forwards (fp32 params/losses/grads). Measured "
             "~7%% faster than fp32 on v5e — the GAN step is bound by the "
             "discriminator conv shapes, not MXU rate (docs/BENCH_NOTES.md).",
    )
    parser.add_argument(
        "--plateau_on_fresh_val", action="store_true",
        help="Step the plateau LR schedulers only when a new validation "
             "measurement exists (guards against LR collapse on tiny corpora "
             "where epochs are shorter than the validation interval; default "
             "keeps the reference's step-every-epoch semantics).",
    )
    parser.add_argument(
        "--bf16_grads", action="store_true",
        help="Quantize D/G gradients through bf16 before the optimizer "
             "(fp32 master params and AdaBelief moments throughout; see "
             "docs/BENCH_NOTES.md for whether it pays on this chip).",
    )
    parser.add_argument(
        "--bf16_opt_state", action="store_true",
        help="Store AdaBelief moments in bf16 (fp32 master params; see "
             "train/optim.py). Halves optimizer-state HBM footprint/traffic.",
    )
    parser.add_argument(
        "--num_devices", default=0, type=int,
        help="Data-parallel device count; 0 = all available (reference "
             "`train.py:300` uses device_count()), 1 = single device. Under "
             "the multi-host flags this counts GLOBAL devices.",
    )
    add_distributed_flags(parser)
    a = parser.parse_args()

    # BEFORE any jax.devices() touch: afterwards the device list is global
    initialize_distributed_from_args(a)

    with open(a.config) as f:
        h = AttrDict(json.loads(f.read()))
    build_env(a.config, "config.json", a.checkpoint_path)
    run_training(a, h)


if __name__ == "__main__":
    main()
