"""Training-step throughput benchmark on the attached chip.

Measures both trainers at the reference's recipe shapes:
* acoustic: batch 8 (micro-batch 2), ref_frames=4, 256x256 frames ->
  optimizer steps/sec and mel frames/sec (B*T per step)
* vocoder GAN: batch 16, segment 8400 -> D+G steps/sec and audio-seconds/sec

Dispatch latency is amortised with K loop-carried steps inside one executable
(see bench.py). Results print as JSON lines; record per-round numbers in
docs/BENCH_NOTES.md.
"""
from __future__ import annotations

import json
import time

import numpy as np

import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.train.acoustic import (
    AcousticTrainer,
    AcousticTrainerConfig,
    _reshape_micro,
)
from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig

V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_HBM_BPS = 819e9


def _cost_fields(lowered, step_s: float) -> dict:
    """FLOPs/bandwidth accounting from XLA cost_analysis (see bench.py)."""
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        byts = float(ca.get("bytes accessed", float("nan")))
    except Exception:
        return {}
    out = {
        "gflops_per_step": flops / 1e9,
        "achieved_tflops": flops / step_s / 1e12,
        "hbm_gb_per_s": byts / step_s / 1e9,
    }
    if jax.default_backend() == "tpu":
        out["mfu_pct"] = 100.0 * flops / step_s / V5E_PEAK_FLOPS_BF16
        out["hbm_pct"] = 100.0 * byts / step_s / V5E_PEAK_HBM_BPS
    return out


def bench_acoustic(use_bf16: bool, repeats: int = 5) -> dict:
    B, T, HW = 8, 4, 256
    rng = np.random.default_rng(0)
    batch = {
        "mri": rng.random((B, T, 1, HW, HW)).astype(np.float32),
        "mel": rng.standard_normal((B, T, 64)).astype(np.float32),
        "mask": np.ones((B, T), dtype=np.float32),
    }
    model = AcousticModel(
        use_checkpoint=True, dtype=jnp.bfloat16 if use_bf16 else None
    )
    trainer = AcousticTrainer(model, AcousticTrainerConfig(micro_batch_size=2))
    state = trainer.init_state(batch)
    micro = {k: jnp.asarray(v) for k, v in _reshape_micro(batch, 2).items()}
    micro = jax.device_put(micro)

    lr = jnp.float32(1e-4)
    state, _ = trainer._train_step(state, micro, lr, jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        state, metrics = trainer._train_step(state, micro, lr, jax.random.PRNGKey(i))
        jax.block_until_ready(state.params)
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times))
    out = {
        "metric": "acoustic_train_step_seconds",
        "value": step_s,
        "unit": "s/step",
        "batch": B,
        "micro_batch": 2,
        "mel_frames_per_sec_train": B * T / step_s,
        "dtype": "bf16" if use_bf16 else "f32",
    }
    out.update(
        _cost_fields(
            trainer._train_step.lower(state, micro, lr, jax.random.PRNGKey(0)),
            step_s,
        )
    )
    return out


def bench_vocoder(repeats: int = 3, bf16: bool = False) -> dict:
    h = default_vocoder_config()
    trainer = VocoderTrainer(h, VocoderTrainerConfig(fine_tuning=False, bf16=bf16))
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = h["batch_size"]
    audio = (rng.standard_normal((B, h["segment_size"])).astype(np.float32) * 0.1).clip(-1, 1)
    batch = {"audio": audio, "mel": None}
    state, _ = trainer.train_step(state, batch)
    jax.block_until_ready(state.gen_params)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, batch)
        jax.block_until_ready(state.gen_params)
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times))
    out = {
        "metric": "vocoder_gan_step_seconds",
        "value": step_s,
        "unit": "s/step",
        "batch": B,
        "dtype": "bf16" if bf16 else "f32",
        "audio_seconds_per_sec_train": B * h["segment_size"] / h["sampling_rate"] / step_s,
    }
    out.update(
        _cost_fields(
            trainer._train_step.lower(
                state, jnp.asarray(audio), None,
                jnp.float32(trainer.sched_g.lr), jnp.float32(trainer.sched_d.lr),
                fine_tuning=False,
            ),
            step_s,
        )
    )
    return out


def main() -> None:
    backend = jax.default_backend()
    a = bench_acoustic(use_bf16=(backend == "tpu"))
    a["backend"] = backend
    print(json.dumps(a))
    v = bench_vocoder()
    v["backend"] = backend
    print(json.dumps(v))
    if backend == "tpu":
        vb = bench_vocoder(bf16=True)
        vb["backend"] = backend
        print(json.dumps(vb))


if __name__ == "__main__":
    main()
