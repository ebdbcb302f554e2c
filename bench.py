"""End-to-end benchmark: rtMRI video -> waveform RTF on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The headline metric is the BASELINE.md north star — video->wav real-time factor
(compute seconds per second of audio) for the fused acoustic+vocoder pipeline.
Target: RTF <= 0.05 on a single v5e chip; `vs_baseline` = 0.05 / measured_rtf
(>1 means better than target).

Uses randomly initialised weights (no trained checkpoints are shipped); RTF is
weight-independent. Also reports acoustic-model mel throughput (frames/sec) as
a secondary field.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.infer.pipeline import VideoToSpeechPipeline
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator
from mri2speech_tpu.ops.scaler import MelScaler

SR = 11413
HOP = 420
T_FRAMES = 512          # ~18.8 s of audio at 27.17 fps
REPEATS = 5


def build_pipeline(dtype=None) -> VideoToSpeechPipeline:
    rng = jax.random.PRNGKey(0)
    acoustic = AcousticModel(dtype=dtype)
    # jit the inits: one compiled program instead of hundreds of eager ops
    # (matters a lot when the chip is reached through a high-latency tunnel)
    variables = jax.jit(
        lambda r: acoustic.init(r, jnp.zeros((1, 2, 1, 256, 256)), train=False)
    )(rng)

    h = dict(default_vocoder_config())
    gen_wn = Generator(h=h)
    gen_params = jax.jit(
        lambda r: gen_wn.init(r, jnp.zeros((1, 64, 4)))["params"]
    )(jax.random.PRNGKey(1))
    gen = Generator(h=h, use_weight_norm=False, dtype=dtype)
    folded = fold_weight_norm(jax.device_get(gen_params))

    scaler = MelScaler(
        mean=np.zeros(64, dtype=np.float32), std=np.ones(64, dtype=np.float32)
    )
    return VideoToSpeechPipeline(
        acoustic, variables, gen, folded, scaler, frame_bucket=T_FRAMES
    )


def main() -> None:
    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else None
    pipeline = build_pipeline(dtype=dtype)

    frames = np.random.default_rng(0).random((T_FRAMES, 256, 256)).astype(np.float32)
    # warmup / compile
    audio, _, _ = pipeline(frames)
    seconds_audio = len(audio) / SR

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        pipeline(frames)  # __call__ blocks on host transfer of the waveform
        times.append(time.perf_counter() - t0)
    rtf = float(np.median(times) / seconds_audio)

    mel_fps = T_FRAMES / float(np.median(times))  # end-to-end mel frames/sec

    print(
        json.dumps(
            {
                "metric": "video2wav_rtf",
                "value": rtf,
                "unit": "rtf",
                "vs_baseline": 0.05 / rtf if rtf > 0 else float("inf"),
                "backend": backend,
                "dtype": "bf16" if dtype is not None else "f32",
                "frames": T_FRAMES,
                "seconds_audio": seconds_audio,
                "median_step_seconds": float(np.median(times)),
                "mel_frames_per_sec": mel_fps,
            }
        )
    )


if __name__ == "__main__":
    main()
