"""Interpretability sweep benchmark (the last BASELINE.md config).

Runs, on the active backend (the real TPU under axon), over a synthetic
utterance at production shapes (full EffNetV2-B2 acoustic model, 256x256
frames):

1. Grad-CAM over the two default formant bands (F1 300-900 Hz, F2 900-2500 Hz,
   `mri_gradcam_formant.py:89`): jitted sequence-level CAM + 4 per-frame CAMs
   per band, timed per band.
2. Articulator masking: lip + tongue presets (`mask_rtmri_video.py:31-50`)
   applied to the frames, then full video->wav RE-INFERENCE per masked variant,
   timed, with the mel deviation vs the unmasked baseline reported (the
   scientific fault-injection measurement the reference's experiment performs
   by listening).

Prints ONE JSON line. Reference anchor: `scripts/mri_gradcam_formant.py`,
`scripts/mask_rtmri_video.py`; BASELINE.md "Grad-CAM + masking
interpretability sweep".
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

repo_root = str(Path(__file__).resolve().parents[1])
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

T_FRAMES = 128  # ~4.7 s utterance
SR = 11413


def main() -> None:
    import bench
    from mri2speech_tpu.interpret.gradcam import compute_gradcam, parse_band_arguments
    from mri2speech_tpu.interpret.masking import LIP_MASK, TONGUE_MASK, build_mask

    backend = jax.default_backend()
    from mri2speech_tpu.utils.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    dtype = jnp.bfloat16 if backend == "tpu" else None
    pipeline = bench.build_pipeline(
        dtype=dtype, lstm_impl="pallas" if backend == "tpu" else "scan"
    )
    # Grad-CAM differentiates through the BiLSTM: use the differentiable scan
    # path in fp32 (the Pallas LSTM kernel is a forward-only inference kernel),
    # sharing the same parameters
    from mri2speech_tpu.models.acoustic import AcousticModel

    gradcam_model = AcousticModel(lstm_impl="scan")

    rng = np.random.default_rng(0)
    frames = (rng.random((T_FRAMES, 256, 256)) * 255).astype(np.uint8)
    frames_f = frames.astype(np.float32) / 255.0
    seconds_audio = T_FRAMES * 420 / SR

    # ---- Grad-CAM, 2 bands (HTK mel mapping, like the reference) ----
    bands = parse_band_arguments(None, 64, SR, 0.0, 8000.0)
    mean = np.zeros(64, np.float32)
    std = np.ones(64, np.float32)
    cam_stats = {}
    for name, idx in bands.items():
        # warm (compile), then timed run: sequence CAM + 4 per-frame CAMs
        compute_gradcam(
            gradcam_model, pipeline.acoustic_variables, frames_f,
            mean, std, idx, frame_indices=[0, 32, 64, 96],
        )
        t0 = time.perf_counter()
        out = compute_gradcam(
            gradcam_model, pipeline.acoustic_variables, frames_f,
            mean, std, idx, frame_indices=[0, 32, 64, 96],
        )
        dt = time.perf_counter() - t0
        assert out.heatmaps.shape == (T_FRAMES, 256, 256)
        assert len(out.per_frame) == 4
        cam_stats[name] = {
            "bins": int(idx.size),
            "seconds": round(dt, 4),
            "frames_per_sec": round(T_FRAMES / dt, 1),
        }

    # ---- masking + re-inference (lip / tongue presets) ----
    audio_base = pipeline.infer_audio(frames)  # warm + baseline
    _, base_mel, _ = pipeline(frames)
    mask_stats = {}
    for preset in (LIP_MASK, TONGUE_MASK):
        # CLI defaults: --alpha 0.1 --blur-kernel 11 (interpret/masking.py)
        m = build_mask((256, 256), preset.scaled((256, 256)), 0.1, 11)
        masked = np.clip(frames.astype(np.float32) * m[None], 0, 255).astype(np.uint8)
        t0 = time.perf_counter()
        audio_masked = pipeline.infer_audio(masked)
        dt = time.perf_counter() - t0
        _, masked_mel, _ = pipeline(masked)
        mask_stats[preset.name] = {
            "reinfer_seconds": round(dt, 4),
            "reinfer_rtf": round(dt / seconds_audio, 5),
            "mel_db_mad_vs_unmasked": float(np.mean(np.abs(masked_mel - base_mel))),
            "audio_samples": int(audio_masked.shape[0]),
        }

    print(
        json.dumps(
            {
                "metric": "interpret_sweep",
                "backend": backend,
                "frames": T_FRAMES,
                "seconds_audio": round(seconds_audio, 3),
                "gradcam": cam_stats,
                "masking": mask_stats,
            }
        )
    )


if __name__ == "__main__":
    main()
