"""Mel-file inference: precomputed log-power mel .npy -> HiFi-GAN -> wav.

Parity target `inference_e2e.py:37-94`: per .npy in a directory, generator ->
`<stem>_generated_e2e.wav` (int16). Mels are padded to frame buckets so XLA
compiles O(1) programs across files.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mri2speech_tpu.data.audio_io import MAX_WAV_VALUE, write_wav
from mri2speech_tpu.infer.vocoder_io import load_generator

_FRAME_BUCKET = 64


def synthesize_mel_file(fn, mel: np.ndarray, hop: int) -> np.ndarray:
    """(num_mels, T) log-power mel -> (T*hop,) float audio via bucketed jit."""
    if mel.ndim == 3:
        mel = mel[0]
    T = mel.shape[-1]
    Tp = ((T + _FRAME_BUCKET - 1) // _FRAME_BUCKET) * _FRAME_BUCKET
    buf = np.full((1, mel.shape[0], Tp), np.log(1e-5), dtype=np.float32)
    buf[0, :, :T] = mel
    audio = np.asarray(fn(jnp.asarray(buf)))[0, 0]
    return audio[: T * hop]


def run_mel_inference(input_mels_dir: str, output_dir: str, checkpoint_file: str,
                      config_file: str | None = None) -> None:
    if config_file is None:
        config_file = os.path.join(os.path.split(checkpoint_file)[0], "config.json")
    generator, params = load_generator(config_file, checkpoint_file)
    h = generator.h
    params = jax.device_put(params)
    _fn = jax.jit(lambda p, x: generator.apply({"params": p}, x))
    fn = lambda x: _fn(params, x)  # noqa: E731 — params stay jit arguments
    os.makedirs(output_dir, exist_ok=True)

    for filename in sorted(os.listdir(input_mels_dir)):
        if not filename.lower().endswith(".npy"):
            continue
        mel = np.load(os.path.join(input_mels_dir, filename))
        audio = synthesize_mel_file(fn, mel, h["hop_size"])
        audio_i16 = (audio * MAX_WAV_VALUE).astype(np.int16)
        out = os.path.join(output_dir, os.path.splitext(filename)[0] + "_generated_e2e.wav")
        write_wav(out, h["sampling_rate"], audio_i16)
        print(out)


def main() -> None:
    print("Initializing Inference Process..")
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_mels_dir", default="test_mel_files")
    parser.add_argument("--output_dir", default="generated_files_from_mel")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--config_file", default=None)
    a = parser.parse_args()
    run_mel_inference(a.input_mels_dir, a.output_dir, a.checkpoint_file, a.config_file)


if __name__ == "__main__":
    main()
