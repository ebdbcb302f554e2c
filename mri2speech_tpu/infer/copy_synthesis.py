"""Copy-synthesis: wav -> on-the-fly mel -> HiFi-GAN -> wav.

Parity target `inference.py:37-95`: per wav in a directory, peak-normalised
audio -> vocoder-domain mel (fmax) -> generator -> `<stem>_generated.wav`
(int16). Config auto-located next to the checkpoint. Mel + generator run in one
jitted program over length buckets.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mri2speech_tpu.data.audio_io import MAX_WAV_VALUE, load_wav, write_wav
from mri2speech_tpu.infer.vocoder_io import load_generator
from mri2speech_tpu.ops.mel import mel_spectrogram

_SAMPLE_BUCKET = 1 << 15


def _make_fn(generator, params, h):
    params = jax.device_put(params)

    @jax.jit
    def fn(params_, audio):  # (1, L); params as an ARGUMENT (no HLO literals)
        x = mel_spectrogram(
            audio, h["n_fft"], h["num_mels"], h["sampling_rate"],
            h["hop_size"], h["win_size"], h["fmin"], h["fmax"],
        )
        return generator.apply({"params": params_}, x)

    return lambda audio: fn(params, audio)


def run_copy_synthesis(input_wavs_dir: str, output_dir: str, checkpoint_file: str,
                       config_file: str | None = None) -> None:
    if config_file is None:
        config_file = os.path.join(os.path.split(checkpoint_file)[0], "config.json")
    generator, params = load_generator(config_file, checkpoint_file)
    h = generator.h
    fn = _make_fn(generator, params, h)
    os.makedirs(output_dir, exist_ok=True)

    for filename in sorted(os.listdir(input_wavs_dir)):
        if not filename.lower().endswith(".wav"):
            continue
        data, sr = load_wav(os.path.join(input_wavs_dir, filename))
        wav = np.asarray(data, dtype=np.float32) / MAX_WAV_VALUE
        L = wav.shape[0]
        Lp = ((L + _SAMPLE_BUCKET - 1) // _SAMPLE_BUCKET) * _SAMPLE_BUCKET
        buf = np.zeros((1, Lp), dtype=np.float32)
        buf[0, :L] = wav
        frames = 1 + (Lp + 2 * int((h["n_fft"] - h["hop_size"]) / 2) - h["n_fft"]) // h["hop_size"]
        audio = np.asarray(fn(jnp.asarray(buf)))[0, 0]
        # true frames for L samples; one hop of audio per frame
        pad = int((h["n_fft"] - h["hop_size"]) / 2)
        t_true = 1 + (L + 2 * pad - h["n_fft"]) // h["hop_size"]
        audio = audio[: t_true * h["hop_size"]]
        audio_i16 = (audio * MAX_WAV_VALUE).astype(np.int16)
        out = os.path.join(output_dir, os.path.splitext(filename)[0] + "_generated.wav")
        write_wav(out, h["sampling_rate"], audio_i16)
        print(out)


def main() -> None:
    print("Initializing Inference Process..")
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_wavs_dir", default="test_files")
    parser.add_argument("--output_dir", default="generated_files")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--config_file", default=None)
    a = parser.parse_args()
    run_copy_synthesis(a.input_wavs_dir, a.output_dir, a.checkpoint_file, a.config_file)


if __name__ == "__main__":
    main()
