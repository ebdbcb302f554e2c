"""Mel .npy -> wav synthesis with per-file artifacts + HTML results gallery.

Parity target `mel_to_audio_synthesis.py:47-333`: single file or directory of
mel .npy; dimension coercion (2D/3D, mel-bin pad/truncate to config); per-file
wav + input-mel PNG + stats JSON; self-contained HTML gallery with audio
players; overall stats JSON.
"""
from __future__ import annotations

import argparse
import html
import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from mri2speech_tpu.data.audio_io import write_wav_float
from mri2speech_tpu.infer.mel_inference import synthesize_mel_file
from mri2speech_tpu.infer.vocoder_io import load_generator


def coerce_mel(mel: np.ndarray, num_mels: int) -> np.ndarray:
    """Shape guard: -> (num_mels, T); pad/truncate the mel-bin axis to config."""
    if mel.ndim == 2:
        pass
    elif mel.ndim == 3:
        if mel.shape[0] != 1:
            print(f"Warning: Batch size is {mel.shape[0]}, using first sample")
        mel = mel[0]
    else:
        raise ValueError(f"Invalid mel spectrogram dimensions: {mel.shape}")
    if mel.shape[0] != num_mels:
        print(f"Warning: Mel bins mismatch. Expected: {num_mels}, Got: {mel.shape[0]}")
        if mel.shape[0] > num_mels:
            mel = mel[:num_mels]
        else:
            mel = np.pad(mel, ((0, num_mels - mel.shape[0]), (0, 0)))
    return mel.astype(np.float32)


def process_mel_file(
    mel_path: str, h: dict, fn, output_dir: str
) -> Tuple[bool, Optional[str], Optional[Dict]]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    basename = os.path.splitext(os.path.basename(mel_path))[0]
    if basename.endswith("_mel"):
        basename = basename[:-4]
    try:
        mel = coerce_mel(np.load(mel_path), h["num_mels"])
        audio = synthesize_mel_file(fn, mel, h["hop_size"])
        out_wav = os.path.join(output_dir, f"{basename}_from_mel.wav")
        write_wav_float(out_wav, audio, h["sampling_rate"])

        plt.figure(figsize=(12, 4))
        plt.imshow(mel, aspect="auto", origin="lower")
        plt.colorbar()
        plt.title(f"Input Mel Spectrogram - {basename}")
        plt.xlabel("Time")
        plt.ylabel("Mel Bins")
        plt.tight_layout()
        plt.savefig(os.path.join(output_dir, f"{basename}_input_mel.png"), dpi=150)
        plt.close()

        stats = {
            "input_file": mel_path,
            "mel_shape": list(mel.shape),
            "mel_range": [float(mel.min()), float(mel.max())],
            "audio_shape": list(audio.shape),
            "audio_range": [float(audio.min()), float(audio.max())],
            "duration_seconds": len(audio) / h["sampling_rate"],
            "sampling_rate": h["sampling_rate"],
        }
        with open(os.path.join(output_dir, f"{basename}_synthesis_stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
        return True, basename, stats
    except Exception as e:  # per-file resilience, like the reference
        print(f"Error processing {mel_path}: {e}")
        import traceback

        traceback.print_exc()
        return False, None, None


_PAGE_STYLE = """
body { font-family: Arial, sans-serif; margin: 20px; }
h1, h2 { color: #333; }
.file-section { border: 1px solid #ddd; margin: 20px 0; padding: 15px; border-radius: 5px; }
.audio-container { display: flex; gap: 10px; align-items: center; margin: 10px 0; }
.audio-label { min-width: 150px; font-weight: bold; }
audio { width: 100%; }
img { max-width: 100%; height: auto; margin-top: 10px; }
.info { background-color: #e8f5e8; padding: 15px; margin: 10px 0; border-radius: 5px;
        border-left: 4px solid #4CAF50; }
.stats { background-color: #f0f0f0; padding: 10px; margin: 10px 0; border-radius: 5px;
         font-family: monospace; font-size: 12px; }
"""


def build_html_report(processed: List[Tuple[str, Dict]], h: dict) -> str:
    """Self-contained gallery page (`mel_to_audio_synthesis.py:229-308`)."""
    sections = []
    for i, (name, stats) in enumerate(processed):
        name_e = html.escape(name)
        sections.append(
            f"""
  <div class="file-section">
    <h2>File {i + 1}: {name_e}</h2>
    <div class="stats">
      Input mel shape: {stats['mel_shape']}<br>
      Mel range: {stats['mel_range'][0]:.3f} to {stats['mel_range'][1]:.3f}<br>
      Generated audio duration: {stats['duration_seconds']:.2f} seconds<br>
      Audio range: {stats['audio_range'][0]:.3f} to {stats['audio_range'][1]:.3f}
    </div>
    <div class="audio-container">
      <div class="audio-label">Generated Audio:</div>
      <audio controls><source src="{name_e}_from_mel.wav" type="audio/wav"></audio>
    </div>
    <img src="{name_e}_input_mel.png" alt="Input Mel Spectrogram - {name_e}">
  </div>"""
        )
    return f"""<!DOCTYPE html>
<html>
<head>
  <title>HiFi-GAN Mel-to-Audio Synthesis</title>
  <style>{_PAGE_STYLE}</style>
</head>
<body>
  <h1>HiFi-GAN Mel-to-Audio Synthesis</h1>
  <div class="info">
    <strong>Mel Spectrogram to Audio Synthesis</strong>
    <br>&bull; Direct synthesis from .npy mel spectrograms
    <br>&bull; Processed {len(processed)} files successfully
    <br>&bull; Model config: {h['num_mels']} mels, {h['sampling_rate']}Hz sampling rate
  </div>
{''.join(sections)}
</body>
</html>
"""


def run_synthesis(args: argparse.Namespace) -> None:
    with open(args.config, "r", encoding="utf-8") as f:
        h = json.load(f)
    os.makedirs(args.output_dir, exist_ok=True)

    if os.path.isfile(args.input) and args.input.endswith(".npy"):
        mel_files = [args.input]
    elif os.path.isdir(args.input):
        mel_files = sorted(
            os.path.join(args.input, f)
            for f in os.listdir(args.input)
            if f.lower().endswith(".npy")
        )
        if not mel_files:
            print(f"No .npy files found in {args.input}")
            return
        if len(mel_files) > args.max_files:
            print(f"Found {len(mel_files)} files, processing {args.max_files} files")
            mel_files = mel_files[: args.max_files]
    else:
        print(f"Invalid input: {args.input} (must be .npy file or directory)")
        return

    generator, params = load_generator(args.config, args.checkpoint_file)
    import jax as _jax
    params = _jax.device_put(params)
    _fn = jax.jit(lambda p, x: generator.apply({"params": p}, x))
    fn = lambda x: _fn(params, x)  # noqa: E731

    processed: List[Tuple[str, Dict]] = []
    for mel_file in mel_files:
        ok, basename, stats = process_mel_file(mel_file, h, fn, args.output_dir)
        if ok:
            processed.append((basename, stats))

    print(f"\n=== Processing Complete ===")
    print(f"Successfully processed: {len(processed)}/{len(mel_files)} files")

    with open(os.path.join(args.output_dir, "mel_synthesis_results.html"), "w", encoding="utf-8") as f:
        f.write(build_html_report(processed, h))

    overall = {
        "total_files": len(mel_files),
        "successful_syntheses": len(processed),
        "model_config": {k: h[k] for k in ("num_mels", "sampling_rate", "n_fft", "hop_size", "win_size")},
        "individual_stats": [s for _, s in processed],
    }
    with open(os.path.join(args.output_dir, "overall_synthesis_stats.json"), "w") as f:
        json.dump(overall, f, indent=2)
    print(f"Results saved to: {args.output_dir}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="Input .npy mel file or directory")
    parser.add_argument("--checkpoint_file", required=True)
    parser.add_argument("--config", default="config_custom.json")
    parser.add_argument("--output_dir", default="mel_synthesis_result")
    parser.add_argument("--max_files", default=20, type=int)
    run_synthesis(parser.parse_args())


if __name__ == "__main__":
    main()
