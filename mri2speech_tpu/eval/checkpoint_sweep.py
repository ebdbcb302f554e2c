"""Vocoder checkpoint-sweep evaluation: one utterance set x N checkpoints.

Automates the reference's manual QA step — "同じ ID を複数の checkpoint で推論し、
聴感評価を実施" (infer the same utterances at several vocoder checkpoints and
compare by listening, `docs/rtmri_pipeline_notes.md:117-131`, also
`docs/thesis_model_settings.md:86-87`) — which the reference performs by
re-running `scripts/run_mri_video_inference.py` once per checkpoint into
per-checkpoint output dirs.

TPU-native design: the generator module and its jitted program are built ONCE;
each checkpoint is just a new params pytree passed as a jit ARGUMENT, so the
whole sweep pays zero recompiles (N checkpoints x M utterances share one
compiled executable per frame-bucket shape). On the reference's path every
checkpoint reloads and re-traces the torch module.

Alongside the per-checkpoint audio the sweep computes the objective twin of
the listening test: `mel_error` = L1 between the input mel and the mel
re-analysed from the generated audio with `fmax_for_loss` semantics — exactly
the validation metric the vocoder trainer tracks (`train.py:215-216`,
`meldataset.py:220-224`), so sweep numbers are directly comparable to the
training curve. With `--gt-wav-dir`, per-utterance ground-truth audio joins
the gallery and a `gt_mel_l1` column is added.

Outputs: `<out>/<ckpt>/<utt>_from_mel.wav` (per-checkpoint dirs, mirroring the
reference's `output/<run>/g_00065000/` layout), `sweep_results.json`, and a
self-contained `checkpoint_sweep.html` gallery with one audio player per
(utterance, checkpoint) cell plus the summary table.
"""
from __future__ import annotations

import argparse
import glob
import html
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import AttrDict
from mri2speech_tpu.data.audio_io import MAX_WAV_VALUE, load_wav, write_wav
from mri2speech_tpu.infer.mel_inference import synthesize_mel_file
from mri2speech_tpu.models.layers import fold_weight_norm
from mri2speech_tpu.models.vocoder import Generator
from mri2speech_tpu.ops.mel import mel_spectrogram
from mri2speech_tpu.train import checkpoint as ckpt_io


def discover_checkpoints(cp_dir: str, prefix: str = "g_") -> List[str]:
    """All `g_????????` checkpoints in `cp_dir`, training order.

    The reference's `scan_checkpoint` (`utils.py:52-57`) globs the same
    pattern and keeps only the lexicographic max (latest); a sweep wants every
    step, in step order — the zero-padded 8-digit step makes lexicographic
    sort == numeric sort.
    """
    pattern = os.path.join(cp_dir, prefix + "????????")
    return sorted(p for p in glob.glob(pattern) if os.path.isfile(p))


def _load_mels(input_dir: str, num_mels: int) -> Dict[str, np.ndarray]:
    """stem -> (num_mels, T) log-power mel, from every .npy in `input_dir`."""
    from mri2speech_tpu.infer.synthesis_report import coerce_mel

    mels: Dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(input_dir)):
        if not fname.lower().endswith(".npy"):
            continue
        stem = os.path.splitext(fname)[0]
        if stem.endswith("_mel"):
            stem = stem[:-4]
        mels[stem] = coerce_mel(np.load(os.path.join(input_dir, fname)), num_mels)
    if not mels:
        raise FileNotFoundError(f"no .npy mel files in {input_dir}")
    return mels


class _MelAnalyser:
    """Jitted loss-domain mel of generated audio (fmax_for_loss semantics)."""

    def __init__(self, h: AttrDict):
        self.h = h

        def _mel(y):
            return mel_spectrogram(
                y, h["n_fft"], h["num_mels"], h["sampling_rate"], h["hop_size"],
                h["win_size"], h["fmin"], h.get("fmax_for_loss"),
            )

        self._fn = jax.jit(_mel)

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(audio[None, :])))[0]


def run_sweep(
    input_mels_dir: str,
    output_dir: str,
    checkpoints: List[str],
    config_path: str,
    gt_wav_dir: Optional[str] = None,
) -> Dict:
    """Synthesize every utterance at every checkpoint; return the results dict."""
    with open(config_path, "r", encoding="utf-8") as f:
        h = AttrDict(json.load(f))
    mels = _load_mels(input_mels_dir, h["num_mels"])
    os.makedirs(output_dir, exist_ok=True)

    # module + program built once; checkpoints only swap the params argument
    gen = Generator(h=dict(h), use_weight_norm=False)
    _fn = jax.jit(lambda p, x: gen.apply({"params": p}, x))
    analyse = _MelAnalyser(h)

    gt_mels: Dict[str, np.ndarray] = {}
    if gt_wav_dir:
        import shutil

        gt_out = os.path.join(output_dir, "gt")
        os.makedirs(gt_out, exist_ok=True)
        for stem in mels:
            wav_path = os.path.join(gt_wav_dir, stem + ".wav")
            if os.path.exists(wav_path):
                audio, sr = load_wav(wav_path)
                if sr != h["sampling_rate"]:
                    raise ValueError(
                        f"{wav_path}: sr {sr} != config {h['sampling_rate']}"
                    )
                if np.issubdtype(audio.dtype, np.integer):
                    audio = audio / MAX_WAV_VALUE  # int16 PCM -> [-1, 1]
                gt_mels[stem] = analyse(audio.astype(np.float32))
                # copied next to the gallery so the HTML is self-contained
                shutil.copyfile(wav_path, os.path.join(gt_out, stem + ".wav"))

    results: Dict = {
        "config": config_path,
        "input_mels_dir": input_mels_dir,
        "checkpoints": {},
    }
    for cp_path in checkpoints:
        t_cp = time.time()
        cp_name = os.path.basename(cp_path)
        obj = ckpt_io.load_checkpoint_raw(cp_path)
        if "generator" not in obj:
            raise KeyError(f"{cp_path}: missing 'generator' state")
        params = jax.device_put(fold_weight_norm(obj["generator"]))
        fn = lambda x: _fn(params, x)  # noqa: E731 — params stay a jit argument
        cp_out = os.path.join(output_dir, cp_name)
        os.makedirs(cp_out, exist_ok=True)

        per_utt: Dict[str, Dict] = {}
        for stem, mel in mels.items():
            audio = synthesize_mel_file(fn, mel, h["hop_size"])
            write_wav(
                os.path.join(cp_out, f"{stem}_from_mel.wav"),
                h["sampling_rate"],
                (np.clip(audio, -1.0, 1.0) * MAX_WAV_VALUE).astype(np.int16),
            )
            gen_mel = analyse(audio)
            T = min(gen_mel.shape[-1], mel.shape[-1])
            entry = {
                "mel_error": float(np.mean(np.abs(gen_mel[:, :T] - mel[:, :T]))),
                "duration_seconds": len(audio) / h["sampling_rate"],
            }
            if stem in gt_mels:
                gt = gt_mels[stem]
                Tg = min(gen_mel.shape[-1], gt.shape[-1])
                entry["gt_mel_l1"] = float(
                    np.mean(np.abs(gen_mel[:, :Tg] - gt[:, :Tg]))
                )
            per_utt[stem] = entry

        mean_err = float(np.mean([e["mel_error"] for e in per_utt.values()]))
        # wall time per checkpoint: the jitted program is compiled ONCE for
        # the sweep (params are a jit ARGUMENT, swapped per checkpoint), so
        # the first checkpoint includes every compile and later ones pay
        # only load+inference — the gap is the params-swap win
        cp_summary: Dict = {
            "mean_mel_error": mean_err,
            "seconds": round(time.time() - t_cp, 2),
            "utterances": per_utt,
        }
        gt_errs = [e["gt_mel_l1"] for e in per_utt.values() if "gt_mel_l1" in e]
        if gt_errs:
            cp_summary["mean_gt_mel_l1"] = float(np.mean(gt_errs))
        results["checkpoints"][cp_name] = cp_summary
        print(f"[sweep] {cp_name}: mean mel_error {mean_err:.4f}"
              + (f", mean gt_mel_l1 {cp_summary['mean_gt_mel_l1']:.4f}" if gt_errs else ""))

    if results["checkpoints"]:
        results["best_checkpoint"] = min(
            results["checkpoints"],
            key=lambda k: results["checkpoints"][k]["mean_mel_error"],
        )
    with open(os.path.join(output_dir, "sweep_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    with open(
        os.path.join(output_dir, "checkpoint_sweep.html"), "w", encoding="utf-8"
    ) as f:
        f.write(build_sweep_html(results, sorted(mels), h, gt_wav_dir=gt_wav_dir,
                                 gt_stems=set(gt_mels)))
    return results


_SWEEP_STYLE = """
body { font-family: Arial, sans-serif; margin: 20px; }
h1, h2 { color: #333; }
table { border-collapse: collapse; margin: 10px 0; }
th, td { border: 1px solid #ccc; padding: 6px 10px; text-align: left; }
th { background: #f0f0f0; }
tr.best { background: #e8f5e8; }
.utt-section { border: 1px solid #ddd; margin: 20px 0; padding: 15px; border-radius: 5px; }
.audio-row { display: flex; gap: 10px; align-items: center; margin: 6px 0; }
.audio-label { min-width: 160px; font-weight: bold; font-family: monospace; }
.metric { min-width: 140px; font-family: monospace; font-size: 12px; color: #555; }
audio { width: 100%; max-width: 480px; }
.info { background: #e8f5e8; padding: 12px; margin: 10px 0; border-radius: 5px;
        border-left: 4px solid #4CAF50; }
"""


def build_sweep_html(results: Dict, stems: List[str], h: dict, *,
                     gt_wav_dir: Optional[str] = None,
                     gt_stems: Optional[set] = None) -> str:
    """Self-contained comparison gallery: summary table + per-utterance rows."""
    cps = list(results["checkpoints"])
    best = results.get("best_checkpoint")
    has_gt = any("mean_gt_mel_l1" in results["checkpoints"][c] for c in cps)

    rows = []
    for cp in cps:
        s = results["checkpoints"][cp]
        cls = ' class="best"' if cp == best else ""
        gt_cell = (
            f"<td>{s['mean_gt_mel_l1']:.4f}</td>" if "mean_gt_mel_l1" in s
            else ("<td>—</td>" if has_gt else "")
        )
        rows.append(
            f"<tr{cls}><td>{html.escape(cp)}</td>"
            f"<td>{s['mean_mel_error']:.4f}</td>{gt_cell}</tr>"
        )
    gt_head = "<th>mean GT mel L1</th>" if has_gt else ""
    summary = (
        f"<table><tr><th>checkpoint</th><th>mean mel L1 (re-analysis)</th>"
        f"{gt_head}</tr>{''.join(rows)}</table>"
    )

    sections = []
    for stem in stems:
        stem_e = html.escape(stem)
        players = []
        if gt_wav_dir and gt_stems and stem in gt_stems:
            # GT wavs are copied into <out>/gt/ so the page is self-contained
            players.append(
                f'<div class="audio-row"><div class="audio-label">ground truth'
                f'</div><div class="metric"></div>'
                f'<audio controls><source src="{html.escape(f"gt/{stem}.wav")}"'
                f' type="audio/wav"></audio></div>'
            )
        for cp in cps:
            e = results["checkpoints"][cp]["utterances"].get(stem)
            if e is None:
                continue
            metric = f"mel L1 {e['mel_error']:.4f}"
            if "gt_mel_l1" in e:
                metric += f" · GT {e['gt_mel_l1']:.4f}"
            src = html.escape(f"{cp}/{stem}_from_mel.wav")
            players.append(
                f'<div class="audio-row"><div class="audio-label">'
                f"{html.escape(cp)}</div><div class=\"metric\">{metric}</div>"
                f'<audio controls><source src="{src}" type="audio/wav"></audio></div>'
            )
        sections.append(
            f'<div class="utt-section"><h2>{stem_e}</h2>{"".join(players)}</div>'
        )

    return f"""<!DOCTYPE html>
<html>
<head>
  <title>Vocoder Checkpoint Sweep</title>
  <style>{_SWEEP_STYLE}</style>
</head>
<body>
  <h1>Vocoder Checkpoint Sweep</h1>
  <div class="info">
    {len(cps)} checkpoints x {len(stems)} utterances ·
    {h['num_mels']} mels, {h['sampling_rate']} Hz ·
    best by re-analysis mel L1: <strong>{html.escape(best or '—')}</strong>
    <br>mel L1 is the trainer's validation metric (fmax_for_loss semantics) —
    lower is better; listen to confirm.
  </div>
  {summary}
{''.join(sections)}
</body>
</html>
"""


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Synthesize a fixed utterance set at every vocoder "
        "checkpoint and emit a comparison gallery + metrics."
    )
    parser.add_argument("--input_mels_dir", required=True,
                        help="dir of log-power mel .npy (export_mels output)")
    parser.add_argument("--checkpoint_dir", required=True,
                        help="dir scanned for g_???????? checkpoints")
    parser.add_argument("--checkpoints", nargs="*", default=None,
                        help="explicit checkpoint basenames (default: all)")
    parser.add_argument("--config", default=None,
                        help="default: config.json next to the checkpoints")
    parser.add_argument("--output_dir", default="checkpoint_sweep")
    parser.add_argument("--gt_wav_dir", default=None,
                        help="optional dir of <stem>.wav ground-truth audio")
    a = parser.parse_args()

    config = a.config or os.path.join(a.checkpoint_dir, "config.json")
    if a.checkpoints:
        cps = [os.path.join(a.checkpoint_dir, c) for c in a.checkpoints]
        missing = [c for c in cps if not os.path.isfile(c)]
        if missing:
            raise FileNotFoundError(f"checkpoints not found: {missing}")
    else:
        cps = discover_checkpoints(a.checkpoint_dir)
        if not cps:
            raise FileNotFoundError(
                f"no g_???????? checkpoints in {a.checkpoint_dir}"
            )
    results = run_sweep(a.input_mels_dir, a.output_dir, cps, config,
                        gt_wav_dir=a.gt_wav_dir)
    print(f"[sweep] best: {results.get('best_checkpoint')} -> "
          f"{os.path.join(a.output_dir, 'checkpoint_sweep.html')}")


if __name__ == "__main__":
    main()
