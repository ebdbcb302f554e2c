"""rtMRI -> mel preprocessing pipeline (4-pass), TPU-accelerated DSP.

On-disk contract identical to the reference (`preprocess_rtmri_data.py:273-409`):

    out_dir/samples/<stem>/{mri.npy, mel_db.npy, mask.npy}
    out_dir/pairs_ref{N}/<stem>.npz  {mri (P,N,1,H,W), mel (P,N,64), mask (P,N)}
    out_dir/scaler.json  {mean, std, count_frames}
    out_dir/meta.json    (all params + stems + stats)

Passes:
  1. global |audio| peak over the corpus (`:316-335`)
  2. per utterance: video frames (gray/255, 256x256) + pre-emphasised power-mel
     dB, truncated to min(videoT, floor(samples/hop)) (`:337-378`) — the mel is
     computed ON DEVICE through `ops.compute_mel_db`, with utterances padded to
     length buckets so XLA compiles a handful of programs instead of one per
     length
  3. streaming per-bin mean/std -> scaler.json (`:380-382`)
  4. per-bin z-scored mels + sliding ref_frames windows -> pairs npz (`:384-391`)
"""
from __future__ import annotations

import argparse
import functools
import json
import shutil
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from mri2speech_tpu.data import audio_io
from mri2speech_tpu.ops.mel import align_by_hop
from mri2speech_tpu.ops.scaler import StreamingMelStats

_LENGTH_BUCKET = 1 << 15  # 32768 samples (~2.9 s) — bounds compile variants


@functools.lru_cache(maxsize=4)
def _jitted_mel_db(sr, n_mels, n_fft, win_length, hop_length, fmin, fmax, preemph):
    import jax

    from mri2speech_tpu.ops.mel import compute_mel_db

    @jax.jit
    def f(y):
        # top_db=None: the floor is max-relative and the device sees PADDED
        # frames — a boundary pad frame can exceed the true-frame max and the
        # host-side re-floor can only RAISE values. Apply it host-side on the
        # trimmed frames instead (compute_mel_db_host).
        return compute_mel_db(
            y, sr, n_mels=n_mels, n_fft=n_fft, win_length=win_length,
            hop_length=hop_length, fmin=fmin, fmax=fmax, preemph=preemph,
            top_db=None,
        )

    return f


def compute_mel_db_host(
    y: np.ndarray,
    sr: int,
    *,
    n_mels: int = 64,
    n_fft: int = 2048,
    win_length: int = 2048,
    hop_length: int = 420,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    preemph: float = 0.97,
) -> np.ndarray:
    """(L,) float audio -> (T, n_mels) float32 dB mel, computed on device.

    Zero-pads to a length bucket (frames are center=False windows over real
    samples only, so padding cannot change the kept frames) — EXCEPT the
    top_db=80 floor, which depends on the global max: a boundary-straddling
    pad frame can exceed the true-frame max, so the device computes WITHOUT
    the floor and it is applied host-side on the unpadded frame set for
    exact librosa semantics.
    """
    if y.size < n_fft:
        return np.zeros((0, n_mels), dtype=np.float32)
    T_true = 1 + (y.size - n_fft) // hop_length
    padded_len = ((y.size + _LENGTH_BUCKET - 1) // _LENGTH_BUCKET) * _LENGTH_BUCKET
    y_p = np.zeros(padded_len, dtype=np.float32)
    y_p[: y.size] = y
    f = _jitted_mel_db(sr, n_mels, n_fft, win_length, hop_length, fmin, fmax, preemph)
    mel_db = np.asarray(f(y_p))[:T_true]
    # re-apply the per-array top_db floor on the true frames only
    mel_db = np.maximum(mel_db, mel_db.max() - 80.0)
    return mel_db.astype(np.float32)


def save_sample(out_dir: Path, stem: str, mri: np.ndarray, mel_db: np.ndarray) -> int:
    sample_dir = out_dir / "samples" / stem
    sample_dir.mkdir(parents=True, exist_ok=True)
    T = min(mri.shape[0], mel_db.shape[0])
    np.save(sample_dir / "mri.npy", mri[:T])
    np.save(sample_dir / "mel_db.npy", mel_db[:T])
    np.save(sample_dir / "mask.npy", np.ones((T,), dtype=np.float32))
    return T


def compute_corpus_stats(out_dir: Path, stems: Iterable[str]):
    """Pass 3: streaming per-bin mean/std over samples/*/mel_db.npy."""
    stats = StreamingMelStats(n_mels=0)  # lazily sized below
    initialized = False
    for stem in stems:
        mel_path = out_dir / "samples" / stem / "mel_db.npy"
        if not mel_path.exists():
            continue
        mel = np.load(mel_path)
        if mel.size == 0:
            continue
        if not initialized:
            stats = StreamingMelStats(mel.shape[1])
            initialized = True
        stats.update(mel)
    scaler = stats.finalize()
    scaler.save(out_dir / "scaler.json", count_frames=stats.count_frames)
    return scaler.mean, scaler.std


def build_pairs(
    out_dir: Path,
    stems: Iterable[str],
    ref_frames: int,
    *,
    add_channel_dim: bool = True,
) -> Tuple[Path, int]:
    """Pass 4: z-score + sliding windows -> pairs_ref{N}/<stem>.npz."""
    from mri2speech_tpu.ops.scaler import MelScaler

    scaler = MelScaler.load(out_dir / "scaler.json")
    mean = scaler.mean.reshape(1, -1)
    std = scaler.std.reshape(1, -1)

    pairs_dir = out_dir / f"pairs_ref{ref_frames}"
    if pairs_dir.exists():
        shutil.rmtree(pairs_dir)
    pairs_dir.mkdir(parents=True, exist_ok=True)

    total_pairs = 0
    for stem in stems:
        base = out_dir / "samples" / stem
        paths = [base / n for n in ("mri.npy", "mel_db.npy", "mask.npy")]
        if not all(p.exists() for p in paths):
            continue
        mri, mel, mask = (np.load(p) for p in paths)
        T = min(len(mri), len(mel))
        if T < ref_frames:
            continue
        mri, mel, mask = mri[:T], mel[:T], mask[:T]
        mel_std = ((mel - mean) / std).astype(np.float32)

        n_pairs = T - ref_frames + 1
        # windowed views, then materialised in the reference's layout
        win = np.lib.stride_tricks.sliding_window_view  # (zero-copy)
        mri_w = win(mri, ref_frames, axis=0)      # (P, H, W, N)
        mel_w = win(mel_std, ref_frames, axis=0)  # (P, 64, N)
        mask_w = win(mask, ref_frames, axis=0)    # (P, N)
        mri_pairs = np.ascontiguousarray(np.moveaxis(mri_w, -1, 1), dtype=np.float32)
        if add_channel_dim:
            mri_pairs = mri_pairs[:, :, None, :, :]
        mel_pairs = np.ascontiguousarray(np.moveaxis(mel_w, -1, 1), dtype=np.float32)
        mask_pairs = np.ascontiguousarray(mask_w, dtype=np.float32)

        np.savez_compressed(
            pairs_dir / f"{stem}.npz", mri=mri_pairs, mel=mel_pairs, mask=mask_pairs
        )
        total_pairs += int(n_pairs)
    return pairs_dir, total_pairs


def build_file_index(data_dir: Path, patterns: Iterable[str]) -> Dict[str, str]:
    files: Dict[str, str] = {}
    if not data_dir.exists():
        return files
    for ext in patterns:
        for path in data_dir.glob(f"**/*{ext}"):
            files[path.stem] = str(path)
    return files


def run_preprocess(args: argparse.Namespace) -> None:
    out_dir: Path = args.out_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    samples_dir = out_dir / "samples"
    if samples_dir.exists():
        shutil.rmtree(samples_dir)
    samples_dir.mkdir(parents=True, exist_ok=True)
    for old_pairs in out_dir.glob("pairs_ref*"):
        shutil.rmtree(old_pairs)
    for stale in ("scaler.json", "meta.json"):
        target = out_dir / stale
        if target.exists():
            target.unlink()

    videos = build_file_index(args.data_dir, args.video_exts)
    audio_root = args.audio_dir if args.audio_dir is not None else args.data_dir
    audios = build_file_index(audio_root, args.audio_exts)
    stems = sorted(set(videos) | set(audios))
    if not stems:
        raise RuntimeError("no video or audio files found in data_dir")
    audio_required = args.audio_dir is not None

    def read_audio(stem: str) -> Optional[np.ndarray]:
        sources = []
        if stem in audios:
            sources.append(lambda: audio_io.read_audio_from_wav(audios[stem], target_sr=args.sr))
        if not audio_required and stem in videos:
            sources.append(lambda: audio_io.read_audio_from_video(videos[stem], target_sr=args.sr))
        if not getattr(args, "prefer_wav", True):
            sources.reverse()  # --no_prefer_wav: video track first
        if sources:
            y, _ = sources[0]()
            return y
        if audio_required:
            print(f"  [WARN] audio file missing for {stem}; skipping")
        return None

    # decode+resample each utterance ONCE: Pass 1 caches the arrays Pass 2
    # consumes (popped as used). Decode+polyphase-resample is the most
    # expensive host work on this 1-core machine; the budget bounds memory
    # for very large corpora (~6h of 11.4 kHz float32 per GiB)
    audio_cache: dict = {}
    cache_budget = 2 << 30
    cache_bytes = 0

    print("Pass1: compute global audio peak")
    global_absmax = 0.0
    for stem in stems:
        y = read_audio(stem)
        if y is None or y.size == 0:
            continue
        global_absmax = max(global_absmax, float(np.max(np.abs(y))))
        if cache_bytes + y.nbytes <= cache_budget:
            audio_cache[stem] = y
            cache_bytes += y.nbytes
    if global_absmax <= 0:
        global_absmax = 1.0
    print(f"  global_absmax = {global_absmax:.6f}")

    print("Pass2: extract samples (MRI frames + mel)")
    saved_stems: List[str] = []
    for stem in stems:
        if stem not in videos:
            continue
        mri = audio_io.read_video_frames(videos[stem], resize_hw=(args.resize_h, args.resize_w))
        if mri.size == 0:
            continue
        y = audio_cache.pop(stem, None)
        if y is None:
            y = read_audio(stem)
        if y is None or y.size == 0:
            continue
        y = y / global_absmax
        mel_db = compute_mel_db_host(
            y, sr=args.sr, n_mels=args.n_mels, n_fft=args.n_fft,
            win_length=args.win_length, hop_length=args.hop_length,
            fmin=args.fmin, fmax=args.fmax, preemph=args.preemph,
        )
        T = align_by_hop(mri.shape[0], len(y), args.hop_length)
        if T <= 0:
            continue
        save_sample(out_dir, stem, mri[:T], mel_db[:T])
        saved_stems.append(stem)
    if not saved_stems:
        raise RuntimeError("no samples were generated; verify input alignment")

    print("Pass3: compute global mel statistics")
    mean, std = compute_corpus_stats(out_dir, saved_stems)
    print("  saved scaler.json")

    print(f"Pass4: build fixed {args.ref_frames}-frame pairs")
    pairs_dir, total_pairs = build_pairs(out_dir, saved_stems, ref_frames=args.ref_frames)
    print(f"  saved {total_pairs} pairs to {pairs_dir}")

    meta = {
        "sr": args.sr,
        "n_mels": args.n_mels,
        "n_fft": args.n_fft,
        "win_length": args.win_length,
        "hop_length": args.hop_length,
        "preemph": args.preemph,
        "resize_h": args.resize_h,
        "resize_w": args.resize_w,
        "ref_frames": args.ref_frames,
        "stems": saved_stems,
        "mean": mean.astype(np.float64).tolist(),
        "std": std.astype(np.float64).tolist(),
    }
    with open(out_dir / "meta.json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)
    print("Done.")


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="rtMRI -> mel preprocessing pipeline")
    parser.add_argument("--data_dir", required=True, type=Path)
    parser.add_argument("--out_dir", required=True, type=Path)
    parser.add_argument("--sr", type=int, default=11413)
    parser.add_argument("--n_mels", type=int, default=64)
    parser.add_argument("--n_fft", type=int, default=2048)
    parser.add_argument("--win_length", type=int, default=2048)
    parser.add_argument("--hop_length", type=int, default=420)
    parser.add_argument("--fmin", type=float, default=0.0)
    parser.add_argument("--fmax", type=float, default=None)
    parser.add_argument("--preemph", type=float, default=0.97)
    parser.add_argument("--resize_h", type=int, default=256)
    parser.add_argument("--resize_w", type=int, default=256)
    parser.add_argument("--ref_frames", type=int, default=4)
    parser.add_argument("--audio_dir", type=Path, default=None)
    parser.add_argument("--video_exts", nargs="+", default=[".mp4", ".avi", ".mov"])
    parser.add_argument("--audio_exts", nargs="+", default=[".wav"])
    parser.add_argument("--prefer_wav", action="store_true", default=True)
    parser.add_argument("--no_prefer_wav", dest="prefer_wav", action="store_false")
    return parser


def main() -> None:
    run_preprocess(make_parser().parse_args())


if __name__ == "__main__":
    main()
