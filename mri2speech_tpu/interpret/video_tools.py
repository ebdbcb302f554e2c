"""Grad-CAM overlay video builders (host-side cv2/ffmpeg).

Parity targets:
* `scripts/create_gradcam_video.py` — slow-motion JET overlay of a heatmap
  sequence on a video segment (per-frame repeat for slowdown)
* `scripts/create_gradcam_overlay_video.py` — full-video overlay with optional
  2-band max/mean combination and ffmpeg audio muxing
"""
from __future__ import annotations

import argparse
import subprocess
import tempfile
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2

    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False


def _require_cv2():
    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required for video tools.")


def load_video_segment(
    video_path: Path, start_frame: int, count: int, size: Tuple[int, int]
) -> np.ndarray:
    """Grayscale min-max normalised frames (T, H, W) from a segment."""
    _require_cv2()
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise RuntimeError(f"Unable to open video: {video_path}")
    cap.set(cv2.CAP_PROP_POS_FRAMES, float(start_frame))
    frames = []
    for _ in range(count):
        ret, frame = cap.read()
        if not ret:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        gray = cv2.resize(gray, size, interpolation=cv2.INTER_LINEAR).astype(np.float32)
        gray -= gray.min()
        if gray.max() > 0:
            gray /= gray.max()
        frames.append(gray)
    cap.release()
    if not frames:
        raise RuntimeError("No frames loaded from video segment.")
    return np.stack(frames, axis=0)


def load_full_video_gray(video_path: Path) -> Tuple[List[np.ndarray], float]:
    _require_cv2()
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise RuntimeError(f"Failed to open video: {video_path}")
    fps = cap.get(cv2.CAP_PROP_FPS)
    frames: List[np.ndarray] = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0)
    cap.release()
    if not frames:
        raise RuntimeError("No frames loaded from video.")
    return frames, fps


def normalize_heatmap(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.float32)
    lo, hi = h.min(), h.max()
    h = (h - lo) / (hi - lo) if hi > lo else np.zeros_like(h)
    return np.clip(h, 0.0, 1.0)


def jet_overlay(frame: np.ndarray, heat: np.ndarray, alpha: float) -> np.ndarray:
    """Composite a [0,1] grayscale frame with a JET-colored heatmap."""
    _require_cv2()
    heat_uint8 = (np.clip(heat, 0, 1) * 255.0).astype(np.uint8)
    colored = cv2.applyColorMap(heat_uint8, cv2.COLORMAP_JET).astype(np.float32) / 255.0
    base = np.repeat(frame[:, :, None], 3, axis=2)
    composite = np.clip(base * (1.0 - alpha) + colored * alpha, 0.0, 1.0)
    return (composite * 255.0).astype(np.uint8)


def combine_heatmaps(
    primary: np.ndarray, secondary: Optional[np.ndarray], mode: str = "max"
) -> np.ndarray:
    """2-band combine (`create_gradcam_overlay_video.py:72-85`)."""
    if secondary is None:
        return primary
    if primary.shape != secondary.shape:
        raise ValueError("Heatmap arrays must have the same shape to combine.")
    if mode == "max":
        return np.maximum(primary, secondary)
    if mode == "mean":
        return 0.5 * (primary + secondary)
    raise ValueError(f"Unsupported combine mode: {mode}")


def write_video(output_path: Path, frames: List[np.ndarray], fps: float, repeat: int = 1) -> None:
    _require_cv2()
    if not frames:
        raise RuntimeError("No frames to write.")
    height, width = frames[0].shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(str(output_path), fourcc, fps, (width, height))
    if not writer.isOpened():
        raise RuntimeError(f"Unable to open writer for {output_path}")
    for frame in frames:
        for _ in range(max(repeat, 1)):
            writer.write(frame)
    writer.release()


def mux_audio(video_path: Path, audio_path: Path, output_path: Path) -> None:
    """ffmpeg remux with an audio track (`create_gradcam_overlay_video.py:132-146`)."""
    cmd = [
        "ffmpeg", "-y", "-i", str(video_path), "-i", str(audio_path),
        "-c:v", "copy", "-c:a", "aac", "-shortest", str(output_path),
    ]
    subprocess.run(cmd, check=True)


def create_gradcam_video(args: argparse.Namespace) -> None:
    sequence = np.load(args.sequence)
    frames = load_video_segment(
        Path(args.video), args.start_frame, sequence.shape[0],
        (args.resize[0], args.resize[1]),
    )
    overlays = [jet_overlay(f, h, args.alpha) for f, h in zip(frames, sequence)]
    write_video(Path(args.output), overlays, args.fps, args.repeat)


def create_gradcam_overlay_video(args: argparse.Namespace) -> None:
    frames, src_fps = load_full_video_gray(Path(args.video))
    heat1 = np.load(args.heatmap)
    heat2 = np.load(args.heatmap2) if args.heatmap2 else None
    heat = combine_heatmaps(heat1, heat2, args.combine_mode)
    if heat.shape[0] != len(frames):
        raise ValueError(
            f"Heatmap length {heat.shape[0]} does not match video frames {len(frames)}"
        )

    target = tuple(args.resize) if args.resize else None
    overlays = []
    for frame, h in zip(frames, heat):
        if target:
            frame = cv2.resize(frame, target, interpolation=cv2.INTER_LINEAR)
            if h.shape[::-1] != target:
                h = cv2.resize(h, target, interpolation=cv2.INTER_LINEAR)
        overlays.append(jet_overlay(frame, normalize_heatmap(h), args.alpha))

    fps = args.fps or src_fps
    with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as tmp:
        temp_video = Path(tmp.name)
    write_video(temp_video, overlays, fps)
    mux_audio(temp_video, Path(args.audio), Path(args.output))
    temp_video.unlink(missing_ok=True)


def main_segment() -> None:
    parser = argparse.ArgumentParser(description="Slow Grad-CAM overlay video from a heatmap sequence.")
    parser.add_argument("--video", required=True)
    parser.add_argument("--sequence", required=True)
    parser.add_argument("--start-frame", type=int, required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--fps", type=float, default=5.0)
    parser.add_argument("--repeat", type=int, default=3)
    parser.add_argument("--alpha", type=float, default=0.6)
    parser.add_argument("--resize", type=int, nargs=2, default=[256, 256], metavar=("W", "H"))
    create_gradcam_video(parser.parse_args())


def main_overlay() -> None:
    parser = argparse.ArgumentParser(description="Grad-CAM overlay video with audio.")
    parser.add_argument("--video", required=True)
    parser.add_argument("--heatmap", required=True)
    parser.add_argument("--heatmap2")
    parser.add_argument("--combine-mode", choices=["max", "mean"], default="max")
    parser.add_argument("--audio", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--alpha", type=float, default=0.6)
    parser.add_argument("--fps", type=float, default=None)
    parser.add_argument("--resize", type=int, nargs=2, metavar=("W", "H"))
    create_gradcam_overlay_video(parser.parse_args())


if __name__ == "__main__":
    main_segment()
