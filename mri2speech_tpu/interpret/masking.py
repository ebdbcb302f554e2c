"""Articulator occlusion masking for rtMRI videos.

Parity target `scripts/mask_rtmri_video.py`: polygon presets (lip rectangle,
tongue pentagon in 256x256 coords) scaled to the frame size, soft mask =
fillConvexPoly(alpha) + Gaussian blur clipped to [alpha, 1], multiplied per
frame and re-encoded.

This is the pipeline's *scientific* fault-injection subsystem: deliberately
attenuate an articulator region, re-run inference, and measure acoustic
degradation (SURVEY aux-subsystems).

Extension: the `custom` mask type — documented in the reference README but
missing from its implementation (`mask_rtmri_video.py:105-115` offers only
lip/tongue) — is implemented here via `--points x1,y1 x2,y2 ...`.
"""
from __future__ import annotations

import argparse
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

try:
    import cv2

    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False


@dataclass(frozen=True)
class MaskPreset:
    """Named polygon in base_size coordinates."""

    name: str
    points: Tuple[Tuple[float, float], ...]
    base_size: Tuple[float, float] = (256.0, 256.0)

    def scaled(self, target_size: Tuple[int, int]) -> np.ndarray:
        width, height = target_size
        base_w, base_h = self.base_size
        pts = np.array(self.points, dtype=np.float32)
        pts[:, 0] *= width / base_w
        pts[:, 1] *= height / base_h
        return pts


LIP_MASK = MaskPreset(
    name="lip",
    points=((8.0, 84.0), (43.0, 84.0), (45.0, 156.0), (8.0, 156.0)),
)

TONGUE_MASK = MaskPreset(
    name="tongue",
    points=((36.1, 102.7), (63.4, 90.9), (122.7, 111.5), (133.4, 172.2), (47.6, 155.0)),
)

PRESETS = {"lip": LIP_MASK, "tongue": TONGUE_MASK}


def build_mask(
    shape: Tuple[int, int], polygon: np.ndarray, alpha: float, blur_kernel: int
) -> np.ndarray:
    """Soft attenuation mask in [alpha, 1] (`mask_rtmri_video.py:53-68`)."""
    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required for mask construction.")
    h, w = shape
    mask = np.ones((h, w), dtype=np.float32)
    poly_int = np.round(polygon).astype(np.int32)
    cv2.fillConvexPoly(mask, poly_int, alpha)
    if blur_kernel > 1:
        if blur_kernel % 2 == 0:
            blur_kernel += 1
        mask = cv2.GaussianBlur(mask, (blur_kernel, blur_kernel), sigmaX=0.0)
    return np.clip(mask, alpha, 1.0)


def apply_mask_to_frames(frames: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """(T, H, W) float frames attenuated in-place-free. For array pipelines."""
    return frames * mask[None, :, :]


def apply_mask_to_video(input_path: Path, output_path: Path, mask: np.ndarray) -> None:
    """Re-encode a video with the mask applied (`mask_rtmri_video.py:71-102`)."""
    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required for video masking.")
    cap = cv2.VideoCapture(str(input_path))
    if not cap.isOpened():
        raise RuntimeError(f"Failed to open video: {input_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    if mask.shape != (height, width):
        raise ValueError(f"Mask shape {mask.shape} != frame shape {(height, width)}")

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    output_path.parent.mkdir(parents=True, exist_ok=True)
    writer = cv2.VideoWriter(str(output_path), fourcc, fps, (width, height))
    if not writer.isOpened():
        raise RuntimeError(f"Failed to open writer for {output_path}")
    try:
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            masked = (
                (frame.astype(np.float32) * mask[..., None]).clip(0.0, 255.0).astype(np.uint8)
            )
            writer.write(masked)
    finally:
        cap.release()
        writer.release()


def parse_custom_points(specs: Sequence[str]) -> Tuple[Tuple[float, float], ...]:
    pts = []
    for spec in specs:
        try:
            x, y = (float(v) for v in spec.split(","))
        except ValueError as exc:
            raise ValueError(f"Invalid point '{spec}'; use x,y") from exc
        pts.append((x, y))
    if len(pts) < 3:
        raise ValueError("custom mask needs at least 3 points")
    return tuple(pts)


def main() -> None:
    parser = argparse.ArgumentParser(description="Apply soft articulation mask to rtMRI video")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument(
        "--mask-type", default="lip", choices=["lip", "tongue", "custom"],
        help="Preset mask, or 'custom' with --points",
    )
    parser.add_argument(
        "--points", nargs="+", default=None, metavar="X,Y",
        help="Polygon vertices in 256x256 base coords (custom mask type)",
    )
    parser.add_argument("--alpha", type=float, default=0.1)
    parser.add_argument("--blur-kernel", type=int, default=11)
    args = parser.parse_args()

    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required for video masking")
    input_path, output_path = Path(args.input), Path(args.output)
    if not input_path.exists():
        raise FileNotFoundError(f"Input video not found: {input_path}")

    if args.mask_type == "custom":
        if not args.points:
            raise SystemExit("--mask-type custom requires --points x1,y1 x2,y2 ...")
        preset = MaskPreset(name="custom", points=parse_custom_points(args.points))
    else:
        preset = PRESETS[args.mask_type]

    cap = cv2.VideoCapture(str(input_path))
    if not cap.isOpened():
        raise RuntimeError(f"Failed to open video: {input_path}")
    ret, frame = cap.read()
    cap.release()
    if not ret:
        raise RuntimeError("Could not read first frame from video")
    height, width = frame.shape[:2]
    polygon = preset.scaled((width, height))
    mask = build_mask((height, width), polygon, alpha=args.alpha, blur_kernel=args.blur_kernel)
    apply_mask_to_video(input_path, output_path, mask)
    print(f"[INFO] Masked video written to {output_path}")


if __name__ == "__main__":
    main()
