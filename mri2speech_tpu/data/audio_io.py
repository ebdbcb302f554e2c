"""Host-side audio/video IO.

Parity targets: `preprocess_rtmri_data.py:46-118` (readers/resample) and
`meldataset.py:14-24` (wav loading incl. the `.wav.wav` repair quirk).

Library availability differs from the reference environment: librosa/soundfile
are not present here, so wav IO uses scipy (which the reference's vocoder path
already uses — `meldataset.py:8`) and resampling uses a polyphase kaiser filter
(scipy) unless soxr is importable. moviepy-based audio extraction from video is
gated the same way the reference gates it.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

try:  # optional, mirrors the reference's soft dependency
    import soxr  # type: ignore

    HAS_SOXR = True
except Exception:  # pragma: no cover
    soxr = None
    HAS_SOXR = False

try:  # optional
    from moviepy.editor import VideoFileClip  # type: ignore

    HAS_MOVIEPY = True
except Exception:  # pragma: no cover
    VideoFileClip = None
    HAS_MOVIEPY = False

try:
    import cv2

    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False

MAX_WAV_VALUE = 32768.0


def load_wav(full_path: str) -> Tuple[np.ndarray, int]:
    """Read a wav as raw integer/float samples + rate (`meldataset.py:14-24`).

    Applies the reference's `.wav.wav` -> `.wav` filename repair.
    """
    if full_path.endswith(".wav.wav"):
        full_path = full_path[:-4]
    if not os.path.exists(full_path):
        raise FileNotFoundError(f"File not found: {full_path}")
    from scipy.io.wavfile import read

    sampling_rate, data = read(full_path)
    return data, sampling_rate


def write_wav(path: str, sr: int, data: np.ndarray) -> None:
    """Write float [-1,1] or int16 audio to a wav file."""
    from scipy.io.wavfile import write

    write(path, sr, data)


def write_wav_float(path: str, data: np.ndarray, sr: int) -> None:
    """soundfile.write-equivalent for float audio (stores float32 PCM)."""
    from scipy.io.wavfile import write

    write(path, sr, data.astype(np.float32))


def normalize_peak(audio: np.ndarray) -> np.ndarray:
    """librosa.util.normalize equivalent: divide by max |x| (inf-norm)."""
    peak = np.max(np.abs(audio))
    if peak > 0:
        return audio / peak
    return audio


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """High-quality resample (`preprocess_rtmri_data.py:46-51`).

    soxr VHQ when available; otherwise a polyphase kaiser resampler (scipy) —
    a documented deviation from librosa's kaiser_best with comparable quality.
    """
    if sr_in == sr_out or x.size == 0:
        return x
    if HAS_SOXR:
        return soxr.resample(x, sr_in, sr_out, quality="VHQ")  # type: ignore[union-attr]
    from fractions import Fraction

    from scipy.signal import resample_poly

    frac = Fraction(sr_out, sr_in).limit_denominator(10_000)
    return resample_poly(x, frac.numerator, frac.denominator).astype(x.dtype, copy=False)


def read_audio_from_wav(path: str, target_sr: int = 11413) -> Tuple[np.ndarray, int]:
    """Float mono audio at target_sr (`preprocess_rtmri_data.py:90-96`)."""
    data, sr = load_wav(path)
    y = np.asarray(data)
    if y.dtype.kind in "iu":  # scale integer PCM to [-1, 1] floats
        y = y.astype(np.float32) / float(np.iinfo(data.dtype).max)
    else:
        y = y.astype(np.float32, copy=False)
    if y.ndim == 2:
        y = y.mean(axis=1)
    y = resample(y, sr, target_sr)
    return y.astype(np.float32, copy=False), target_sr


def read_audio_from_video(video_path: str, target_sr: int = 11413) -> Tuple[np.ndarray, int]:
    """Audio track of a video, mono float at target_sr (`preprocess_rtmri_data.py:54-87`)."""
    if not HAS_MOVIEPY:
        raise RuntimeError("moviepy is required to extract audio from video files.")
    clip = VideoFileClip(video_path)  # type: ignore[operator]
    try:
        audio_clip = clip.audio
        if audio_clip is None:
            raise RuntimeError(f"audio track not found: {video_path}")
        fps = getattr(audio_clip, "fps", target_sr) or target_sr
        y = np.asarray(audio_clip.to_soundarray(fps=fps))
        if y.ndim == 2:
            y = y.mean(axis=1)
        y = y.astype(np.float32, copy=False)
        y = resample(y, int(fps), target_sr)
        return y, target_sr
    finally:
        clip.close()


def read_video_frames(path: str, resize_hw: Tuple[int, int] = (256, 256)) -> np.ndarray:
    """Grayscale frames in [0,1], (T, H, W) float32 (`preprocess_rtmri_data.py:99-118`).

    BGR->gray, INTER_AREA resize, /255 — the TRAINING-side normalisation.
    """
    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required to read video frames.")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"could not open video: {path}")
    frames: List[np.ndarray] = []
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            h, w = resize_hw
            if gray.shape[:2] != (h, w):
                gray = cv2.resize(gray, (w, h), interpolation=cv2.INTER_AREA)
            frames.append(gray.astype(np.float32) / 255.0)
    finally:
        cap.release()
    if not frames:
        return np.zeros((0, resize_hw[0], resize_hw[1]), dtype=np.float32)
    return np.stack(frames, axis=0)


def preprocess_inference_frame(frame: np.ndarray, target_size=(256, 256)) -> np.ndarray:
    """Per-frame z-score -> min-max to [0,1] (`run_mri_video_inference.py:34-54`).

    NOTE: this INFERENCE-side normalisation intentionally differs from the
    training-side /255 above — the reference trained on externally normalised
    videos; both paths are kept and documented (SURVEY quirk list).
    """
    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required to read video frames.")
    if frame.ndim == 3:
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    else:
        gray = frame
    if gray.shape[::-1] != target_size:
        gray = cv2.resize(gray, target_size, interpolation=cv2.INTER_LINEAR)
    gray = gray.astype(np.float32)
    mean, std = gray.mean(), gray.std()
    gray = (gray - mean) / std if std > 0 else gray - mean
    lo, hi = gray.min(), gray.max()
    if hi > lo:
        gray = (gray - lo) / (hi - lo)
    else:
        gray = np.zeros_like(gray)
    return gray


def load_video_frames_for_inference(
    video_path: Path, target_size=(256, 256), max_frames: Optional[int] = None
) -> np.ndarray:
    """(T, H, W) float32 frames with inference normalisation
    (`run_mri_video_inference.py:57-74`)."""
    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required to read video frames.")
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise ValueError(f"Unable to open video: {video_path}")
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if max_frames is not None:
        total = min(total, max_frames)
    frames = []
    for _ in range(total):
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(preprocess_inference_frame(frame, target_size))
    cap.release()
    if not frames:
        raise ValueError("No frames could be read from video")
    return np.asarray(frames, dtype=np.float32)
