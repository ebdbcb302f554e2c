"""Grad-CAM video tool tests (pure functions + cv2 writer round trip)."""
import numpy as np
import pytest

from mri2speech_tpu.interpret.video_tools import (
    combine_heatmaps,
    jet_overlay,
    load_video_segment,
    normalize_heatmap,
    write_video,
)


def test_normalize_heatmap():
    h = np.array([[1.0, 3.0], [5.0, 1.0]], dtype=np.float32)
    n = normalize_heatmap(h)
    assert n.min() == 0.0 and n.max() == 1.0
    flat = normalize_heatmap(np.full((4, 4), 7.0))
    assert np.all(flat == 0.0)  # degenerate range -> zeros


def test_combine_heatmaps_modes():
    a = np.array([[0.2, 0.8]], dtype=np.float32)
    b = np.array([[0.6, 0.4]], dtype=np.float32)
    np.testing.assert_allclose(combine_heatmaps(a, b, "max"), [[0.6, 0.8]])
    np.testing.assert_allclose(combine_heatmaps(a, b, "mean"), [[0.4, 0.6]])
    np.testing.assert_allclose(combine_heatmaps(a, None, "max"), a)
    with pytest.raises(ValueError):
        combine_heatmaps(a, b.T, "max")
    with pytest.raises(ValueError):
        combine_heatmaps(a, b, "median")


def test_jet_overlay_shape_and_range():
    frame = np.random.default_rng(0).random((32, 32)).astype(np.float32)
    heat = np.random.default_rng(1).random((32, 32)).astype(np.float32)
    out = jet_overlay(frame, heat, alpha=0.6)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_write_video_and_reload_segment(tmp_path):
    rng = np.random.default_rng(0)
    frames = [
        (rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(6)
    ]
    out = tmp_path / "clip.avi"
    # mp4v may be unavailable headless; write via the same helper with repeat
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    writer = cv2.VideoWriter(str(out), fourcc, 10.0, (64, 64))
    for f in frames:
        writer.write(f)
    writer.release()

    seg = load_video_segment(out, start_frame=2, count=3, size=(64, 64))
    assert seg.shape == (3, 64, 64)
    assert seg.min() >= 0.0 and seg.max() <= 1.0
