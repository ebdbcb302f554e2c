"""Golden-value tests for the mel/STFT stack.

The STFT path is validated against torch.stft (the exact op the reference vocoder
uses, `meldataset.py:86-88`). The mel filterbank is validated against an
independent loop-based implementation of the documented Slaney formula, and the
full pipelines against step-by-step torch/numpy recomputations.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mri2speech_tpu.ops import mel as M

pytestmark = pytest.mark.smoke  # cold-cache fast: mel/STFT programs only

SR, N_FFT, HOP, WIN, N_MELS = 11413, 2048, 420, 2048, 64


# ---------------------------------------------------------------------------
# reference helpers (independent implementations for golden values)
# ---------------------------------------------------------------------------

def _slaney_mel_fb_loops(sr, n_fft, n_mels, fmin, fmax):
    """Loop-based Slaney filterbank straight from the documented formula."""
    if fmax is None:
        fmax = sr / 2

    def h2m(h):
        if h < 1000.0:
            return h / (200.0 / 3)
        return 15.0 + np.log(h / 1000.0) / (np.log(6.4) / 27.0)

    def m2h(m):
        if m < 15.0:
            return m * (200.0 / 3)
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    edges_mel = np.linspace(h2m(fmin), h2m(fmax), n_mels + 2)
    edges_hz = np.array([m2h(m) for m in edges_mel])
    nf = 1 + n_fft // 2
    fftfreqs = np.linspace(0, sr / 2, nf)
    fb = np.zeros((n_mels, nf))
    for i in range(n_mels):
        lo, ce, hi = edges_hz[i], edges_hz[i + 1], edges_hz[i + 2]
        for j, f in enumerate(fftfreqs):
            if lo < f < ce:
                fb[i, j] = (f - lo) / (ce - lo)
            elif ce <= f < hi:
                # f == ce lands here and evaluates to exactly 1.0
                fb[i, j] = (hi - f) / (hi - ce)
        fb[i] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def _torch_mel_spectrogram(y_np, fmax):
    """Step-for-step torch recomputation of the vocoder mel op semantics."""
    y = torch.from_numpy(y_np)
    pad = int((N_FFT - HOP) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    win = torch.hann_window(WIN)
    spec = torch.stft(
        y, N_FFT, hop_length=HOP, win_length=WIN, window=win, center=False,
        pad_mode="constant", normalized=False, onesided=True, return_complex=True,
    )
    mag = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    fb = torch.from_numpy(M.mel_filterbank(SR, N_FFT, N_MELS, 0, fmax))
    melspec = torch.matmul(fb, mag)
    return torch.log(torch.clamp(melspec, min=1e-5)).numpy()


# ---------------------------------------------------------------------------
# filterbank
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmax", [8000.0, None, 5000.0])
def test_mel_filterbank_matches_independent_formula(fmax):
    ours = M.mel_filterbank(SR, N_FFT, N_MELS, 0.0, fmax)
    ref = _slaney_mel_fb_loops(SR, N_FFT, N_MELS, 0.0, fmax)
    assert ours.shape == (N_MELS, 1 + N_FFT // 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_mel_filterbank_fmax_above_nyquist_has_empty_top_filters():
    # fmax=8000 at sr=11413 (Nyquist 5706.5) — reference config quirk.
    fb = M.mel_filterbank(SR, N_FFT, N_MELS, 0.0, 8000.0)
    assert fb[-1].sum() == 0.0  # top filter entirely above Nyquist
    assert fb[10].sum() > 0.0


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        M.hann_window_periodic(WIN), torch.hann_window(WIN).numpy(), atol=1e-6
    )


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_stft_magnitude_matches_torch(rng, method):
    y = rng.standard_normal((2, 8400)).astype(np.float32) * 0.3
    ours = np.asarray(
        M.stft_magnitude(jnp.asarray(y), N_FFT, HOP, WIN, magnitude_eps=1e-9, method=method)
    )
    spec = torch.stft(
        torch.from_numpy(y), N_FFT, hop_length=HOP, win_length=WIN,
        window=torch.hann_window(WIN), center=False, normalized=False,
        onesided=True, return_complex=True,
    )
    ref = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_frame_count_segment_size():
    # segment 8400 -> exactly 20 mel frames (one per video frame at hop 420)
    y = jnp.zeros((1, 8400))
    out = M.mel_spectrogram(y, N_FFT, N_MELS, SR, HOP, WIN, 0, 8000.0, method="fft")
    assert out.shape == (1, N_MELS, 20)


# ---------------------------------------------------------------------------
# full vocoder mel pipeline
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["fft", "matmul"])
@pytest.mark.parametrize("fmax", [8000.0, None])
def test_mel_spectrogram_matches_torch_pipeline(rng, method, fmax):
    y = (rng.standard_normal((2, 8400)).astype(np.float32) * 0.2).clip(-1, 1)
    ours = np.asarray(
        M.mel_spectrogram(jnp.asarray(y), N_FFT, N_MELS, SR, HOP, WIN, 0, fmax, method=method)
    )
    ref = _torch_mel_spectrogram(y, fmax)
    # log-domain absolute tolerance; 1e-3 in log space ~ 0.1% linear error
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)
    # L1 parity within 1% of dynamic range (the BASELINE.md metric)
    l1 = np.abs(ours - ref).mean()
    assert l1 < 0.01 * (ref.max() - ref.min() + 1e-9)


# ---------------------------------------------------------------------------
# preprocessing mel (dB domain)
# ---------------------------------------------------------------------------

def test_pre_emphasis_matches_reference_definition(rng):
    x = rng.standard_normal(100).astype(np.float32)
    y = np.asarray(M.pre_emphasis(jnp.asarray(x), 0.97))
    ref = np.empty_like(x)
    ref[0] = x[0]
    ref[1:] = x[1:] - 0.97 * x[:-1]
    np.testing.assert_allclose(y, ref, atol=1e-6)


def test_power_to_db_top_db_floor():
    S = jnp.asarray(np.array([1.0, 1e-12, 1e-3], dtype=np.float32))
    db = np.asarray(M.power_to_db(S))
    # max is 0 dB; floor at -80 dB
    assert db[0] == pytest.approx(0.0, abs=1e-5)
    assert db[1] == pytest.approx(-80.0, abs=1e-4)
    assert db[2] == pytest.approx(-30.0, abs=1e-3)


def test_compute_mel_db_matches_numpy_pipeline(rng):
    L = 8400
    y = (rng.standard_normal(L).astype(np.float32) * 0.3).clip(-1, 1)
    ours = np.asarray(M.compute_mel_db(jnp.asarray(y), SR, method="fft"))

    # independent numpy recomputation
    ye = np.empty_like(y)
    ye[0] = y[0]
    ye[1:] = y[1:] - 0.97 * y[:-1]
    T = 1 + (L - N_FFT) // HOP
    win = M.hann_window_periodic(WIN).astype(np.float64)
    frames = np.stack([ye[t * HOP : t * HOP + N_FFT] for t in range(T)]).astype(np.float64)
    spec = np.abs(np.fft.rfft(frames * win, axis=-1)) ** 2
    fb = M.mel_filterbank(SR, N_FFT, N_MELS, 0.0, None).astype(np.float64)
    melp = spec @ fb.T
    db = 10.0 * np.log10(np.maximum(melp, 1e-10))
    db = np.maximum(db, db.max() - 80.0)

    assert ours.shape == (T, N_MELS)
    np.testing.assert_allclose(ours, db, atol=2e-2, rtol=1e-4)


def test_mel_db_to_log_power_bridge():
    db = jnp.asarray(np.array([[0.0, -100.0, 10.0]], dtype=np.float32))
    out = np.asarray(M.mel_db_to_log_power(db))
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-6)  # 10^0 = 1 -> ln 1 = 0
    np.testing.assert_allclose(out[0, 1], np.log(1e-5), atol=1e-4)  # clamped
    np.testing.assert_allclose(out[0, 2], np.log(10.0), rtol=1e-5)


def test_align_by_hop():
    assert M.align_by_hop(100, 420 * 50, 420) == 50
    assert M.align_by_hop(30, 420 * 50, 420) == 30
    assert M.align_by_hop(30, 419, 420) == 0


def test_stft_window_shorter_than_nfft_matches_torch(rng):
    """win_size < n_fft: the window is zero-padded symmetrically (torch.stft)."""
    y = rng.standard_normal((1, 4000)).astype(np.float32) * 0.3
    n_fft, hop, win = 1024, 256, 512
    ours = np.asarray(
        M.stft_magnitude(jnp.asarray(y), n_fft, hop, win, magnitude_eps=1e-9, method="fft")
    )
    spec = torch.stft(
        torch.from_numpy(y), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, normalized=False,
        onesided=True, return_complex=True,
    )
    ref = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_stft_center_true_matches_torch(rng):
    y = rng.standard_normal((1, 3000)).astype(np.float32) * 0.3
    n_fft, hop = 512, 128
    ours = np.asarray(
        M.stft_magnitude(
            jnp.asarray(y), n_fft, hop, n_fft, center=True, magnitude_eps=1e-9, method="fft"
        )
    )
    spec = torch.stft(
        torch.from_numpy(y), n_fft, hop_length=hop, win_length=n_fft,
        window=torch.hann_window(n_fft), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    ref = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
