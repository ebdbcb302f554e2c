"""STFT + mel-spectrogram ops with reference-exact semantics, TPU-first execution.

Two distinct mel pipelines exist in the reference and both are reproduced here:

1. **Vocoder mel** (`meldataset.py:57-93`): reflect-pad `(n_fft-hop)//2` on both
   sides, `torch.stft(center=False)` with a periodic Hann window, magnitude
   `sqrt(re^2+im^2+1e-9)`, librosa Slaney mel filterbank matmul, then
   `log(clamp(x, 1e-5))`. -> :func:`mel_spectrogram` (+ log via
   :func:`dynamic_range_compression`).

2. **Preprocessing mel** (`preprocess_rtmri_data.py:121-147`): pre-emphasis 0.97,
   `librosa.feature.melspectrogram(center=False, power=2.0)` (NO padding), then
   `librosa.power_to_db(ref=1.0)` (amin=1e-10, top_db=80). -> :func:`compute_mel_db`.

The dB <-> log-power bridge between the two domains
(`run_mri_video_inference.py:231-234`, `export_groundtruth_mels.py:7-16`):
``power = 10^(dB/10); log = ln(max(power, 1e-5))`` -> :func:`mel_db_to_log_power`.

TPU notes
---------
* The DFT is expressed either via ``jnp.fft.rfft`` (``method="fft"``) or as a
  windowed real/imag basis **matmul** (``method="matmul"``) that rides the MXU and
  lets XLA fuse framing + window + DFT + mel projection into one pipeline. For
  n_fft=2048 the basis is 2048x1025 per component — small enough to keep resident.
* Filterbanks/windows are computed host-side in float64 (matching librosa) once and
  cached, keyed by the full parameter tuple — fixing the reference's latent caching
  bug (`meldataset.py:69-80` keys the mel basis by fmax only).
* All parity-critical matmuls run with ``Precision.HIGHEST`` so fp32 results stay
  within the 1%-L1 target of the PyTorch CPU reference.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Mel scales
# ---------------------------------------------------------------------------

def hz_to_mel_slaney(freq_hz: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False): linear below 1 kHz."""
    freq_hz = np.asarray(freq_hz, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq_hz - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq_hz >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq_hz, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def hz_to_mel_htk(freq_hz: np.ndarray) -> np.ndarray:
    """HTK mel scale — used by the Grad-CAM band parser (`mri_gradcam_formant.py:58-63`)."""
    return 2595.0 * np.log10(1.0 + np.asarray(freq_hz, dtype=np.float64) / 700.0)


def mel_to_hz_htk(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_bin_frequencies_htk(
    n_mels: int, sampling_rate: int, fmin: float, fmax: Optional[float]
) -> np.ndarray:
    """Centre frequency (Hz) of each mel bin under the HTK scale.

    Mirrors `mri_gradcam_formant.py:66-76`: n_mels+2 edge points, centres are
    midpoints of consecutive edges (note: this yields n_mels+1 values of which the
    first n_mels index the bins, matching the reference's broadcasting behavior).
    """
    if fmax is None or fmax <= 0:
        fmax = sampling_rate / 2
    mel_min = float(hz_to_mel_htk(np.array([fmin]))[0])
    mel_max = float(hz_to_mel_htk(np.array([fmax]))[0])
    mels = np.linspace(mel_min, mel_max, n_mels + 2)
    mel_centers = 0.5 * (mels[:-1] + mels[1:])
    return mel_to_hz_htk(mel_centers)


# ---------------------------------------------------------------------------
# Filterbank / window construction (host-side, float64, cached)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _mel_filterbank_np(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: Optional[float]
) -> np.ndarray:
    """librosa-compatible Slaney-normalised triangular mel filterbank.

    Shape (n_mels, 1 + n_fft//2), float32 (computed in float64 like librosa then
    cast, matching `meldataset.py:72-79`). With fmax above Nyquist (the vocoder
    config uses fmax=8000 at sr=11413) the top filters extend past the spectrum
    and become partially/fully zero — replicated faithfully.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs, dtype=np.float64)
    mel_edges = mel_to_hz_slaney(
        np.linspace(
            hz_to_mel_slaney(np.array([fmin]))[0],
            hz_to_mel_slaney(np.array([fmax]))[0],
            n_mels + 2,
        )
    )
    fdiff = np.diff(mel_edges)
    ramps = mel_edges[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalisation
    enorm = 2.0 / (mel_edges[2 : n_mels + 2] - mel_edges[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: Optional[float]
) -> np.ndarray:
    """Public entry: cached (n_mels, 1+n_fft//2) float32 filterbank."""
    return _mel_filterbank_np(int(sr), int(n_fft), int(n_mels), float(fmin), None if fmax is None else float(fmax))


@functools.lru_cache(maxsize=8)
def hann_window_periodic(win_size: int) -> np.ndarray:
    """Periodic Hann window, matching `torch.hann_window` / scipy fftbins=True."""
    n = np.arange(win_size, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rfft basis matrices (n_fft, 1+n_fft//2), float32 from float64."""
    n_freqs = 1 + n_fft // 2
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


# ---------------------------------------------------------------------------
# Framing + STFT
# ---------------------------------------------------------------------------

def frame_signal(y: Array, frame_length: int, hop: int) -> Array:
    """(..., L) -> (..., T, frame_length) with T = 1 + (L - frame_length)//hop.

    Implemented as a static gather; XLA lowers this to an efficient strided copy
    and can fuse the subsequent window multiply.
    """
    L = y.shape[-1]
    T = 1 + (L - frame_length) // hop
    idx = np.arange(T)[:, None] * hop + np.arange(frame_length)[None, :]
    return y[..., idx]


def stft_magnitude(
    y: Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    *,
    center: bool = False,
    magnitude_eps: float = 1e-9,
    method: str = "auto",
) -> Array:
    """Magnitude STFT of (..., L) -> (..., n_freqs, T).

    ``center=False`` + periodic Hann matches both `torch.stft` in
    `meldataset.py:86-88` and `librosa.stft(center=False)` in preprocessing.
    ``magnitude_eps`` is the reference's `sqrt(re^2+im^2+1e-9)` stabiliser
    (`meldataset.py:88`); pass 0.0 for the plain librosa magnitude.

    method: "fft" (jnp.fft.rfft), "matmul" (MXU-friendly DFT-basis matmuls), or
    "auto" (matmul on TPU, fft otherwise).
    """
    if center:  # not used by the reference pipelines; provided for completeness
        pad = n_fft // 2
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    if method == "auto":
        method = "matmul" if jax.default_backend() == "tpu" else "fft"

    window = jnp.asarray(hann_window_periodic(win_size))
    if win_size < n_fft:  # torch.stft zero-pads the window symmetrically to n_fft
        lpad = (n_fft - win_size) // 2
        window = jnp.pad(window, (lpad, n_fft - win_size - lpad))

    frames = frame_signal(y, n_fft, hop_size) * window  # (..., T, n_fft)
    if method == "fft":
        spec = jnp.fft.rfft(frames, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:
        cos_b, sin_b = (jnp.asarray(m) for m in _dft_basis_np(n_fft))
        re = jnp.matmul(frames, cos_b, precision=_HIGHEST)
        im = jnp.matmul(frames, sin_b, precision=_HIGHEST)
        power = re * re + im * im
    mag = jnp.sqrt(power + magnitude_eps) if magnitude_eps else jnp.sqrt(power)
    return jnp.swapaxes(mag, -1, -2)  # (..., n_freqs, T)


# ---------------------------------------------------------------------------
# Vocoder-domain mel (HiFi-GAN semantics)
# ---------------------------------------------------------------------------

def dynamic_range_compression(x: Array, C: float = 1.0, clip_val: float = 1e-5) -> Array:
    """`log(clamp(x, clip_val) * C)` (`meldataset.py:35-36`)."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x: Array, C: float = 1.0) -> Array:
    return jnp.exp(x) / C


def mel_spectrogram(
    y: Array,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: Optional[float],
    *,
    method: str = "auto",
) -> Array:
    """Log-mel with HiFi-GAN fork semantics (`meldataset.py:57-93`).

    y: (..., L) waveform in [-1, 1]. Returns (..., num_mels, T) with
    T = 1 + (L + 2*((n_fft-hop)//2) - n_fft) // hop  — for L=8400 and the default
    config that is exactly 20 frames (segment_size/hop).
    """
    pad = int((n_fft - hop_size) / 2)
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    spec = stft_magnitude(
        y, n_fft, hop_size, win_size, center=False, magnitude_eps=1e-9, method=method
    )
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.matmul(fb, spec, precision=_HIGHEST)
    return dynamic_range_compression(mel)


# ---------------------------------------------------------------------------
# Preprocessing-domain mel (librosa semantics)
# ---------------------------------------------------------------------------

def pre_emphasis(x: Array, coef: float = 0.97) -> Array:
    """y[0]=x[0]; y[t]=x[t]-coef*x[t-1] (`preprocess_rtmri_data.py:37-43`)."""
    if x.shape[-1] == 0:
        return x
    first = x[..., :1]
    rest = x[..., 1:] - coef * x[..., :-1]
    return jnp.concatenate([first, rest], axis=-1)


def power_to_db(
    S: Array, ref: float = 1.0, amin: float = 1e-10, top_db: Optional[float] = 80.0
) -> Array:
    """librosa.power_to_db with its defaults, incl. the per-array 80 dB floor.

    NOTE: top_db clips relative to the max over the WHOLE array (librosa default),
    which the reference inherits in `compute_mel_db` (`preprocess_rtmri_data.py:146`).
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def db_to_power(db: Array, ref: float = 1.0) -> Array:
    return ref * jnp.power(10.0, db / 10.0)


def power_to_db_np(
    S: np.ndarray, ref: float = 1.0, amin: float = 1e-10, top_db: Optional[float] = 80.0
) -> np.ndarray:
    """NumPy twin of :func:`power_to_db` for host-side metric paths
    (eval/eval_mel.py) — identical librosa semantics, one source of truth."""
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec = log_spec - 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, np.max(log_spec) - top_db)
    return log_spec


def compute_mel_db(
    y: Array,
    sr: int,
    *,
    n_mels: int = 64,
    n_fft: int = 2048,
    win_length: int = 2048,
    hop_length: int = 420,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    preemph: float = 0.97,
    method: str = "auto",
    top_db: Optional[float] = 80.0,
) -> Array:
    """Preprocessing mel: (L,) -> (T, n_mels) dB, `preprocess_rtmri_data.py:121-147`.

    Pre-emphasis -> power-2 mel (center=False, NO padding -> T = 1+(L-n_fft)//hop)
    -> power_to_db(ref=1.0, top_db=80). Output float32, time-major.

    top_db=None skips the global-max floor — callers that evaluate over a
    PADDED frame set (data/preprocess.py `compute_mel_db_host`) must apply it
    host-side over the true frames only: the floor depends on the array max,
    and a boundary-straddling pad frame can exceed the true-frame max, which
    would over-clip quiet frames irreversibly.
    """
    y = pre_emphasis(y, coef=preemph)
    spec = stft_magnitude(
        y, n_fft, hop_length, win_length, center=False, magnitude_eps=0.0, method=method
    )
    power = spec * spec
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.matmul(fb, power, precision=_HIGHEST)
    mel_db = power_to_db(mel, ref=1.0, top_db=top_db)
    return jnp.swapaxes(mel_db, -1, -2).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Domain bridge: acoustic-model dB  ->  vocoder log-power
# ---------------------------------------------------------------------------

def mel_db_to_log_power(mel_db: Array) -> Array:
    """power = 10^(dB/10); log = ln(max(power, 1e-5)).

    The critical bridge between the acoustic model's dB-mel domain and the
    vocoder's ln-power domain (`run_mri_video_inference.py:231-234`,
    `export_predicted_mels.py:95-96`, `export_groundtruth_mels.py:7-16`).
    """
    mel_power = jnp.power(10.0, mel_db / 10.0)
    return jnp.log(jnp.clip(mel_power, min=1e-5))


def align_by_hop(mri_T: int, audio_len_samples: int, hop_length: int) -> int:
    """min(video frames, floor(samples/hop)) (`preprocess_rtmri_data.py:150-152`)."""
    return min(int(mri_T), int(np.floor(audio_len_samples / hop_length)))
