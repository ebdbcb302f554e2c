"""Grad-CAM formant-band attribution over the acoustic model.

Parity target `scripts/mri_gradcam_formant.py`:
* target = sum of linear mel **power** (10^(dB/10)) over the mel bins of a Hz
  band (HTK mel mapping, default F1 300-900 / F2 900-2500, `:58-119`), reduced
  over time by mean|sum (`:230-247`)
* CAM = ReLU(sum_c GAP(dTarget/dFeat)_c * Feat_c), bilinear-upsampled to the
  frame size, per-frame min-max normalised (`:169-200`)
* sequence-level CAM plus optional per-frame-target CAMs (`:253-272`)

TPU design: the CNN feature map is an explicit function boundary —
`jax.value_and_grad` w.r.t. the feature map replaces torch's `retain_grad` +
`.backward()` dance, and no train/eval mode juggling is needed (`:220-226` works
around cuDNN; `lax.scan` LSTMs differentiate in eval mode natively). All CAMs
(sequence + per-frame) come from jitted programs.
"""
from __future__ import annotations

import argparse
import functools
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mri2speech_tpu.ops.mel import mel_bin_frequencies_htk

Array = jax.Array


@dataclass
class GradCAMOutputs:
    """heatmaps: (T, H, W) in [0,1]; per_frame: {frame_idx: (H, W)}."""

    heatmaps: np.ndarray
    per_frame: Dict[int, np.ndarray]
    band_name: str


def parse_band_arguments(
    band_args: Optional[Sequence[str]],
    n_mels: int,
    sampling_rate: int,
    fmin: float,
    fmax: Optional[float],
) -> Dict[str, np.ndarray]:
    """Parse "NAME:LOW-HIGH" Hz specs into mel-bin index arrays (`:79-119`)."""
    default_bands = {"F1": (300.0, 900.0), "F2": (900.0, 2500.0)}
    bands: Dict[str, Tuple[float, float]] = {}
    if not band_args:
        bands = dict(default_bands)
    else:
        for spec in band_args:
            if ":" not in spec or "-" not in spec:
                raise ValueError(f"Invalid band specification '{spec}'. Use NAME:LOW-HIGH.")
            name, rest = spec.split(":", 1)
            low_str, high_str = rest.split("-", 1)
            try:
                low, high = float(low_str), float(high_str)
            except ValueError as exc:
                raise ValueError(f"Band range must be numeric: '{spec}'.") from exc
            if high <= low:
                raise ValueError(f"Band upper bound must exceed lower bound: '{spec}'.")
            bands[name.strip()] = (low, high)

    freqs = mel_bin_frequencies_htk(n_mels, sampling_rate, fmin, fmax)
    out: Dict[str, np.ndarray] = {}
    for name, (low, high) in bands.items():
        idx = np.flatnonzero((freqs >= low) & (freqs <= high))
        idx = idx[idx < n_mels]
        if idx.size == 0:
            raise ValueError(
                f"No mel bins fall inside {name} range ({low}-{high} Hz). "
                "Adjust the band or mel settings."
            )
        out[name] = idx
    return out


def _cam_from_grads(feats: Array, grads: Array, B: int, T: int, target_hw) -> Array:
    """(B*T, h, w, C) feats+grads -> (T, H, W) normalised CAMs (`:169-200`)."""
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)      # GAP over space
    cam = jax.nn.relu(jnp.sum(weights * feats, axis=-1))        # (B*T, h, w)
    cam = jax.image.resize(cam, (B * T,) + tuple(target_hw), method="bilinear")
    cam = cam - jnp.min(cam, axis=(-2, -1), keepdims=True)
    cam = cam / (jnp.max(cam, axis=(-2, -1), keepdims=True) + 1e-6)
    return cam.reshape(B, T, *target_hw)


@functools.lru_cache(maxsize=16)
def _cnn_features_program(model):
    return jax.jit(
        lambda v, xx: model.apply(v, xx, train=False, method=model.cnn_features)
    )


def compute_cnn_features(model, variables: dict, frames: np.ndarray):
    """Upload frames once and run the CNN forward once; the returned device
    feature map can be shared by every band's `compute_gradcam` call (the
    target bands only differ after the feature split)."""
    if frames.ndim == 3:
        frames = frames[None, :, None, :, :]
    x = jnp.asarray(frames, dtype=jnp.float32)
    return _cnn_features_program(model)(jax.device_put(variables), x)


@functools.lru_cache(maxsize=16)
def _cam_programs(model, reduction: str, B: int, T: int, target_hw: tuple):
    """Jitted (seq_cam, frames_cam) for a (model, reduction, shape) key.

    Cached at module level: `compute_gradcam` used to build fresh jit
    closures per call, retracing the full model every invocation (~18 s per
    band through the remote-compile tunnel). The band is a fixed-shape
    {0,1} mask over mel bins (not a bin-index array), so EVERY band shares
    one compiled program — a 2-band sweep compiles once."""

    def band_power(v, f, mean, std, band_mask):
        pred = model.apply(v, f, B, T, train=False, method=model.head_from_features)
        mel_db = pred * std + mean
        mel_power = jnp.power(10.0, mel_db / 10.0)
        return jnp.sum(mel_power * band_mask, axis=-1)  # (B, T)

    @jax.jit
    def seq_cam(v, f, mean, std, band_mask):
        def target(f_):
            p = band_power(v, f_, mean, std, band_mask)
            return jnp.mean(p) if reduction == "mean" else jnp.sum(p)

        grads = jax.grad(target)(f)
        return _cam_from_grads(f, grads, B, T, target_hw)

    @jax.jit
    def frames_cam(v, f, mean, std, band_mask, idxs):
        """All per-frame-target CAMs in ONE program: vmap over the target
        index batches the N independent backward passes (the reference runs N
        separate `.backward()` calls, `mri_gradcam_formant.py:253-272`) — one
        dispatch instead of N on a remote-latency host. Each lane returns only
        its OWN frame's (H, W) heatmap, so the host fetch is N*H*W, not
        N*T*H*W."""

        def one(idx):
            def target(f_):
                return jnp.mean(band_power(v, f_, mean, std, band_mask)[:, idx])

            grads = jax.grad(target)(f)
            # slice the target frame's low-res CAM BEFORE the bilinear
            # upsample + normalise (identical math — both are per-frame —
            # but 1 resize per lane instead of B*T)
            weights = jnp.mean(grads, axis=(1, 2), keepdims=True)
            cam_lo = jax.nn.relu(jnp.sum(weights * f, axis=-1))  # (B*T, h, w)
            cam = cam_lo.reshape(B, T, *cam_lo.shape[1:])[0, idx]
            cam = jax.image.resize(cam, tuple(target_hw), method="bilinear")
            cam = cam - jnp.min(cam)
            return cam / (jnp.max(cam) + 1e-6)

        return jax.vmap(one)(idxs)  # (N, H, W)

    return seq_cam, frames_cam


def compute_gradcam(
    model,
    variables: dict,
    frames: np.ndarray,
    mel_mean: np.ndarray,
    mel_std: np.ndarray,
    band_indices: np.ndarray,
    *,
    reduction: str = "mean",
    frame_indices: Optional[Iterable[int]] = None,
    feats=None,
) -> GradCAMOutputs:
    """frames: (1, T, 1, H, W) or (T, H, W). Batch size 1, like the reference.

    `feats`: optional precomputed `compute_cnn_features` output — skips the
    per-band frame upload + CNN forward when sweeping multiple bands."""
    if reduction not in {"mean", "sum"}:
        raise ValueError("Reduction must be 'mean' or 'sum'.")
    if frames.ndim == 3:
        frames = frames[None, :, None, :, :]
    B, T = frames.shape[0], frames.shape[1]
    if B != 1:
        raise ValueError("Grad-CAM helper currently supports batch size 1.")
    target_hw = (frames.shape[-2], frames.shape[-1])
    mean = jnp.asarray(mel_mean)
    std = jnp.asarray(mel_std)
    n_mels = np.asarray(mel_mean).shape[-1]
    band_idx = np.asarray(band_indices)
    band_mask = jnp.asarray(
        np.isin(np.arange(n_mels), band_idx).astype(np.float32)
    )  # fixed shape: every band reuses one compiled program

    variables = jax.device_put(variables)
    if feats is None:
        feats = compute_cnn_features(model, variables, frames)

    seq_cam, frames_cam = _cam_programs(model, reduction, B, T, target_hw)

    cams = np.asarray(seq_cam(variables, feats, mean, std, band_mask))[0]  # (T, H, W)

    per_frame: Dict[int, np.ndarray] = {}
    wanted = list(frame_indices or [])
    for frame_idx in wanted:
        if not (0 <= frame_idx < T):
            raise IndexError(f"Frame index {frame_idx} out of range (0 <= idx < {T}).")
    if wanted:
        fc = np.asarray(
            frames_cam(
                variables, feats, mean, std, band_mask,
                jnp.asarray(wanted, dtype=jnp.int32),
            )
        )
        for i, frame_idx in enumerate(wanted):
            per_frame[frame_idx] = fc[i]

    return GradCAMOutputs(heatmaps=cams, per_frame=per_frame, band_name="unknown")


# ---------------------------------------------------------------------------
# artifact output (`:282-323`)
# ---------------------------------------------------------------------------

def overlay_heatmap(frame, heatmap, output_path: Path, cmap: str = "jet", alpha: float = 0.5):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_path.parent.mkdir(parents=True, exist_ok=True)
    plt.figure(figsize=(5, 5))
    plt.imshow(frame, cmap="gray", interpolation="nearest")
    plt.imshow(heatmap, cmap=cmap, alpha=alpha, interpolation="bilinear")
    plt.axis("off")
    plt.tight_layout(pad=0)
    plt.savefig(output_path, dpi=200)
    plt.close()


def save_heatmap_sequence(
    cams: np.ndarray,
    frames_np: np.ndarray,
    band_name: str,
    output_dir: Path,
    target_frames: Sequence[int],
) -> None:
    output_dir.mkdir(parents=True, exist_ok=True)
    np.save(output_dir / f"gradcam_{band_name}_sequence.npy", cams)
    overlay_heatmap(
        frames_np.mean(axis=0), cams.mean(axis=0),
        output_dir / f"gradcam_{band_name}_average.png",
    )
    for frame_idx in target_frames:
        overlay_heatmap(
            frames_np[frame_idx], cams[frame_idx],
            output_dir / f"gradcam_{band_name}_frame{frame_idx:04d}.png",
        )


def main() -> None:
    from mri2speech_tpu.data.audio_io import load_video_frames_for_inference
    from mri2speech_tpu.models.acoustic import AcousticModel
    from mri2speech_tpu.ops.scaler import MelScaler
    from mri2speech_tpu.train import checkpoint as ckpt_io

    parser = argparse.ArgumentParser(
        description="Grad-CAM for the CNN-LSTM MRI->mel model over formant bands."
    )
    parser.add_argument("--video", required=True)
    parser.add_argument("--mri-checkpoint", required=True)
    parser.add_argument("--scaler-json", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--n-mels", type=int, default=64)
    parser.add_argument("--sampling-rate", type=int, default=11413)
    parser.add_argument("--fmin", type=float, default=0.0)
    parser.add_argument("--fmax", type=float, default=8000.0)
    parser.add_argument("--formant-band", action="append", metavar="NAME:LOW-HIGH")
    parser.add_argument("--target-frames", type=int, nargs="*", default=[])
    parser.add_argument("--reduction", choices=["mean", "sum"], default="mean")
    args = parser.parse_args()

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    scaler = MelScaler.load(args.scaler_json)
    bands = parse_band_arguments(
        args.formant_band, args.n_mels, args.sampling_rate, args.fmin, args.fmax
    )
    frames = load_video_frames_for_inference(Path(args.video))

    if scaler.n_mels != args.n_mels:
        raise ValueError(
            f"Scaler mean/std length ({scaler.n_mels}) does not match "
            f"--n-mels ({args.n_mels})"
        )
    model = AcousticModel(n_mels=args.n_mels)
    obj = ckpt_io.load_checkpoint_raw(args.mri_checkpoint)
    # same key fallbacks as the inference pipeline (converted torch
    # checkpoints save under 'model_state_dict', convert_torch_checkpoint.py)
    params = obj.get("params", obj.get("model_state_dict", obj))
    variables = {
        "params": params,
        "batch_stats": obj.get("batch_stats", {}),
    }

    feats = compute_cnn_features(model, variables, frames)  # once for all bands
    for band_name, band_idx in bands.items():
        print(f"[INFO] Computing Grad-CAM for {band_name} (bins={band_idx.tolist()}).")
        outputs = compute_gradcam(
            model, variables, frames, scaler.mean, scaler.std, band_idx,
            reduction=args.reduction, frame_indices=args.target_frames,
            feats=feats,
        )
        outputs.band_name = band_name
        save_heatmap_sequence(outputs.heatmaps, frames, band_name, output_dir, args.target_frames)
        for frame_idx, heat in outputs.per_frame.items():
            overlay_heatmap(
                frames[frame_idx], heat,
                output_dir / f"gradcam_{band_name}_frame{frame_idx:04d}_detail.png",
            )
    print("[DONE] Grad-CAM computation finished.")


if __name__ == "__main__":
    main()
