"""End-to-end rtMRI video -> speech inference (the RTF benchmark target).

Parity target `scripts/run_mri_video_inference.py:203-255`:
  video frames (per-frame z-score->minmax) -> acoustic model -> denormalise via
  scaler.json -> dB->ln-power bridge -> HiFi-GAN generator -> waveform + mel
  artifacts (wav, mel.npy, mel.png, mel_log.npy).

TPU design — ONE fused jitted program:
  acoustic CNN+BiLSTM + scaler denorm + domain bridge + generator all execute
  in a single XLA computation, so intermediate mels never round-trip to host.
  Frame counts are padded up to `frame_bucket` multiples: O(1) compiled
  programs across video lengths. The BiLSTM is mask-exact under padding (see
  `models/lstm.py`); only the generator's ~10-frame lookahead can perturb the
  final ~0.15 s of audio relative to unpadded execution (documented; pass
  frame_bucket=1 for exact per-length compilation).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mri2speech_tpu.utils.transfer import prefetch_to_host
from mri2speech_tpu.data.audio_io import load_video_frames_for_inference, write_wav_float
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.ops.mel import mel_db_to_log_power
from mri2speech_tpu.ops.scaler import MelScaler


class VideoToSpeechPipeline:
    """Fused acoustic+vocoder inference over padded frame buckets."""

    def __init__(
        self,
        acoustic_model: AcousticModel,
        acoustic_variables: dict,
        generator,                # Generator module (usually weight-norm folded)
        generator_params: dict,
        scaler: MelScaler,
        *,
        hop_total: int = 420,
        frame_bucket: int = 64,
        input_norm: str = "none",
        streaming: bool = False,
        mesh=None,
        sequence_parallel: bool = False,
    ) -> None:
        """input_norm:
        * "none" — frames arrive already normalised (float [0,1] or z-scored)
        * "zscore_minmax" — the reference's INFERENCE normalisation
          (`run_mri_video_inference.py:41-54`: per-frame z-score then min-max
          to [0,1]) is applied ON DEVICE inside the fused program; frames may
          then be fed as raw uint8 (4x less host->device traffic).

        streaming:
        * False — one monolithic transfer + one fused dispatch.
        * True — the upload is chunked into `frame_bucket`-frame blocks, each
          followed immediately by an async per-block CNN forward (the CNN is
          frame-wise, so chunking is EXACT); block i+1's host->device transfer
          overlaps block i's compute. The sequential tail (BiLSTM + head +
          scaler + bridge + generator) runs once on the concatenated features.
          Two compiled programs regardless of video length: CNN at
          (1, frame_bucket, ...) and the tail per padded length bucket.

        mesh:
        * an optional `jax.sharding.Mesh` with a "data" axis (see
          `parallel/mesh.py::make_mesh`): `infer_batch` then shards the video
          batch over the mesh's data axis (params replicated, GSPMD inserts
          nothing — the computation is embarrassingly batch-parallel), scaling
          serving throughput across chips. Per-video outputs are exact vs the
          single-device run (everything is per-sample at inference).

        sequence_parallel:
        * True (requires `mesh`) — additionally shard the FRAME/TIME axis over
          the mesh's "model" axis, scaling single-request latency (not just
          batch throughput) across chips: the CNN is frame-wise, so frame
          sharding is embarrassingly parallel; the generator's time-axis convs
          run spatially partitioned (GSPMD inserts the halo exchanges); only
          the BiLSTM runs on the gathered (tiny, T x C) feature sequence.
          Outputs match the single-device run to float tolerance (mel exact;
          audio within ~1e-8 — conv halo reassociation). The TPU-native
          single-video scaling mode — the reference has no analogue (one GPU
          per video, `run_mri_video_inference.py:203-255`). Composes with the
          batch "data" axis: `infer_batch` on a (data, model) mesh shards
          batch AND time.
        """
        if input_norm not in ("none", "zscore_minmax"):
            raise ValueError(
                f"input_norm must be 'none' or 'zscore_minmax', got {input_norm!r}"
            )
        if sequence_parallel and mesh is None:
            raise ValueError("sequence_parallel=True requires a mesh")
        if sequence_parallel and not {"data", "model"} <= set(mesh.axis_names):
            raise ValueError(
                f"sequence_parallel needs a ('data', 'model') mesh "
                f"(parallel/mesh.py::make_mesh); got axes {mesh.axis_names}"
            )
        if sequence_parallel and streaming:
            raise ValueError(
                "sequence_parallel is a monolithic-dispatch mode; the "
                "streaming path already chunks the frame axis on the host"
            )
        self.acoustic_model = acoustic_model
        self.mesh = mesh
        self.sequence_parallel = bool(sequence_parallel)
        # device_put once; weights are passed as jit ARGUMENTS (closing over
        # them would embed tens of MB of literals in the HLO and stall
        # compilation, especially with remote compile)
        if mesh is not None:
            from mri2speech_tpu.parallel.mesh import replicate

            acoustic_variables = replicate(acoustic_variables, mesh)
            generator_params = replicate(generator_params, mesh)
        self.acoustic_variables = jax.device_put(acoustic_variables)
        self.generator = generator
        self.generator_params = jax.device_put(generator_params)
        self.mean = jnp.asarray(scaler.mean)
        self.std = jnp.asarray(scaler.std)
        self.hop_total = hop_total
        self.frame_bucket = max(1, int(frame_bucket))
        # In sequence-parallel mode the padded frame count must divide the
        # mesh "model" axis, or `_put_input` falls back to replicating the
        # full frame upload to every model chip — M x the bytes on the
        # link-bound serving path, erasing exactly the latency the mode
        # exists to win. Pad time to lcm(frame_bucket, M) so every request
        # shards (the extra frames are masked replicate-pad, same contract
        # as bucket padding).
        self._time_multiple = self.frame_bucket
        if self.sequence_parallel:
            m = int(mesh.shape["model"])
            self._time_multiple = (
                self.frame_bucket * m // int(np.gcd(self.frame_bucket, m))
            )
        self.input_norm = input_norm
        self.streaming = streaming
        self._fn = jax.jit(self._forward)
        self._cnn_fn = jax.jit(self._cnn_forward)
        self._tail_fn = jax.jit(self._tail_forward)

    @staticmethod
    def _normalize_frames(frames):
        """Per-frame z-score -> min-max [0,1] on device (frames (..., H, W)).

        Algebraic note: the z-score cancels exactly — min-max of
        (x-mean)/std equals (x - min(x)) / (max(x) - min(x)) since both are
        monotone affine maps of x. The two-step form is kept to mirror the
        reference (`run_mri_video_inference.py`) including its degenerate
        cases (constant frame -> 0), and XLA fuses the whole chain anyway.
        """
        f = frames.astype(jnp.float32)
        mean = jnp.mean(f, axis=(-2, -1), keepdims=True)
        std = jnp.std(f, axis=(-2, -1), keepdims=True)
        g = (f - mean) / jnp.where(std > 0, std, 1.0)
        lo = jnp.min(g, axis=(-2, -1), keepdims=True)
        hi = jnp.max(g, axis=(-2, -1), keepdims=True)
        return jnp.where(hi > lo, (g - lo) / jnp.where(hi > lo, hi - lo, 1.0), 0.0)

    def _seq_sharding(self, *spec):
        """NamedSharding over the pipeline mesh (sequence-parallel mode)."""
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(self.mesh, PartitionSpec(*spec))

    def _batch_axis_name(self, batch: int):
        """Shard the batch dim over "data" only when there is one to shard;
        a batch of 1 on a data>1 mesh would otherwise be padded with dead
        rows — replicating over "data" instead keeps every chip's model-axis
        work real."""
        return "data" if batch > 1 else None

    def _forward(self, acoustic_variables, generator_params, frames, mask):
        """frames (B, Tp, 1, H, W), mask (B, Tp) -> (audio, mel_db, mel_log)."""
        if self.sequence_parallel:
            # shard the raw frames first so the cast/normalise runs sharded too
            frames = jax.lax.with_sharding_constraint(
                frames,
                self._seq_sharding(self._batch_axis_name(frames.shape[0]), "model"),
            )
        if self.input_norm == "zscore_minmax":
            frames = self._normalize_frames(frames)
        else:
            frames = frames.astype(jnp.float32)
        if self.sequence_parallel:
            # frame-sharded CNN (embarrassingly parallel) -> all-gather the
            # tiny pooled features -> sequential BiLSTM + head
            B, Tp = frames.shape[0], frames.shape[1]
            feat_map = self.acoustic_model.apply(
                acoustic_variables, frames, train=False,
                method=AcousticModel.cnn_features,
            )  # (B*Tp, h, w, C)
            pooled = jnp.mean(feat_map, axis=(1, 2)).reshape(B, Tp, -1)
            pooled = jax.lax.with_sharding_constraint(
                pooled, self._seq_sharding(self._batch_axis_name(B))
            )
            pred_norm = self.acoustic_model.apply(
                acoustic_variables, pooled, mask, train=False,
                method=AcousticModel.head_from_pooled,
            )
        else:
            pred_norm = self.acoustic_model.apply(
                acoustic_variables, frames, train=False, mask=mask
            )  # (B, Tp, n_mels)
        return self._mel_to_audio(generator_params, pred_norm)

    def _cnn_forward(self, acoustic_variables, frames):
        """One frame block (1, Tc, 1, H, W) -> pooled features (1, Tc, C).

        Frame-wise and therefore exactly chunkable; dispatched asynchronously
        per block so upload of block i+1 overlaps compute of block i.
        """
        if self.input_norm == "zscore_minmax":
            frames = self._normalize_frames(frames)
        else:
            frames = frames.astype(jnp.float32)
        Tc = frames.shape[1]
        feat_map = self.acoustic_model.apply(
            acoustic_variables, frames, train=False,
            method=AcousticModel.cnn_features,
        )  # (Tc, h, w, C)
        return jnp.mean(feat_map, axis=(1, 2)).reshape(1, Tc, -1)

    def _tail_forward(self, acoustic_variables, generator_params, feat_blocks, mask):
        """Concatenated pooled features -> (audio, mel_db, mel_log)."""
        pooled = jnp.concatenate(feat_blocks, axis=1)
        pred_norm = self.acoustic_model.apply(
            acoustic_variables, pooled, mask, train=False,
            method=AcousticModel.head_from_pooled,
        )
        return self._mel_to_audio(generator_params, pred_norm)

    def _mel_to_audio(self, generator_params, pred_norm):
        mel_db = pred_norm * self.std + self.mean
        mel_log = mel_db_to_log_power(mel_db)
        x = jnp.swapaxes(mel_log, 1, 2)  # (1, n_mels, Tp)
        if self.sequence_parallel:
            # time-sharded generator: XLA's SPMD partitioner inserts the
            # halo exchanges the causal dilated convs need (exact)
            x = jax.lax.with_sharding_constraint(
                x,
                self._seq_sharding(
                    self._batch_axis_name(x.shape[0]), None, "model"
                ),
            )
        audio = self.generator.apply({"params": generator_params}, x)
        return audio, mel_db, mel_log

    def _put_input(self, x, time_axis: int | None = None):
        """device_put an input array consistently with the params' placement.

        On a mesh pipeline the params live replicated across the mesh; a
        batch-1 input on the default device alone would make jit raise
        "incompatible devices", so batch-1 inputs replicate over "data"
        (GSPMD then runs the batch-1 program redundantly on every chip —
        correct, and the mesh exists for `infer_batch` throughput anyway),
        while batched inputs shard their batch dim over "data".

        In sequence-parallel mode the TIME axis additionally uploads sharded
        over "model" (when divisible): each chip receives only its 1/M slice
        of the frames. Uploading replicated and resharding inside the jit
        would multiply the host->device bytes by the mesh size — on the
        link-bound serving path (BENCH_NOTES: the 33.5 MB upload IS the e2e
        budget) that would erase exactly the latency the mode exists to win.
        """
        if self.mesh is None:
            return jax.device_put(x)
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[0] = self._batch_axis_name(x.shape[0])
        if self.sequence_parallel and time_axis is not None:
            m = int(self.mesh.shape["model"])
            if x.shape[time_axis] % m == 0:
                spec[time_axis] = "model"
            else:
                # Unreachable through the product paths (prepare_inputs /
                # infer_batch pad time to a model-axis multiple); surface it
                # loudly if a caller bypasses them.
                import warnings

                warnings.warn(
                    f"sequence-parallel input with time dim "
                    f"{x.shape[time_axis]} not divisible by model={m}: "
                    f"uploading replicated ({m}x the host->device bytes)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        return jax.device_put(x, self._seq_sharding(*spec))

    def _run_device(self, frames: np.ndarray):
        """Dispatch the full pipeline; returns device arrays (audio, mels)."""
        f, mask = self.prepare_inputs(frames)
        if not self.streaming:
            return self._fn(
                self.acoustic_variables, self.generator_params,
                self._put_input(f, time_axis=1), self._put_input(mask, time_axis=1),
            )
        Tc = self.frame_bucket
        n_blocks = f.shape[1] // Tc
        mask_dev = self._put_input(mask)
        feats = []
        for i in range(n_blocks):
            # contiguous zero-copy host view -> async upload -> async CNN
            block = self._put_input(f[:, i * Tc : (i + 1) * Tc])
            feats.append(self._cnn_fn(self.acoustic_variables, block))
        return self._tail_fn(
            self.acoustic_variables, self.generator_params, tuple(feats), mask_dev
        )

    def __call__(self, frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """frames (T, H, W) float32 -> (audio (T*420,), mel_db (T,64), mel_log (T,64))."""
        audio, mel_db, mel_log = self._run_device(frames)
        T = frames.shape[0]
        # start all three device->host transfers before the first blocking
        # fetch: serial fetches pay ~26 ms tunnel round trip EACH
        prefetch_to_host(audio, mel_db, mel_log)
        audio = np.asarray(audio)[0, 0, : T * self.hop_total]
        return audio, np.asarray(mel_db)[0, :T], np.asarray(mel_log)[0, :T]

    def infer_audio(self, frames: np.ndarray) -> np.ndarray:
        """Serving path: frames -> waveform, fetching ONLY the audio back
        (mel artifacts stay on device — 1 device->host transfer instead of 3)."""
        audio, _, _ = self._run_device(frames)
        return np.asarray(audio)[0, 0, : frames.shape[0] * self.hop_total]

    def infer_batch(self, videos, batch_multiple: int = 1):
        """Batched serving: N videos -> (N waveforms, N mel_db arrays) in ONE
        fused dispatch.

        Production-throughput path beyond the reference's one-video-per-
        process loop (`run_mri_video_inference.py:203-255`): all videos are
        replicate-padded to the max bucket-multiple length and run as one
        batch. Batched throughput measured near-linear on the chip
        (BENCH_NOTES "batched serving": per-utterance device RTF
        0.00251/0.00257/0.00281 at batch 1/2/4).

        Contract: mel predictions at each video's valid frames are
        mask-EXACT vs a per-video run (BiLSTM mask); each waveform is
        trimmed to its own T*hop samples, and its final fraction of a
        second sees the batch's longer replicate-pad context instead of the
        solo run's (bounded by the generator's receptive field — see
        parity_notes "serving-tail padding effect"). Monolithic dispatch
        only; one compiled program per (batch, padded-length) bucket.

        batch_multiple: pad the batch dim to a multiple of this with
        fully-masked dummy rows (trimmed from the outputs) — lets a serving
        loop with varying request counts reuse one compiled program per
        length bucket instead of recompiling per batch size. On a mesh
        pipeline the batch additionally pads to a data-axis multiple.
        """
        videos = list(videos)
        if not videos:
            return [], []
        Ts = [int(v.shape[0]) for v in videos]
        hw = videos[0].shape[1:]
        tm = self._time_multiple
        Tp = ((max(Ts) + tm - 1) // tm) * tm
        bm = max(1, int(batch_multiple))
        if self.mesh is not None:
            nd = self.mesh.shape["data"]
            bm = bm * nd // np.gcd(bm, nd)
        # dummy rows replicate the last video's frames but carry an all-zero
        # mask; inference is per-sample, so real rows are unaffected
        B = ((len(videos) + bm - 1) // bm) * bm
        # Mixed-dtype batches promote (uint8 + float32 -> float32) instead of
        # silently truncating into videos[0]'s dtype — under "zscore_minmax"
        # the cast is EXACT (the per-frame z-score is affine-invariant, so
        # raw uint8 [0,255] and float [0,1] frames normalise identically).
        dt = videos[0].dtype
        if any(v.dtype != dt for v in videos):
            dt = np.result_type(*[v.dtype for v in videos])
        fb = np.empty((B, Tp, 1) + hw, dtype=dt)
        mb = np.zeros((B, Tp), dtype=np.float32)
        for i, v in enumerate(videos):
            if v.shape[1:] != hw:
                raise ValueError(
                    f"all videos in a batch must share the frame size; got "
                    f"{v.shape[1:]} vs {hw}"
                )
            fb[i, : Ts[i], 0] = v
            fb[i, Ts[i] :, 0] = v[-1]  # replicate-pad (masked in the BiLSTM)
            mb[i, : Ts[i]] = 1.0
        fb[len(videos):] = fb[len(videos) - 1]
        if self.mesh is not None:
            # batch over "data"; in sequence-parallel mode time additionally
            # uploads sharded over "model" (see _put_input)
            fb = self._put_input(fb, time_axis=1)
            mb = self._put_input(mb, time_axis=1)
        else:
            fb, mb = jnp.asarray(fb), jnp.asarray(mb)
        audio, mel_db, _ = self._fn(
            self.acoustic_variables, self.generator_params, fb, mb,
        )
        prefetch_to_host(audio, mel_db)
        audio = np.asarray(audio)
        mel_db = np.asarray(mel_db)
        return (
            [audio[i, 0, : t * self.hop_total] for i, t in enumerate(Ts)],
            [mel_db[i, :t] for i, t in enumerate(Ts)],
        )

    def prepare_inputs(self, frames: np.ndarray):
        """Host-side framing: pad to the bucket, build the validity mask.

        Keeps the input dtype (uint8 passes through untouched when
        input_norm="zscore_minmax" — the device casts and normalises). When T
        is already a bucket multiple the frame array is a zero-copy reshape
        view — no 30 MB host memcpy on the hot serving path.
        """
        T = frames.shape[0]
        tm = self._time_multiple
        Tp = ((T + tm - 1) // tm) * tm
        if Tp == T:
            f = frames.reshape(1, T, 1, *frames.shape[1:])  # view, no copy
        else:
            f = np.empty((1, Tp, 1) + frames.shape[1:], dtype=frames.dtype)
            f[0, :T, 0] = frames
            f[0, T:, 0] = frames[-1]  # replicate-pad (masked in the BiLSTM)
        mask = np.zeros((1, Tp), dtype=np.float32)
        mask[0, :T] = 1.0
        return f, mask

    def timed_run(self, frames: np.ndarray, sr: int = 11413, warmup: bool = True):
        """(audio, stats) with device-synchronised wall time and RTF.

        `warmup=True` runs once first so compilation is excluded from the RTF.
        """
        T = frames.shape[0]
        if warmup:
            self.infer_audio(frames)
        t0 = time.perf_counter()
        audio = self.infer_audio(frames)  # blocks on the audio fetch
        dt = time.perf_counter() - t0
        duration = len(audio) / sr
        return audio, {
            "frames": T,
            "seconds_audio": duration,
            "seconds_compute": dt,
            "rtf": dt / duration if duration > 0 else float("inf"),
        }


def build_pipeline_from_checkpoints(
    mri_checkpoint: str,
    scaler_json: str,
    hifigan_config: str,
    hifigan_checkpoint: str,
    *,
    n_mels: int = 64,
    rnn_hidden: int = 640,
    dropout: float = 0.5,
    frame_bucket: int = 64,
    fuse_mrf: bool = True,
    streaming: bool = False,
    input_norm: str = "none",
    quantize: bool = False,
    cnn_spec=None,
    cnn_stem=None,
    dtype=None,
    stem_s2d: bool = True,
    pad_ir: bool = True,
    mesh=None,
    sequence_parallel: bool = False,
) -> VideoToSpeechPipeline:
    from mri2speech_tpu.infer.vocoder_io import load_generator
    from mri2speech_tpu.models.vocoder import (
        Generator,
        default_fuse_mode,
        fuse_mrf_params,
    )
    from mri2speech_tpu.train import checkpoint as ckpt_io

    scaler = MelScaler.load(scaler_json)
    if scaler.n_mels != n_mels:
        raise ValueError("Scaler mean/std length does not match n_mels")

    model = AcousticModel(
        n_mels=n_mels, rnn_hidden=rnn_hidden, dropout=dropout, dtype=dtype,
        cnn_spec=cnn_spec, cnn_stem=cnn_stem,
        lstm_impl="pallas" if jax.default_backend() == "tpu" else "scan",
        # exact fp rewrites (stem: engages on even-sized 1ch frames; pad_ir:
        # zero-pads ir channels to 128-lane multiples — measured ~2.7 ms off
        # the CNN, probe_ir_pad.py); pass stem_s2d=False / pad_ir=False for a
        # serving path bit-for-bit with training's default layout
        stem_s2d=stem_s2d,
        pad_ir=pad_ir,
    )
    obj = ckpt_io.load_checkpoint_raw(mri_checkpoint)
    params = obj.get("params", obj.get("model_state_dict", obj))
    batch_stats = obj.get("batch_stats", {})
    variables = {"params": params, "batch_stats": batch_stats}

    generator, gen_params = load_generator(hifigan_config, hifigan_checkpoint, dtype=dtype)
    if fuse_mrf:
        try:
            mode = default_fuse_mode(generator.h)
            gen_params = fuse_mrf_params(gen_params, generator.h, mode=mode)
            generator = Generator(
                h=generator.h, use_weight_norm=False, fuse_mrf=True,
                fuse_mode=mode, quantize_mrf=quantize, dtype=dtype,
            )
        except ValueError:
            if quantize:
                generator = Generator(
                    h=generator.h, use_weight_norm=False, quantize_mrf=True,
                    dtype=dtype,
                )
            # non-'1' resblock configs fall back to the unfused stack
    elif quantize:
        generator = Generator(
            h=generator.h, use_weight_norm=False, quantize_mrf=True, dtype=dtype
        )
    # hop_total derives from the loaded config (the upsample-rate product),
    # NOT a hardcoded 420 — non-default HiFi-GAN configs would otherwise
    # silently mistrim the waveform
    hop_total = int(np.prod(generator.h["upsample_rates"]))
    return VideoToSpeechPipeline(
        model, variables, generator, gen_params, scaler,
        hop_total=hop_total, frame_bucket=frame_bucket, streaming=streaming,
        input_norm=input_norm, mesh=mesh, sequence_parallel=sequence_parallel,
    )


def save_outputs(audio, mel_db, output_dir: Path, sampling_rate: int, stem: str):
    """wav + mel .npy + mel .png artifact bundle (`run_mri_video_inference.py:166-184`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_dir.mkdir(parents=True, exist_ok=True)
    audio_path = output_dir / f"{stem}_generated.wav"
    write_wav_float(str(audio_path), audio, sampling_rate)
    mel_path = output_dir / f"{stem}_mel.npy"
    np.save(mel_path, mel_db)

    plt.figure(figsize=(12, 4))
    plt.imshow(mel_db.T, aspect="auto", origin="lower", cmap="viridis")
    plt.colorbar()
    plt.title(f"Generated Mel Spectrogram - {stem}")
    plt.xlabel("Time")
    plt.ylabel("Mel bins")
    plt.tight_layout()
    fig_path = output_dir / f"{stem}_mel.png"
    plt.savefig(fig_path, dpi=150)
    plt.close()
    return audio_path, mel_path, fig_path


def main() -> None:
    parser = argparse.ArgumentParser(
        description="rtMRI -> Speech inference (acoustic model + HiFi-GAN, fused on TPU)"
    )
    parser.add_argument("--video", required=True)
    parser.add_argument("--mri-checkpoint", required=True)
    parser.add_argument("--scaler-json", required=True)
    parser.add_argument("--hifigan-config", required=True)
    parser.add_argument("--hifigan-checkpoint", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--n-mels", type=int, default=64)
    parser.add_argument("--rnn-hidden", type=int, default=640)
    parser.add_argument("--dropout", type=float, default=0.5)
    parser.add_argument("--frame-bucket", type=int, default=64)
    parser.add_argument(
        "--streaming", action="store_true",
        help="Chunk the frame upload and overlap host->device transfer with "
             "per-block CNN compute (bit-identical output; lower latency when "
             "transfer and compute are comparable).",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="int8-quantized vocoder MRF convs (LOSSY opt-in serving mode; "
             "~1.4%% waveform rel-L2 vs the exact path measured on RANDOM "
             "weights/mels — dynamic activation scales make the error "
             "distribution-dependent, so validate on your own checkpoint; "
             "see ops/quant.py and docs/BENCH_NOTES.md).",
    )
    parser.add_argument(
        "--no-stem-s2d", action="store_true",
        help="Disable the space-to-depth stem rewrite (exact fp reordering; "
             "disable for a serving path bit-for-bit with training's layout).",
    )
    parser.add_argument(
        "--no-pad-ir", action="store_true",
        help="Disable the 128-lane ir-stage zero-padding (exact fp "
             "reordering; disable for the canonical training layout).",
    )
    parser.add_argument(
        "--num-devices", type=int, default=1,
        help="Data-parallel mesh width (replicates this single-video run; "
             "mainly for parity with m2s-serve — batch throughput scaling "
             "lives in infer_batch/the daemon).",
    )
    parser.add_argument(
        "--model-devices", type=int, default=1,
        help="Shard the frame/time axis over an M-chip model axis "
             "(sequence-parallel serving: single-video latency scales across "
             "chips; mel exact, audio within ~1e-8 of single-device).",
    )
    parser.add_argument(
        "--profile-dir", default=None,
        help="Capture a TensorBoard-loadable profiler trace (device + host "
             "XPlane) of the timed inference pass into this directory.",
    )
    args = parser.parse_args()

    if args.streaming and args.model_devices > 1:
        parser.error("--streaming chunks the frame axis on the host; "
                     "--model-devices shards it on the mesh — pick one")

    video_path = Path(args.video)
    if not video_path.exists():
        raise FileNotFoundError(f"Video file not found: {video_path}")

    frames = load_video_frames_for_inference(video_path, max_frames=args.max_frames)
    mesh = None
    if args.num_devices > 1 or args.model_devices > 1:
        from mri2speech_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.num_devices, n_model=args.model_devices)
    pipeline = build_pipeline_from_checkpoints(
        args.mri_checkpoint, args.scaler_json, args.hifigan_config,
        args.hifigan_checkpoint, n_mels=args.n_mels, rnn_hidden=args.rnn_hidden,
        dropout=args.dropout, frame_bucket=args.frame_bucket,
        streaming=args.streaming, quantize=args.int8,
        stem_s2d=not args.no_stem_s2d, pad_ir=not args.no_pad_ir,
        mesh=mesh, sequence_parallel=args.model_devices > 1,
    )
    with open(args.hifigan_config, "r", encoding="utf-8") as f:
        sr = json.load(f)["sampling_rate"]
    # first pass warms the compile AND fetches the mel artifacts; the timed
    # pass then skips its own warmup — 2 device passes total instead of 3
    # (each discarded pass costs a full fused dispatch + a multi-MB fetch on
    # a remote-tunnel host)
    audio, mel_db, mel_log = pipeline(frames)
    if args.profile_dir:
        from mri2speech_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            audio, stats = pipeline.timed_run(frames, sr=sr, warmup=False)
        print(f"[PROFILE] trace written to {args.profile_dir}")
    else:
        audio, stats = pipeline.timed_run(frames, sr=sr, warmup=False)
    stem = video_path.stem
    output_dir = Path(args.output_dir)
    audio_path, mel_path, fig_path = save_outputs(audio, mel_db, output_dir, sr, stem)
    log_mel_path = output_dir / f"{stem}_mel_log.npy"
    np.save(log_mel_path, mel_log)

    print("[DONE] Inference complete.")
    print(f"  RTF   : {stats['rtf']:.4f} ({stats['seconds_compute']:.2f}s for {stats['seconds_audio']:.2f}s audio)")
    print(f"  Audio : {audio_path}")
    print(f"  Mel   : {mel_path}")
    print(f"  LogMel: {log_mel_path}")
    print(f"  Figure: {fig_path}")


if __name__ == "__main__":
    main()
