"""AOT serving artifacts: freeze the fused video->speech program to disk.

A production-deployment subsystem the reference has no analogue of (its
serving story is "check out the repo, import torch + timm + the model code,
load state dicts" — `scripts/run_mri_video_inference.py:119-148`). Here the
entire fused serving computation (on-device normalisation + acoustic
CNN/BiLSTM + scaler denorm + dB->ln-power bridge + HiFi-GAN generator) is
exported with `jax.export` as serialized StableHLO, one program per
(batch, padded-frames) bucket — exactly the program grid a
`BatchingInferenceServer` deployment dispatches over.

Why this is the TPU-native shape of "model packaging":

* **No model code at load time.** `load_exported_pipeline` needs jax + numpy
  only — no flax modules, no fuse/fold transforms, no config plumbing. The
  artifact is the program, not a recipe for rebuilding it.
* **The program is frozen.** What was parity-tested is byte-for-byte what
  serves: later refactors of the model code cannot silently change a
  deployed endpoint (jax.export also refuses artifacts whose calling
  convention the runtime no longer supports).
* **Multi-platform.** `platforms=("tpu", "cpu")` lowers once for both, so
  the same artifact serves on a chip and smoke-tests on a dev CPU.
* Params stay ARGUMENTS (separate msgpack sidecar), not baked constants —
  the same no-literals rule the live pipeline follows (tens of MB of HLO
  literals stall remote compilation), and it keeps the artifact refreshable
  with a new checkpoint without re-export.

Artifact layout (a directory):
    manifest.json                    shapes, dtypes, hop_total, jax version
    params.msgpack                   {"acoustic": variables, "generator": params}
    programs/fwd_b{B}_t{Tp}.bin      serialized jax.export.Exported per bucket
    programs/fwd_symbolic.bin        shape-polymorphic program (see below)
    programs/mel_to_audio.bin        vocoder-only program (ln-power mel ->
                                     audio, symbolic batch+time) — the frozen
                                     `inference_e2e.py` / `m2s-infer-mels` path

Beyond the concrete bucket grid, the artifact carries ONE shape-polymorphic
program exported with symbolic (batch, time) dimensions
(`jax.export.symbolic_shape("n, {frame_bucket}*b")`): the whole fused
computation — the lax.scan BiLSTM, the x420 conv-transpose generator, the
masked reductions — traces under symbolic dimension arithmetic and is
bit-identical to the concrete programs (probe: tools/probe_symbolic_export.py).
The loader uses concrete buckets when one fits and falls back to the
symbolic program for ANY other (batch, frames), so an artifact can never
strand a request shape; each new concrete shape still triggers one XLA
compile at serve time (shape refinement), which is what the bucket
discipline + the persistent compile cache bound.

The exported call signature is `(acoustic_variables, generator_params,
frames, mask) -> (audio, mel_db, mel_log)` — identical to the live
pipeline's `_forward`, so `ExportedPipeline` is a drop-in for
`VideoToSpeechPipeline` everywhere serving code touches it (`__call__`,
`infer_audio`, `infer_batch`; the HTTP daemon accepts either).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

MANIFEST_NAME = "manifest.json"
PARAMS_NAME = "params.msgpack"
PROGRAMS_DIR = "programs"
SYMBOLIC_NAME = "fwd_symbolic.bin"
MEL_PROGRAM_NAME = "mel_to_audio.bin"
_FORMAT_VERSION = 1


def _program_name(batch: int, frames: int) -> str:
    return f"fwd_b{batch}_t{frames}.bin"


def export_pipeline(
    pipeline,
    out_dir,
    *,
    batch_sizes: Sequence[int] = (1,),
    frame_buckets: Optional[Sequence[int]] = None,
    frame_shape: Tuple[int, int] = (256, 256),
    frames_dtype=None,
    platforms: Optional[Sequence[str]] = None,
    symbolic: bool = True,
    sampling_rate: Optional[int] = None,
) -> Path:
    """Export a `VideoToSpeechPipeline`'s fused program grid to `out_dir`.

    batch_sizes / frame_buckets: the (B, Tp) grid to freeze. Tp values must
    be multiples of the pipeline's `frame_bucket` (they are the PADDED
    lengths the serving path actually dispatches); default is one bucket.
    frames_dtype: dtype of the frames input (uint8 with
    input_norm="zscore_minmax" for the 4x-smaller upload, else float32).
    platforms: lowering targets, e.g. ("tpu", "cpu"); default = current
    backend only.
    symbolic: additionally export one shape-polymorphic program with
    symbolic (batch, time) dims — the loader's fallback for any request
    shape outside the concrete grid.
    """
    import jax.numpy as jnp
    from flax import serialization

    if frame_buckets is None:
        frame_buckets = (pipeline.frame_bucket,)
    if frames_dtype is None:
        frames_dtype = (
            jnp.uint8 if pipeline.input_norm == "zscore_minmax" else jnp.float32
        )
    frames_dtype = jnp.dtype(frames_dtype)
    for tp in frame_buckets:
        if tp % pipeline.frame_bucket != 0:
            raise ValueError(
                f"frame bucket {tp} is not a multiple of the pipeline's "
                f"frame_bucket={pipeline.frame_bucket}"
            )

    out = Path(out_dir)
    (out / PROGRAMS_DIR).mkdir(parents=True, exist_ok=True)

    avars = jax.device_get(pipeline.acoustic_variables)
    gparams = jax.device_get(pipeline.generator_params)
    avars_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), avars
    )
    gparams_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), gparams
    )

    h, w = frame_shape
    programs = []
    plats = tuple(platforms) if platforms is not None else None
    for b in sorted(set(int(x) for x in batch_sizes)):
        for tp in sorted(set(int(x) for x in frame_buckets)):
            exp = jax.export.export(jax.jit(pipeline._forward), platforms=plats)(
                avars_spec,
                gparams_spec,
                jax.ShapeDtypeStruct((b, tp, 1, h, w), frames_dtype),
                jax.ShapeDtypeStruct((b, tp), jnp.float32),
            )
            name = _program_name(b, tp)
            (out / PROGRAMS_DIR / name).write_bytes(exp.serialize())
            programs.append({"batch": b, "frames": tp, "file": name})

    symbolic_file = None
    if symbolic:
        scope = jax.export.SymbolicScope()
        n, t = jax.export.symbolic_shape(
            f"n, {pipeline.frame_bucket}*b", scope=scope
        )
        exp = jax.export.export(jax.jit(pipeline._forward), platforms=plats)(
            avars_spec,
            gparams_spec,
            jax.ShapeDtypeStruct((n, t, 1, h, w), frames_dtype),
            jax.ShapeDtypeStruct((n, t), jnp.float32),
        )
        (out / PROGRAMS_DIR / SYMBOLIC_NAME).write_bytes(exp.serialize())
        symbolic_file = SYMBOLIC_NAME

    # vocoder-only program: ln-power mel (n, M, t) -> audio — the frozen
    # equivalent of `m2s-infer-mels` (`inference_e2e.py` in the reference),
    # so precomputed/exported mels synthesize from the same artifact
    n_mels = int(np.shape(pipeline.mean)[0])

    def _mel_only(generator_params, mel_log):
        return pipeline.generator.apply({"params": generator_params}, mel_log)

    scope = jax.export.SymbolicScope()
    n, t = jax.export.symbolic_shape("n, t", scope=scope)
    exp = jax.export.export(jax.jit(_mel_only), platforms=plats)(
        gparams_spec, jax.ShapeDtypeStruct((n, n_mels, t), jnp.float32)
    )
    (out / PROGRAMS_DIR / MEL_PROGRAM_NAME).write_bytes(exp.serialize())

    with open(out / PARAMS_NAME, "wb") as f:
        f.write(
            serialization.msgpack_serialize(
                {"acoustic": avars, "generator": gparams}
            )
        )
    manifest = {
        "format_version": _FORMAT_VERSION,
        "programs": programs,
        "symbolic_program": symbolic_file,
        "mel_program": MEL_PROGRAM_NAME,
        "n_mels": n_mels,
        # recorded so a deployed daemon tags WAVs correctly without the
        # operator re-supplying the model's rate
        "sampling_rate": int(sampling_rate) if sampling_rate else None,
        "hop_total": int(pipeline.hop_total),
        "frame_bucket": int(pipeline.frame_bucket),
        "input_norm": pipeline.input_norm,
        "frame_shape": [int(h), int(w)],
        "frames_dtype": frames_dtype.name,
        "platforms": list(plats) if plats is not None else [jax.default_backend()],
        "jax_version": jax.__version__,
    }
    with open(out / MANIFEST_NAME, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    return out


class ExportedPipeline:
    """Serve from a frozen artifact directory — no model code involved.

    Drop-in for `VideoToSpeechPipeline` on the serving surfaces
    (`__call__` / `infer_audio` / `infer_batch`, hence also
    `BatchingInferenceServer` and the HTTP daemon). Dispatch picks the
    smallest exported (batch, frames) bucket that fits the request — falling
    back to the shape-polymorphic program for shapes outside the grid — and
    pads with replicate-frames + zero-mask rows, the same mask-exact contract
    as the live pipeline (BiLSTM is mask-exact; only the generator's ~10-frame
    lookahead sees the padding, bounding any effect to the final fraction of
    a second — see `VideoToSpeechPipeline.infer_batch`).
    """

    def __init__(self, artifact_dir) -> None:
        from flax import serialization

        self.dir = Path(artifact_dir)
        with open(self.dir / MANIFEST_NAME, "r", encoding="utf-8") as f:
            self.manifest = json.load(f)
        if self.manifest.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported artifact format_version="
                f"{self.manifest.get('format_version')!r} (loader supports "
                f"{_FORMAT_VERSION})"
            )
        self.hop_total = int(self.manifest["hop_total"])
        self.frame_bucket = int(self.manifest["frame_bucket"])
        self.input_norm = self.manifest["input_norm"]
        self.frames_dtype = np.dtype(self.manifest["frames_dtype"])
        self.sampling_rate = self.manifest.get("sampling_rate")
        with open(self.dir / PARAMS_NAME, "rb") as f:
            params = serialization.msgpack_restore(f.read())
        self._avars = jax.device_put(params["acoustic"])
        self._gparams = jax.device_put(params["generator"])
        # (batch, frames) -> lazily deserialized jit(exported.call)
        self._buckets = sorted(
            (int(p["batch"]), int(p["frames"]), p["file"])
            for p in self.manifest["programs"]
        )
        self._symbolic_file = self.manifest.get("symbolic_program")
        self._calls = {}

    def _load_call(self, key, fname):
        if key not in self._calls:
            exp = jax.export.deserialize(
                (self.dir / PROGRAMS_DIR / fname).read_bytes()
            )
            self._calls[key] = jax.jit(exp.call)
        return self._calls[key]

    def _call_for(self, batch: int, frames: int):
        """Smallest exported bucket fitting the request, else the symbolic
        program padded to the next frame-bucket multiple."""
        for b, tp, fname in self._buckets:  # sorted: smallest fitting wins
            if b >= batch and tp >= frames:
                return (b, tp), self._load_call((b, tp), fname)
        if self._symbolic_file is not None:
            fb = self.frame_bucket
            tp = ((frames + fb - 1) // fb) * fb
            return (batch, tp), self._load_call("symbolic", self._symbolic_file)
        raise ValueError(
            f"no exported program fits batch={batch}, frames={frames}; "
            f"available (batch, frames) buckets: "
            f"{[(b, t) for b, t, _ in self._buckets]} and no symbolic "
            f"program in the artifact — re-export with larger "
            f"batch_sizes/frame_buckets or symbolic=True"
        )

    def _pack(self, videos, batch: int, frames: int):
        """Replicate-pad videos into a (batch, frames, 1, H, W) block + mask."""
        hw = tuple(videos[0].shape[1:])
        if list(hw) != list(self.manifest["frame_shape"]):
            raise ValueError(
                f"frame size {hw} does not match the exported "
                f"{tuple(self.manifest['frame_shape'])}"
            )
        if self.frames_dtype == np.uint8:
            for v in videos:
                if v.dtype != np.uint8:
                    raise ValueError(
                        f"artifact expects raw uint8 frames (it normalises "
                        f"on device); got {v.dtype} — silently casting "
                        f"float frames to uint8 would truncate them"
                    )
        fb = np.empty((batch, frames, 1) + hw, dtype=self.frames_dtype)
        mb = np.zeros((batch, frames), dtype=np.float32)
        for i, v in enumerate(videos):
            if v.shape[1:] != hw:
                raise ValueError(
                    f"all videos in a batch must share the frame size; got "
                    f"{v.shape[1:]} vs {hw}"
                )
            if v.shape[0] == 0:
                raise ValueError("videos must have at least one frame")
            t = v.shape[0]
            fb[i, :t, 0] = v
            fb[i, t:, 0] = v[-1]
            mb[i, :t] = 1.0
        fb[len(videos):] = fb[len(videos) - 1]
        return fb, mb

    def _run(self, videos, batch_multiple: int = 1):
        Ts = [int(v.shape[0]) for v in videos]
        bm = max(1, int(batch_multiple))
        b_req = ((len(videos) + bm - 1) // bm) * bm
        (b, tp), call = self._call_for(b_req, max(Ts))
        fb, mb = self._pack(videos, b, tp)
        audio, mel_db, mel_log = call(self._avars, self._gparams, fb, mb)
        return Ts, audio, mel_db, mel_log

    def __call__(self, frames: np.ndarray):
        """frames (T, H, W) -> (audio (T*hop,), mel_db (T, n_mels), mel_log)."""
        Ts, audio, mel_db, mel_log = self._run([frames])
        t = Ts[0]
        return (
            np.asarray(audio)[0, 0, : t * self.hop_total],
            np.asarray(mel_db)[0, :t],
            np.asarray(mel_log)[0, :t],
        )

    def infer_audio(self, frames: np.ndarray) -> np.ndarray:
        Ts, audio, _, _ = self._run([frames])
        return np.asarray(audio)[0, 0, : Ts[0] * self.hop_total]

    def mel_to_audio(self, mel_log: np.ndarray) -> np.ndarray:
        """ln-power mel (n_mels, T) or (n, n_mels, T) -> float32 audio
        ((T*hop,) / (n, T*hop)) through the frozen vocoder-only program —
        the artifact's `m2s-infer-mels` (`inference_e2e.py`) equivalent."""
        fname = self.manifest.get("mel_program")
        if fname is None:
            raise ValueError(
                "artifact has no mel_to_audio program; re-export with the "
                "current exporter"
            )
        mel = np.asarray(mel_log, dtype=np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        if mel.shape[1] != self.manifest.get("n_mels", mel.shape[1]):
            raise ValueError(
                f"mel has {mel.shape[1]} bins; artifact expects "
                f"{self.manifest['n_mels']}"
            )
        call = self._load_call("mel", fname)
        audio = np.asarray(call(self._gparams, mel))[:, 0, :]
        return audio[0] if squeeze else audio

    def infer_batch(self, videos, batch_multiple: int = 1):
        """N videos -> (N waveforms, N mel_db) in one frozen fused dispatch.

        On a concrete bucket the effective padding is the exported batch
        bucket (>= both the request and `batch_multiple`); on the symbolic
        fallback the batch pads to `batch_multiple`, so the
        one-compiled-program-per-bucket property holds either way.
        """
        videos = list(videos)
        if not videos:
            return [], []
        Ts, audio, mel_db, _ = self._run(videos, batch_multiple=batch_multiple)
        audio = np.asarray(audio)
        mel_db = np.asarray(mel_db)
        return (
            [audio[i, 0, : t * self.hop_total] for i, t in enumerate(Ts)],
            [mel_db[i, :t] for i, t in enumerate(Ts)],
        )


def load_exported_pipeline(artifact_dir) -> ExportedPipeline:
    return ExportedPipeline(artifact_dir)


def main() -> None:
    """CLI: freeze serving checkpoints into an AOT artifact (m2s-export-serving)."""
    import argparse

    from mri2speech_tpu.infer.pipeline import build_pipeline_from_checkpoints

    parser = argparse.ArgumentParser(
        description="Export the fused serving program grid to a frozen "
        "jax.export artifact directory (servable without model code)."
    )
    parser.add_argument("--mri-checkpoint", required=True)
    parser.add_argument("--scaler-json", required=True)
    parser.add_argument("--hifigan-config", required=True)
    parser.add_argument("--hifigan-checkpoint", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--frame-bucket", type=int, default=64)
    parser.add_argument(
        "--batch-sizes", default="1,8",
        help="comma-separated batch buckets to freeze (default 1,8)",
    )
    parser.add_argument(
        "--frame-buckets", default=None,
        help="comma-separated padded frame counts (multiples of "
             "--frame-bucket); default = one frame_bucket",
    )
    parser.add_argument(
        "--platforms", default=None,
        help="comma-separated lowering targets, e.g. tpu,cpu "
             "(default: current backend)",
    )
    parser.add_argument(
        "--uint8", action="store_true",
        help="freeze the raw-uint8 + on-device-normalisation input contract",
    )
    parser.add_argument(
        "--no-symbolic", action="store_true",
        help="skip the shape-polymorphic fallback program (requests outside "
             "the concrete bucket grid will then be rejected)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="freeze the int8-quantized vocoder MRF program (LOSSY opt-in, "
             "same caveats as m2s-infer-video --int8)",
    )
    parser.add_argument(
        "--verify", action="store_true",
        help="reload the artifact and check it against the live pipeline "
             "on a random video (reports max |diff|)",
    )
    args = parser.parse_args()

    pipeline = build_pipeline_from_checkpoints(
        args.mri_checkpoint, args.scaler_json, args.hifigan_config,
        args.hifigan_checkpoint, frame_bucket=args.frame_bucket,
        input_norm="zscore_minmax" if args.uint8 else "none",
        quantize=args.int8,
        # the frozen program must not bake in a backend-specific kernel
        # choice when lowering for multiple platforms; scan lowers everywhere
    )
    batch_sizes = [int(x) for x in args.batch_sizes.split(",")]
    frame_buckets = (
        [int(x) for x in args.frame_buckets.split(",")]
        if args.frame_buckets else None
    )
    platforms = args.platforms.split(",") if args.platforms else None
    with open(args.hifigan_config, "r", encoding="utf-8") as f:
        sampling_rate = json.load(f).get("sampling_rate")
    out = export_pipeline(
        pipeline, args.output_dir, batch_sizes=batch_sizes,
        frame_buckets=frame_buckets, platforms=platforms,
        symbolic=not args.no_symbolic, sampling_rate=sampling_rate,
    )
    n = len(json.load(open(out / MANIFEST_NAME))["programs"])
    print(f"[exported] {n} program(s) -> {out}")

    if args.verify:
        loaded = load_exported_pipeline(out)
        rng = np.random.default_rng(0)
        t = loaded.frame_bucket
        video = rng.random((t,) + tuple(loaded.manifest["frame_shape"]))
        video = (
            (video * 255).astype(np.uint8) if args.uint8
            else video.astype(np.float32)
        )
        a_live = pipeline.infer_audio(video)
        a_froz = loaded.infer_audio(video)
        print(f"[verify] max |audio diff| = {np.abs(a_live - a_froz).max():.3e}")


if __name__ == "__main__":
    main()
