"""Online (bounded-latency) streaming video -> speech inference.

A serving capability BEYOND the reference: the reference inference script is
strictly offline — it loads the whole video, then runs the whole model
(`scripts/run_mri_video_inference.py:203-255`). Here frames are PUSHED
incrementally and audio is EMITTED incrementally with a bounded, configurable
algorithmic latency, while staying numerically faithful to the offline
pipeline (`infer/pipeline.py`):

* **CNN** — frame-wise, so chunked evaluation is exact.
* **Forward LSTM** — the (h, c) carry is threaded across chunks
  (`models/lstm.py::lstm_direction(init_state=..., return_state=True)`);
  bit-identical to the offline scan.
* **Backward LSTM** — the only non-causal part of the model. Approximated
  with an R-frame lookahead: each emitted chunk's backward recurrence is
  seeded with the zero state R frames in the future. The error decays
  ~exponentially in R (forget-gate products); R -> stream length recovers the
  offline output EXACTLY, and the final chunks of any stream are exact
  regardless of R because the drain's masked frames hold the zero carry until
  the last real frame (the offline boundary condition).
* **Generator** — windowed with the exact dependency cone computed from the
  architecture (`models/vocoder.py::generator_receptive_field`). Every emitted
  audio sample's cone of mel dependencies lies inside its window of real mel
  context, so the windowed run computes the exact same taps as the offline
  run: audio equals offline output wherever the mels do. The single
  exception is the last <=6 samples of the entire stream (conv_post's
  right-pad zeros are literal zeros offline but computed activations in the
  final window) — ~0.5 ms at sr=11413, asserted in tests.

Five compiled programs total, independent of stream length: CNN chunk, mel
chunk (LSTM+head+scaler+bridge), generator prefix window, generator steady
window, and a FUSED steady-state tail (mel chunk + generator window in ONE
dispatch). Worst-case algorithmic latency = (r + g + 1) chunks where r/g are
the lookahead / generator-right-cone chunk counts (`latency_frames`).

Tunnel-latency design (round 4): through a ~50 ms/dispatch link the per-chunk
cost was ~85% dispatch overhead (3 dispatches + synchronous fetches,
docs/BENCH_NOTES.md). Steady state now costs TWO dispatches — CNN (kept
separate so the next chunk's upload overlaps the previous chunk's tail
compute) and the fused tail — and all host fetches are deferred to the end of
`push()`, so a bulk push pipelines every chunk's device work back-to-back.

Not supported: a quantized generator (its dynamic int8 activation scales are
window-dependent, which would break the windowing exactness contract).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.models.lstm import lstm_direction
from mri2speech_tpu.models.vocoder import generator_receptive_field
from mri2speech_tpu.ops.mel import mel_db_to_log_power
from mri2speech_tpu.ops.scaler import MelScaler
from mri2speech_tpu.utils.transfer import prefetch_to_host


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class OnlineVideoToSpeech:
    """Incremental rtMRI-video -> speech with bounded latency.

    Usage::

        online = OnlineVideoToSpeech(model, variables, gen, gen_params, scaler,
                                     chunk=16, lookahead=16)
        for block in frame_source:          # (n, H, W) arrays, any n
            audio, mel_db = online.push(block)
            play(audio)
        audio, mel_db = online.flush()      # drain; exact tail
    """

    def __init__(
        self,
        acoustic_model: AcousticModel,
        acoustic_variables: dict,
        generator,
        generator_params: dict,
        scaler: MelScaler,
        *,
        chunk: int = 16,
        lookahead: int = 16,
        input_norm: str = "none",
        max_inflight_chunks: int = 64,
    ) -> None:
        if chunk < 1:
            raise ValueError("chunk must be >= 1")
        if lookahead < 0:
            raise ValueError("lookahead must be >= 0")
        if max_inflight_chunks < 1:
            raise ValueError("max_inflight_chunks must be >= 1")
        if input_norm not in ("none", "zscore_minmax"):
            raise ValueError(
                f"input_norm must be 'none' or 'zscore_minmax', got {input_norm!r}"
            )
        if getattr(generator, "quantize_mrf", False):
            raise ValueError(
                "online mode requires a non-quantized generator (dynamic int8 "
                "activation scales are window-dependent)"
            )
        self.acoustic_model = acoustic_model
        self.acoustic_variables = jax.device_put(acoustic_variables)
        self.generator = generator
        self.generator_params = jax.device_put(generator_params)
        self.mean = jnp.asarray(scaler.mean)
        self.std = jnp.asarray(scaler.std)
        self.input_norm = input_norm

        # bounds device-memory high-water on bulk pushes: push() pre-uploads
        # chunks and defers host fetches, so without a cap a whole-video push
        # would hold every frame chunk + every output on device at once
        self.max_inflight_chunks = int(max_inflight_chunks)
        self.W = int(chunk)
        self.r = _ceil_div(int(lookahead), self.W)  # backward-LSTM lookahead chunks
        left, right = generator_receptive_field(generator.h)
        self.l = _ceil_div(left, self.W)   # generator left-context chunks
        self.g = _ceil_div(right, self.W)  # generator lookahead chunks
        self.K = self.l + 1 + self.g       # generator window, in chunks
        hop = 1
        for u in generator.h["upsample_rates"]:
            hop *= int(u)
        self.hop = hop

        self._cnn_fn = jax.jit(self._cnn)
        self._mel_fn = jax.jit(self._mel_step)
        self._gen_prefix_fn = jax.jit(functools.partial(self._gen, prefix=True))
        self._gen_steady_fn = jax.jit(functools.partial(self._gen, prefix=False))
        self._tail_fn = jax.jit(self._tail_step)
        self.reset()

    @classmethod
    def from_pipeline(cls, pipeline, **kwargs) -> "OnlineVideoToSpeech":
        """Build from an offline `VideoToSpeechPipeline` (shares its loaded
        models/params; same checkpoints as `build_pipeline_from_checkpoints`)."""
        scaler = MelScaler(
            mean=np.asarray(pipeline.mean), std=np.asarray(pipeline.std)
        )
        kwargs.setdefault("input_norm", pipeline.input_norm)
        return cls(
            pipeline.acoustic_model,
            pipeline.acoustic_variables,
            pipeline.generator,
            pipeline.generator_params,
            scaler,
            **kwargs,
        )

    def fork(self) -> "OnlineVideoToSpeech":
        """A fresh stream over the SAME models/params/compiled programs.

        All mutable stream state lives in instance fields that `reset()`
        initialises and the jitted programs receive as arguments, so forks
        are independent streams while the five compiled programs (and their
        jit caches — bound to this instance) are shared: a serving daemon
        can run many concurrent sessions with zero per-session recompiles.
        """
        new = object.__new__(OnlineVideoToSpeech)
        new.__dict__.update(self.__dict__)
        new.reset()
        return new

    # -- properties --------------------------------------------------------
    @property
    def latency_frames(self) -> int:
        """Worst-case frames between pushing frame f and receiving its audio
        (steady state; the very first emission additionally waits for the
        generator's left context to fill)."""
        return (self.r + self.g + 1) * self.W

    # -- lifecycle ---------------------------------------------------------
    def reset(self) -> None:
        H = self.acoustic_model.rnn_hidden
        self._h = jnp.zeros((1, H), jnp.float32)
        self._c = jnp.zeros((1, H), jnp.float32)
        self._pending: list = []        # raw frames not yet forming a chunk
        self._pending_count = 0
        self._feat_chunks: list = []    # [(device (1,W,C), np mask (W,))]
        self._mel_chunks: list = []     # device (1,W,M) masked mel_log
        self._mel_base = 0              # absolute chunk index of _mel_chunks[0]
        self._n_mel_chunks = 0
        self._n_audio_chunks = 0        # audio emitted through chunk index-1
        self._t_real = 0                # real frames pushed so far
        self._mel_frames_out = 0        # valid mel frames already returned
        self._audio_samples_out = 0     # valid audio samples already returned
        self._frame_hw: Optional[tuple] = None
        self._frame_dtype = None
        self._finished = False

    # -- jitted programs ---------------------------------------------------
    def _cnn(self, variables, frames):
        """(1, W, 1, H, W) frames -> (1, W, C) pooled features (frame-wise)."""
        from mri2speech_tpu.infer.pipeline import VideoToSpeechPipeline

        if self.input_norm == "zscore_minmax":
            frames = VideoToSpeechPipeline._normalize_frames(frames)
        else:
            frames = frames.astype(jnp.float32)
        feat_map = self.acoustic_model.apply(
            variables, frames, train=False, method=AcousticModel.cnn_features
        )
        return jnp.mean(feat_map, axis=(1, 2)).reshape(1, frames.shape[1], -1)

    def _mel_step(self, variables, feat_chunks, mask, h, c):
        """Emit mels for the OLDEST chunk of an (r+1)-chunk feature window.

        feat_chunks: (r+1)-tuple of (1, W, C); mask (1, (r+1)*W) 1=real.
        Forward scans the first W frames seeded with the carried (h, c);
        backward scans the whole window from the zero state (the R-frame
        lookahead approximation — exact under drain masks). Returns
        (mel_db (1,W,M), masked mel_log (1,W,M), h', c').
        """
        p = variables["params"]["rnn"]
        feats = jnp.concatenate(feat_chunks, axis=1)
        W = self.W
        fwd, (h2, c2) = lstm_direction(
            feats[:, :W], p["w_ih_fwd"], p["w_hh_fwd"], p["b_fwd"],
            mask=mask[:, :W], init_state=(h, c), return_state=True,
        )
        bwd = lstm_direction(
            feats, p["w_ih_bwd"], p["w_hh_bwd"], p["b_bwd"],
            reverse=True, mask=mask,
        )
        y = fwd + bwd[:, :W]
        hp = variables["params"]["head"]
        pred = (y @ hp["kernel"] + hp["bias"]).astype(jnp.float32)
        mel_db = pred * self.std + self.mean
        mel_log = mel_db_to_log_power(mel_db) * mask[:, :W, None]
        return mel_db, mel_log, h2, c2

    def _gen(self, generator_params, mel_chunks, *, prefix: bool):
        """K-chunk mel_log window -> audio slice.

        prefix=True: the window IS the stream start (the generator's internal
        left-zero-padding is the true boundary condition) -> emit chunks
        [0, l+1). prefix=False: emit the window's (l+1)-th chunk only; its
        dependency cone lies strictly inside the window.
        """
        mel = jnp.concatenate(mel_chunks, axis=1)       # (1, K*W, M)
        x = jnp.swapaxes(mel, 1, 2)
        audio = self.generator.apply({"params": generator_params}, x)
        s = self.W * self.hop
        if prefix:
            return audio[:, :, : (self.l + 1) * s]
        return audio[:, :, self.l * s : (self.l + 1) * s]

    def _tail_step(self, variables, generator_params, feat_chunks, mask, h, c,
                   mel_context):
        """FUSED steady-state tail: mel emission + generator window, one
        program. `mel_context` is the K-1 most recent emitted mel chunks; the
        K-th (newest) is computed here from the feature window, so the whole
        LSTM -> head -> scaler -> dB-bridge -> generator tail is ONE dispatch
        (the offline pipeline's single-program property, ported to steady
        streaming). Identical math to `_mel_step` + `_gen(prefix=False)`.
        """
        mel_db, mel_log, h2, c2 = self._mel_step(variables, feat_chunks, mask, h, c)
        mel = jnp.concatenate(tuple(mel_context) + (mel_log,), axis=1)  # (1, K*W, M)
        x = jnp.swapaxes(mel, 1, 2)
        audio = self.generator.apply({"params": generator_params}, x)
        s = self.W * self.hop
        return mel_db, mel_log, h2, c2, audio[:, :, self.l * s : (self.l + 1) * s]

    # -- streaming engine --------------------------------------------------
    def _process_chunk(self, frames_np, mask_np: np.ndarray, out):
        """One W-frame chunk through CNN -> (maybe) mel emission -> (maybe)
        audio emission(s); outputs appended to `out` as DEVICE arrays (host
        fetches are deferred to `_collect`, so multi-chunk pushes pipeline).

        frames_np: (W, H, W') host array, or an already-uploaded device array
        of shape (1, W, 1, H, W') (`push` pre-uploads so chunk i+1's transfer
        overlaps chunk i's tail compute)."""
        if isinstance(frames_np, np.ndarray):
            frames_np = jnp.asarray(frames_np[None, :, None])
        feats = self._cnn_fn(self.acoustic_variables, frames_np)
        self._feat_chunks.append((feats, mask_np))

        # fused steady-state fast path: this chunk completes the feature
        # window (one mel emission) AND exactly one steady audio chunk
        # becomes due — the common case after the lookahead fills
        j = self._n_audio_chunks
        lo = j - self.l - self._mel_base
        if (
            len(self._feat_chunks) == self.r + 1
            and j >= 1
            and self._n_mel_chunks + 1 == j + self.g + 1
            and lo >= 0
            and len(self._mel_chunks) - lo == self.K - 1
        ):
            window = tuple(f for f, _ in self._feat_chunks)
            masks = np.concatenate([m for _, m in self._feat_chunks])
            mel_db, mel_log, self._h, self._c, audio = self._tail_fn(
                self.acoustic_variables, self.generator_params, window,
                jnp.asarray(masks[None]), self._h, self._c,
                tuple(self._mel_chunks[lo:]),
            )
            emitted_mask = self._feat_chunks.pop(0)[1]
            self._mel_chunks.append(mel_log)
            self._n_mel_chunks += 1
            n_valid = int(emitted_mask.sum())
            if n_valid:
                out["mel"].append((mel_db, n_valid))
                self._mel_frames_out += n_valid
            self._n_audio_chunks = j + 1
            span_lo = j * self.W * self.hop
            end = min((j + 1) * self.W, self._t_real) * self.hop
            if end > self._audio_samples_out:
                out["audio"].append(
                    (audio, self._audio_samples_out - span_lo, end - span_lo)
                )
                self._audio_samples_out = end
            while self._mel_base < self._n_audio_chunks - self.l:
                self._mel_chunks.pop(0)
                self._mel_base += 1
            return

        if len(self._feat_chunks) >= self.r + 1:
            window = tuple(f for f, _ in self._feat_chunks)
            masks = np.concatenate([m for _, m in self._feat_chunks])
            mel_db, mel_log, self._h, self._c = self._mel_fn(
                self.acoustic_variables, window, jnp.asarray(masks[None]),
                self._h, self._c,
            )
            emitted_mask = self._feat_chunks[0][1]
            self._feat_chunks.pop(0)
            self._mel_chunks.append(mel_log)
            self._n_mel_chunks += 1
            # return the valid rows of this chunk (real frames are a prefix
            # of the stream, so valid rows are wherever mask==1)
            n_valid = int(emitted_mask.sum())
            if n_valid:
                out["mel"].append((mel_db, n_valid))
                self._mel_frames_out += n_valid

        self._emit_audio(out)
        # drop mel chunks no longer needed as left context
        while self._mel_base < self._n_audio_chunks - self.l:
            self._mel_chunks.pop(0)
            self._mel_base += 1

    def _emit_audio(self, out) -> None:
        while True:
            j = self._n_audio_chunks
            if j == 0:
                if self._n_mel_chunks < self.K:
                    return
                audio = self._gen_prefix_fn(
                    self.generator_params, tuple(self._mel_chunks[: self.K])
                )
                emitted_through = self.l + 1
            else:
                if self._n_mel_chunks < j + self.g + 1:
                    return
                lo = j - self.l - self._mel_base
                audio = self._gen_steady_fn(
                    self.generator_params,
                    tuple(self._mel_chunks[lo : lo + self.K]),
                )
                emitted_through = j + 1
            self._n_audio_chunks = emitted_through
            # this emission's global sample span; trim to real frames
            span_lo = (
                emitted_through - (self.l + 1 if j == 0 else 1)
            ) * self.W * self.hop
            end = min(emitted_through * self.W, self._t_real) * self.hop
            if end > self._audio_samples_out:
                out["audio"].append(
                    (audio, self._audio_samples_out - span_lo, end - span_lo)
                )
                self._audio_samples_out = end

    def push(self, frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Feed (n, H, W) frames (any n >= 0); returns (audio, mel_db) newly
        available — possibly empty arrays while the lookahead fills."""
        if self._finished:
            raise RuntimeError("stream finished; call reset() first")
        frames = np.asarray(frames)
        if frames.ndim != 3:
            raise ValueError(f"expected (n, H, W) frames, got {frames.shape}")
        if self._frame_hw is None:
            self._frame_hw = frames.shape[1:]
            self._frame_dtype = frames.dtype
        elif frames.shape[1:] != self._frame_hw:
            raise ValueError(
                f"frame size changed mid-stream: {frames.shape[1:]} vs "
                f"{self._frame_hw}"
            )
        out = {"audio": [], "mel": []}
        self._t_real += frames.shape[0]
        if self._pending_count + frames.shape[0] < self.W:
            if frames.shape[0]:
                self._pending.append(frames)
                self._pending_count += frames.shape[0]
            return self._collect(out)
        # one concat, then slice W-frame chunks out of it (no O(n^2) recopy
        # of the remainder on bulk pushes)
        buf = np.concatenate(self._pending + [frames], axis=0)
        self._pending, self._pending_count = [], 0
        ones = np.ones(self.W, np.float32)
        # pre-upload chunks before processing: device_put is async, so chunk
        # i+1's host->device transfer rides the link while chunk i's CNN +
        # fused tail execute (on the tunnel the upload is a large fraction of
        # the per-chunk budget). Grouped in windows of max_inflight_chunks so
        # a whole-video push can't hold every frame chunk + every deferred
        # output on device simultaneously (pipelining only overlaps adjacent
        # chunks, so a bounded window keeps the full overlap win).
        n_chunks = buf.shape[0] // self.W
        G = self.max_inflight_chunks
        for g0 in range(0, n_chunks, G):
            devs = [
                jax.device_put(buf[i * self.W : (i + 1) * self.W][None, :, None])
                for i in range(g0, min(g0 + G, n_chunks))
            ]
            for d in devs:
                self._process_chunk(d, ones, out)
            if g0 + G < n_chunks:
                # group boundary: materialise outputs to host, releasing the
                # group's device buffers before the next group uploads
                prefetch_to_host(*
                    [a for a, _, _ in out["audio"]] + [m for m, _ in out["mel"]]
                )
                out["audio"] = [
                    (np.asarray(a), s0, s1) for a, s0, s1 in out["audio"]
                ]
                out["mel"] = [(np.asarray(m), n) for m, n in out["mel"]]
        pos = n_chunks * self.W
        if pos < buf.shape[0]:
            self._pending = [buf[pos:]]
            self._pending_count = buf.shape[0] - pos
        return self._collect(out)

    def flush(self) -> Tuple[np.ndarray, np.ndarray]:
        """Drain the stream: emits everything remaining. The drain's masked
        chunks make the final frames' backward LSTM exact (see module doc)."""
        if self._finished:
            return np.zeros((0,), np.float32), np.zeros((0, 0), np.float32)
        out = {"audio": [], "mel": []}
        if self._pending_count:
            buf = np.concatenate(self._pending, axis=0)
            pad = self.W - buf.shape[0]
            chunk = np.concatenate([buf, np.repeat(buf[-1:], pad, axis=0)], axis=0)
            mask = np.concatenate(
                [np.ones(buf.shape[0], np.float32), np.zeros(pad, np.float32)]
            )
            self._pending, self._pending_count = [], 0
            self._process_chunk(chunk, mask, out)
        if self._t_real:
            limit = self.r + self.g + self.K + 2
            # match the stream dtype so the drain reuses the compiled CNN
            zeros = np.zeros((self.W,) + self._frame_hw, dtype=self._frame_dtype)
            for _ in range(limit):
                if (
                    self._audio_samples_out >= self._t_real * self.hop
                    and self._mel_frames_out >= self._t_real
                ):
                    break
                self._process_chunk(zeros, np.zeros(self.W, np.float32), out)
        self._finished = True
        return self._collect(out)

    def _collect(self, out):
        """Fetch the push's accumulated DEVICE outputs in one pass at the end:
        entries are (audio (1,1,S), s0, s1) / (mel_db (1,W,M), n_valid) —
        deferring the device->host sync here lets a multi-chunk push dispatch
        every chunk before the first fetch blocks. All transfers are started
        with copy_to_host_async before any np.asarray blocks: through the
        axon tunnel each BLOCKING fetch pays a full ~26 ms round trip
        serially, while prefetched transfers ride the link concurrently
        (measured 16 fetches: ~410 ms serial -> ~60-100 ms prefetched)."""
        prefetch_to_host(*
            [a for a, _, _ in out["audio"]] + [m for m, _ in out["mel"]]
        )
        audio = (
            np.concatenate([np.asarray(a)[0, 0][s0:s1] for a, s0, s1 in out["audio"]])
            if out["audio"]
            else np.zeros((0,), np.float32)
        )
        mel = (
            np.concatenate([np.asarray(m)[0, :n] for m, n in out["mel"]], axis=0)
            if out["mel"]
            else np.zeros((0, int(self.mean.shape[0])), np.float32)
        )
        return audio, mel


def main() -> None:
    """CLI: simulate real-time streaming of a video file through the online
    path — emits the wav and reports per-chunk wall time vs the real-time
    budget (the offline equivalent of this surface is `infer.pipeline:main`)."""
    import argparse
    import json
    import time
    from pathlib import Path

    from mri2speech_tpu.data.audio_io import (
        load_video_frames_for_inference,
        write_wav_float,
    )
    from mri2speech_tpu.infer.pipeline import build_pipeline_from_checkpoints

    ap = argparse.ArgumentParser(
        description="rtMRI -> Speech ONLINE streaming inference "
        "(bounded-latency incremental emission)"
    )
    ap.add_argument("--video", required=True)
    ap.add_argument("--mri-checkpoint", required=True)
    ap.add_argument("--scaler-json", required=True)
    ap.add_argument("--hifigan-config", required=True)
    ap.add_argument("--hifigan-checkpoint", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--chunk", type=int, default=16, help="frames per push")
    ap.add_argument(
        "--lookahead", type=int, default=16,
        help="backward-LSTM lookahead frames (exactness/latency trade)",
    )
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    video = Path(args.video)
    if not video.exists():
        raise FileNotFoundError(f"Video file not found: {video}")
    frames = load_video_frames_for_inference(video, max_frames=args.max_frames)

    pipe = build_pipeline_from_checkpoints(
        args.mri_checkpoint, args.scaler_json, args.hifigan_config,
        args.hifigan_checkpoint,
    )
    online = OnlineVideoToSpeech.from_pipeline(
        pipe, chunk=args.chunk, lookahead=args.lookahead, input_norm="none"
    )
    with open(args.hifigan_config, "r", encoding="utf-8") as f:
        sr = json.load(f)["sampling_rate"]
    budget = args.chunk * online.hop / sr

    # warm the five compiled programs (enough chunks that the prefix AND the
    # steady generator windows both run), then stream for real
    warm_n = min(len(frames), online.latency_frames + (online.l + 1) * online.W)
    online.push(frames[:warm_n])
    online.flush()
    online.reset()

    pieces, times = [], []
    for i in range(0, frames.shape[0], args.chunk):
        t0 = time.perf_counter()
        audio, _ = online.push(frames[i : i + args.chunk])
        times.append(time.perf_counter() - t0)
        pieces.append(audio)
    audio, _ = online.flush()
    pieces.append(audio)
    wav = np.concatenate(pieces)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    wav_path = out_dir / f"{video.stem}_online.wav"
    write_wav_float(str(wav_path), wav, sr)

    med = float(np.median(times))
    print("[DONE] Online streaming inference complete.")
    print(f"  Audio    : {wav_path} ({wav.size / sr:.2f}s)")
    print(f"  Chunk    : {args.chunk} frames ({budget * 1000:.0f} ms budget)")
    print(f"  Median   : {med * 1000:.1f} ms/chunk -> steady RTF {med / budget:.3f}")
    print(f"  Worst    : {max(times) * 1000:.1f} ms/chunk")
    print(f"  Latency  : {online.latency_frames} frames "
          f"({online.latency_frames * online.hop / sr:.2f}s algorithmic)")


if __name__ == "__main__":
    main()
