"""Production serving daemon: HTTP video->speech with dynamic request batching.

A serving surface the reference does not have (its product path is one video
per process run, `scripts/run_mri_video_inference.py:203-255`). Design:

* one `VideoToSpeechPipeline` (optionally mesh-sharded) owned by a single
  dispatch thread — JAX dispatch stays single-threaded by construction;
* dynamic batching: concurrent requests that arrive within `batch_window_ms`
  of each other run as ONE fused `infer_batch` dispatch, padded to a
  `batch_multiple` so the serving loop reuses one compiled program per
  length bucket instead of recompiling per request count;
* stdlib-only HTTP front (ThreadingHTTPServer): POST /synthesize with an
  .npy frames body -> WAV bytes; GET /healthz for liveness/stats. No web
  framework dependency — the host side is deliberately thin; the work is
  in the fused XLA program.

Protocol
--------
POST /synthesize
    body: a serialized numpy array (np.save bytes), shape (T, H, W),
    dtype uint8 (with input_norm="zscore_minmax") or float32.
    response: 200, audio/wav (16-bit PCM), headers X-Frames / X-Audio-Samples
    / X-Batched-With (how many requests shared the dispatch).
GET /healthz
    response: 200, application/json with cumulative stats.
GET /metrics
    response: 200, Prometheus text format — request/failure/batch counters,
    request-latency histogram, active-stream gauge.

With `--online` (or `serve(..., online=engine)`) the bounded-latency
streaming mode (`infer/online.py`) is additionally served as HTTP sessions —
push frames as they are captured, receive PCM as it becomes available:

POST /stream/start                    -> {session, chunk, latency_frames,
                                          sampling_rate}
POST /stream/<id>/push  (npy (n,H,W)) -> raw <f4 PCM newly emitted
POST /stream/<id>/finish              -> remaining PCM; session ends
DELETE /stream/<id>                   -> abort

Sessions are `OnlineVideoToSpeech.fork()`s: independent stream state over
SHARED compiled programs (zero per-session compiles), serialized onto the
device by one dispatch lock.
"""
from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np


class BatchingInferenceServer:
    """Collects concurrent synthesis requests into fused batched dispatches.

    Thread contract: any number of threads may call `synthesize()`; exactly
    one worker thread talks to the pipeline.
    """

    def __init__(
        self,
        pipeline,
        *,
        max_batch: int = 8,
        batch_window_ms: float = 10.0,
        batch_multiple: int = 1,
        dispatch_lock: Optional[threading.Lock] = None,
    ) -> None:
        """dispatch_lock: share one lock with other device users (the
        streaming session manager) so 'exactly one thread talks to the
        device' holds across ALL serving surfaces, not just within each."""
        self.pipeline = pipeline
        self.max_batch = max(1, int(max_batch))
        self.batch_window_s = max(0.0, float(batch_window_ms)) / 1000.0
        self.batch_multiple = max(1, int(batch_multiple))
        self._dispatch = dispatch_lock or threading.Lock()
        self._queue: "queue.Queue[Optional[Tuple[np.ndarray, Future, float]]]" = queue.Queue()
        self._stats_lock = threading.Lock()
        self.requests_served = 0
        self.batches_dispatched = 0
        self.requests_failed = 0
        # request latency (enqueue -> result set): histogram buckets in
        # seconds + running sum/count, Prometheus-convention cumulative
        self._lat_bounds = (0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)
        self._lat_counts = [0] * (len(self._lat_bounds) + 1)
        self._lat_sum = 0.0
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def synthesize(self, frames: np.ndarray, timeout: Optional[float] = None):
        """Blocking: frames (T, H, W) -> (audio float32 (T*hop,), mel_db (T, n_mels),
        n_batched). Raises whatever the pipeline raised for this request."""
        if frames.ndim != 3 or frames.shape[0] == 0:
            with self._stats_lock:
                self.requests_failed += 1
            raise ValueError(
                f"frames must be (T, H, W) with T >= 1; got shape "
                f"{frames.shape}"
            )  # reject up front: one bad request must not fail its co-batch
        fut: Future = Future()
        self._queue.put((frames, fut, time.monotonic()))
        return fut.result(timeout=timeout)

    def shutdown(self) -> None:
        self._queue.put(None)
        self._worker.join(timeout=30)

    def _collect(self) -> Optional[List[Tuple[np.ndarray, Future]]]:
        """Block for the first request, then sweep the window for companions."""
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.batch_window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-post the poison pill for after this batch
                break
            batch.append(item)
        return batch

    def _record_latencies(self, batch) -> None:
        now = time.monotonic()
        with self._stats_lock:
            for _, _, t0 in batch:
                dt = now - t0
                self._lat_sum += dt
                i = 0
                while i < len(self._lat_bounds) and dt > self._lat_bounds[i]:
                    i += 1
                self._lat_counts[i] += 1

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            videos = [frames for frames, _, _ in batch]
            try:
                with self._dispatch:
                    audios, mels = self.pipeline.infer_batch(
                        videos, batch_multiple=self.batch_multiple
                    )
            except Exception as exc:  # surface the failure to every waiter
                with self._stats_lock:
                    self.requests_failed += len(batch)
                for _, fut, _ in batch:
                    if not fut.cancelled():
                        fut.set_exception(exc)
                continue
            # latencies recorded BEFORE results release the waiters, so a
            # client that immediately scrapes /metrics sees a histogram
            # count consistent with requests_served
            self._record_latencies(batch)
            with self._stats_lock:
                self.requests_served += len(batch)
                self.batches_dispatched += 1
            for (_, fut, _), audio, mel in zip(batch, audios, mels):
                if not fut.cancelled():
                    fut.set_result((audio, mel, len(batch)))

    def stats(self) -> dict:
        with self._stats_lock:
            return {
                "status": "ok",
                "requests_served": self.requests_served,
                "requests_failed": self.requests_failed,
                "batches_dispatched": self.batches_dispatched,
                "max_batch": self.max_batch,
                "batch_window_ms": self.batch_window_s * 1000.0,
                "batch_multiple": self.batch_multiple,
                "latency_seconds_sum": self._lat_sum,
            }

    def prometheus_metrics(self, active_streams: Optional[int] = None) -> str:
        """Cumulative counters + request-latency histogram in the Prometheus
        text exposition format (scrape GET /metrics)."""
        with self._stats_lock:
            lines = [
                "# TYPE m2s_requests_served_total counter",
                f"m2s_requests_served_total {self.requests_served}",
                "# TYPE m2s_requests_failed_total counter",
                f"m2s_requests_failed_total {self.requests_failed}",
                "# TYPE m2s_batches_dispatched_total counter",
                f"m2s_batches_dispatched_total {self.batches_dispatched}",
                "# TYPE m2s_request_latency_seconds histogram",
            ]
            cum = 0
            for bound, n in zip(self._lat_bounds, self._lat_counts):
                cum += n
                lines.append(
                    f'm2s_request_latency_seconds_bucket{{le="{bound}"}} {cum}'
                )
            cum += self._lat_counts[-1]
            lines.append(f'm2s_request_latency_seconds_bucket{{le="+Inf"}} {cum}')
            lines.append(f"m2s_request_latency_seconds_sum {self._lat_sum}")
            lines.append(f"m2s_request_latency_seconds_count {cum}")
        if active_streams is not None:
            lines += [
                "# TYPE m2s_active_streams gauge",
                f"m2s_active_streams {active_streams}",
            ]
        return "\n".join(lines) + "\n"


class StreamingSessionManager:
    """Concurrent online-streaming sessions over one engine's compiled programs.

    Each session is an `OnlineVideoToSpeech.fork()` — independent stream
    state, shared jit caches, so N concurrent callers cost zero extra
    compiles. Device work is serialized by one dispatch lock (same
    single-dispatch-thread principle as `BatchingInferenceServer`); the
    registry lock only guards the session table. Sessions idle past
    `idle_timeout_s` are reaped when new ones start.
    """

    def __init__(
        self,
        engine,
        *,
        max_sessions: int = 8,
        idle_timeout_s: float = 600.0,
        dispatch_lock: Optional[threading.Lock] = None,
    ) -> None:
        self.engine = engine
        self.max_sessions = max(1, int(max_sessions))
        self.idle_timeout_s = float(idle_timeout_s)
        self._sessions: dict = {}
        self._registry = threading.Lock()
        # shared with the batching worker when both surfaces serve one
        # device (see `serve`): exactly one thread dispatches at a time
        self._dispatch = dispatch_lock or threading.Lock()
        self._next_id = 0

    def _reap_locked(self) -> None:
        now = time.monotonic()
        dead = [
            sid for sid, s in self._sessions.items()
            if now - s["last"] > self.idle_timeout_s
        ]
        for sid in dead:
            del self._sessions[sid]

    def start(self) -> dict:
        with self._registry:
            self._reap_locked()
            if len(self._sessions) >= self.max_sessions:
                raise RuntimeError(
                    f"session limit reached ({self.max_sessions}); finish or "
                    f"abort an active stream first"
                )
            self._next_id += 1
            sid = f"s{self._next_id:08d}"
            self._sessions[sid] = {
                "engine": self.engine.fork(),
                "lock": threading.Lock(),
                "last": time.monotonic(),
            }
        e = self.engine
        return {
            "session": sid,
            "chunk": e.W,
            "latency_frames": e.latency_frames,
        }

    def _get(self, sid: str):
        with self._registry:
            s = self._sessions.get(sid)
            if s is None:
                raise KeyError(sid)
            s["last"] = time.monotonic()
            return s

    def push(self, sid: str, frames: np.ndarray):
        s = self._get(sid)
        with s["lock"], self._dispatch:
            return s["engine"].push(frames)

    def finish(self, sid: str):
        s = self._get(sid)
        try:
            with s["lock"], self._dispatch:
                return s["engine"].flush()
        finally:
            # the session ends either way — a failed drain must not leak a
            # slot holding broken stream state
            with self._registry:
                self._sessions.pop(sid, None)

    def abort(self, sid: str) -> None:
        with self._registry:
            if self._sessions.pop(sid, None) is None:
                raise KeyError(sid)

    def active(self) -> int:
        with self._registry:
            return len(self._sessions)


def wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    """float32 [-1, 1] -> 16-bit PCM WAV bytes (in memory)."""
    from scipy.io.wavfile import write

    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    write(buf, sr, pcm)
    return buf.getvalue()


def make_handler(server: BatchingInferenceServer, sr: int, streams=None):
    """HTTP routes. `streams` (a `StreamingSessionManager`) adds the online
    session protocol:

    POST /stream/start                 -> JSON {session, chunk,
                                          latency_frames, sampling_rate}
    POST /stream/<id>/push   (npy (n,H,W) body)
                                       -> raw float32 little-endian PCM newly
                                          emitted (may be empty while the
                                          lookahead fills); headers
                                          X-Audio-Samples / X-Mel-Frames
    POST /stream/<id>/finish           -> drain: remaining PCM; session ends
    DELETE /stream/<id>                -> abort
    """
    class Handler(BaseHTTPRequestHandler):
        # silence per-request stderr logging (single-core host)
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, code: int, body: bytes, ctype: str, headers=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path in ("/healthz", "/health"):
                stats = server.stats()
                if streams is not None:
                    stats["active_streams"] = streams.active()
                self._reply(200, json.dumps(stats).encode(), "application/json")
            elif self.path == "/metrics":
                body = server.prometheus_metrics(
                    streams.active() if streams is not None else None
                ).encode()
                self._reply(200, body, "text/plain; version=0.0.4")
            else:
                self._reply(404, b"not found", "text/plain")

        def _read_body(self) -> bytes:
            length = int(self.headers.get("Content-Length", "0"))
            return self.rfile.read(length)

        def _stream_post(self):
            if streams is None:
                self._reply(404, b"streaming not enabled", "text/plain")
                return
            parts = self.path.strip("/").split("/")
            try:
                if parts == ["stream", "start"]:
                    self._read_body()
                    info = dict(streams.start(), sampling_rate=sr)
                    self._reply(200, json.dumps(info).encode(),
                                "application/json")
                    return
                if len(parts) == 3 and parts[0] == "stream":
                    sid, op = parts[1], parts[2]
                    if op == "push":
                        frames = np.load(io.BytesIO(self._read_body()),
                                         allow_pickle=False)
                        audio, mel = streams.push(sid, frames)
                    elif op == "finish":
                        self._read_body()
                        audio, mel = streams.finish(sid)
                    else:
                        self._reply(404, b"not found", "text/plain")
                        return
                    body = np.ascontiguousarray(
                        audio.astype("<f4", copy=False)
                    ).tobytes()
                    self._reply(200, body, "application/octet-stream", headers=(
                        ("X-Audio-Samples", str(audio.shape[0])),
                        ("X-Mel-Frames", str(mel.shape[0])),
                    ))
                    return
                self._reply(404, b"not found", "text/plain")
            except KeyError:
                self._reply(404, b"unknown session", "text/plain")
            except RuntimeError as exc:
                code = 429 if "session limit" in str(exc) else 400
                self._reply(code, str(exc).encode(), "text/plain")
            except Exception as exc:
                self._reply(400, f"{type(exc).__name__}: {exc}".encode(),
                            "text/plain")

        def do_DELETE(self):  # noqa: N802
            parts = self.path.strip("/").split("/")
            if streams is not None and len(parts) == 2 and parts[0] == "stream":
                try:
                    streams.abort(parts[1])
                    self._reply(200, b"aborted", "text/plain")
                except KeyError:
                    self._reply(404, b"unknown session", "text/plain")
                return
            self._reply(404, b"not found", "text/plain")

        def do_POST(self):  # noqa: N802
            if self.path.startswith("/stream/"):
                self._stream_post()
                return
            if self.path != "/synthesize":
                self._reply(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                frames = np.load(io.BytesIO(self.rfile.read(length)),
                                 allow_pickle=False)
                audio, _mel, n_batched = server.synthesize(frames)
            except Exception as exc:
                self._reply(400, f"{type(exc).__name__}: {exc}".encode(),
                            "text/plain")
                return
            body = wav_bytes(audio, sr)
            self._reply(200, body, "audio/wav", headers=(
                ("X-Frames", str(frames.shape[0])),
                ("X-Audio-Samples", str(len(audio))),
                ("X-Batched-With", str(n_batched)),
            ))

    return Handler


def serve(pipeline, sr: int, host: str = "127.0.0.1", port: int = 8571,
          online=None, max_sessions: int = 8, idle_timeout_s: float = 600.0,
          **batch_kw) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever() or use the
    CLI below). The batching server is attached as `.inference`; passing an
    `OnlineVideoToSpeech` as `online` enables the /stream session protocol
    (attached as `.streams`)."""
    shared_lock = threading.Lock()
    inference = BatchingInferenceServer(
        pipeline, dispatch_lock=shared_lock, **batch_kw
    )
    streams = (
        StreamingSessionManager(
            online, max_sessions=max_sessions, idle_timeout_s=idle_timeout_s,
            dispatch_lock=shared_lock,
        )
        if online is not None else None
    )
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(inference, sr, streams=streams)
    )
    httpd.inference = inference
    httpd.streams = streams
    return httpd


def main() -> None:
    parser = argparse.ArgumentParser(
        description="rtMRI->speech HTTP serving daemon with dynamic batching"
    )
    parser.add_argument(
        "--exported", default=None,
        help="serve from a frozen AOT artifact directory (m2s-export-serving) "
             "instead of checkpoints — loads NO model code; checkpoint/mesh/"
             "uint8 flags are then ignored (the artifact froze those choices)",
    )
    parser.add_argument("--mri-checkpoint")
    parser.add_argument("--scaler-json")
    parser.add_argument("--hifigan-config")
    parser.add_argument("--hifigan-checkpoint")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8571)
    parser.add_argument("--frame-bucket", type=int, default=64)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--batch-window-ms", type=float, default=10.0)
    parser.add_argument(
        "--batch-multiple", type=int, default=0,
        help="Pad dispatches to this batch multiple (0 = max-batch: one "
             "compiled program per length bucket).",
    )
    parser.add_argument(
        "--num-devices", type=int, default=1,
        help="Shard request batches over an N-chip data-parallel mesh.",
    )
    parser.add_argument(
        "--model-devices", type=int, default=1,
        help="Additionally shard each request's frame/time axis over an "
             "M-chip model axis (sequence-parallel serving: single-request "
             "latency scales across chips; mel exact, audio within ~1e-8 of "
             "single-device). Total chips = num-devices x model-devices.",
    )
    parser.add_argument(
        "--uint8", action="store_true",
        help="Accept raw uint8 frames and normalise on device "
             "(reference inference normalisation, 4x less request traffic).",
    )
    parser.add_argument(
        "--sampling-rate", type=int, default=None,
        help="WAV sampling rate override when serving --exported (default: "
             "the rate recorded in the artifact manifest, else 11413; "
             "checkpoint mode reads it from the HiFi-GAN config)",
    )
    parser.add_argument(
        "--online", action="store_true",
        help="additionally serve the bounded-latency streaming session "
             "protocol (/stream/...); requires checkpoint mode (the online "
             "engine needs the model graph, not a frozen program)",
    )
    parser.add_argument("--online-chunk", type=int, default=16,
                        help="frames per streaming chunk")
    parser.add_argument("--online-lookahead", type=int, default=16,
                        help="backward-LSTM lookahead frames (exactness "
                             "decays exponentially; see infer/online.py)")
    parser.add_argument("--max-sessions", type=int, default=8)
    args = parser.parse_args()

    if args.online and args.exported:
        parser.error("--online requires checkpoint mode (not --exported): "
                     "the streaming engine windows the model graph itself")

    if args.exported:
        from mri2speech_tpu.infer.export import load_exported_pipeline

        pipeline = load_exported_pipeline(args.exported)
        sr = args.sampling_rate or pipeline.sampling_rate or 11413
    else:
        required = ("mri_checkpoint", "scaler_json", "hifigan_config",
                    "hifigan_checkpoint")
        missing = [k for k in required if getattr(args, k) is None]
        if missing:
            parser.error(
                "without --exported these are required: "
                + ", ".join("--" + k.replace("_", "-") for k in missing)
            )
        from mri2speech_tpu.infer.pipeline import build_pipeline_from_checkpoints

        if args.online and args.model_devices > 1:
            # before make_mesh: on a small host the mesh construction would
            # otherwise raise a device-count traceback that hides the real
            # flag conflict
            parser.error("--online sessions window the frame axis on the host "
                         "already; --model-devices applies to batch dispatches "
                         "(drop one of the two)")
        mesh = None
        if args.num_devices > 1 or args.model_devices > 1:
            from mri2speech_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_data=args.num_devices, n_model=args.model_devices)
        pipeline = build_pipeline_from_checkpoints(
            args.mri_checkpoint, args.scaler_json, args.hifigan_config,
            args.hifigan_checkpoint, frame_bucket=args.frame_bucket, mesh=mesh,
            input_norm="zscore_minmax" if args.uint8 else "none",
            sequence_parallel=args.model_devices > 1,
        )
        with open(args.hifigan_config, "r", encoding="utf-8") as f:
            sr = json.load(f)["sampling_rate"]
    online = None
    if args.online:
        from mri2speech_tpu.infer.online import OnlineVideoToSpeech

        online = OnlineVideoToSpeech.from_pipeline(
            pipeline, chunk=args.online_chunk, lookahead=args.online_lookahead
        )
    httpd = serve(
        pipeline, sr, host=args.host, port=args.port,
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
        batch_multiple=args.batch_multiple or args.max_batch,
        online=online, max_sessions=args.max_sessions,
    )
    print(f"[serving] http://{args.host}:{args.port}  "
          f"(max_batch={args.max_batch}, window={args.batch_window_ms}ms)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.inference.shutdown()
        httpd.server_close()


if __name__ == "__main__":
    main()
