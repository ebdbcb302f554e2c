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
    ) -> None:
        self.pipeline = pipeline
        self.max_batch = max(1, int(max_batch))
        self.batch_window_s = max(0.0, float(batch_window_ms)) / 1000.0
        self.batch_multiple = max(1, int(batch_multiple))
        self._queue: "queue.Queue[Optional[Tuple[np.ndarray, Future]]]" = queue.Queue()
        self._stats_lock = threading.Lock()
        self.requests_served = 0
        self.batches_dispatched = 0
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def synthesize(self, frames: np.ndarray, timeout: Optional[float] = None):
        """Blocking: frames (T, H, W) -> (audio float32 (T*hop,), mel_db (T, n_mels),
        n_batched). Raises whatever the pipeline raised for this request."""
        if frames.ndim != 3:
            raise ValueError(f"frames must be (T, H, W); got shape {frames.shape}")
        fut: Future = Future()
        self._queue.put((frames, fut))
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

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            videos = [frames for frames, _ in batch]
            try:
                audios, mels = self.pipeline.infer_batch(
                    videos, batch_multiple=self.batch_multiple
                )
            except Exception as exc:  # surface the failure to every waiter
                for _, fut in batch:
                    if not fut.cancelled():
                        fut.set_exception(exc)
                continue
            with self._stats_lock:
                self.requests_served += len(batch)
                self.batches_dispatched += 1
            for (_, fut), audio, mel in zip(batch, audios, mels):
                if not fut.cancelled():
                    fut.set_result((audio, mel, len(batch)))

    def stats(self) -> dict:
        with self._stats_lock:
            return {
                "status": "ok",
                "requests_served": self.requests_served,
                "batches_dispatched": self.batches_dispatched,
                "max_batch": self.max_batch,
                "batch_window_ms": self.batch_window_s * 1000.0,
                "batch_multiple": self.batch_multiple,
            }


def wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    """float32 [-1, 1] -> 16-bit PCM WAV bytes (in memory)."""
    from scipy.io.wavfile import write

    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    write(buf, sr, pcm)
    return buf.getvalue()


def make_handler(server: BatchingInferenceServer, sr: int):
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
                body = json.dumps(server.stats()).encode()
                self._reply(200, body, "application/json")
            else:
                self._reply(404, b"not found", "text/plain")

        def do_POST(self):  # noqa: N802
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
          **batch_kw) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever() or use the
    CLI below). The batching server is attached as `.inference`."""
    inference = BatchingInferenceServer(pipeline, **batch_kw)
    httpd = ThreadingHTTPServer((host, port), make_handler(inference, sr))
    httpd.inference = inference
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
        "--uint8", action="store_true",
        help="Accept raw uint8 frames and normalise on device "
             "(reference inference normalisation, 4x less request traffic).",
    )
    parser.add_argument(
        "--sampling-rate", type=int, default=11413,
        help="WAV sampling rate when serving --exported (checkpoint mode "
             "reads it from the HiFi-GAN config)",
    )
    args = parser.parse_args()

    if args.exported:
        from mri2speech_tpu.infer.export import load_exported_pipeline

        pipeline = load_exported_pipeline(args.exported)
        sr = args.sampling_rate
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

        mesh = None
        if args.num_devices > 1:
            from mri2speech_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_data=args.num_devices)
        pipeline = build_pipeline_from_checkpoints(
            args.mri_checkpoint, args.scaler_json, args.hifigan_config,
            args.hifigan_checkpoint, frame_bucket=args.frame_bucket, mesh=mesh,
            input_norm="zscore_minmax" if args.uint8 else "none",
        )
        with open(args.hifigan_config, "r", encoding="utf-8") as f:
            sr = json.load(f)["sampling_rate"]
    httpd = serve(
        pipeline, sr, host=args.host, port=args.port,
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
        batch_multiple=args.batch_multiple or args.max_batch,
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
