"""Benchmark the HTTP serving daemon's dynamic batching on the live chip.

Measures the daemon config a deployment would actually run — one compiled
program (batch padded to `--batch-multiple`), a short batching window — under
c concurrent clients for c in `--concurrency`. Reported per level:

* wall seconds until all c requests complete (each request blocks on its
  np.asarray'd audio inside infer_batch — honest under the axon tunnel);
* per-request latency (what one caller waits, queue + window + dispatch);
* throughput in requests/s and in audio-seconds per wall-second
  (aud_s_per_s > 1 means the daemon keeps up with c real-time streams).

Requests go through the real BatchingInferenceServer queue/fusion path; pass
--http to add the full ThreadingHTTPServer + WAV-encode round trip on top.

Run AFTER any CPU suite finishes (serial-only rule — one host core).

Usage: python tools/bench_server.py [--frames 128] [--concurrency 1,2,4,8]
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_pipeline  # full-size models, random weights
from mri2speech_tpu.infer.server import BatchingInferenceServer

SR = 11413


def run_level(submit, videos, c: int, repeats: int):
    """Fire c concurrent requests `repeats` times; return (wall_s, lat_s).

    A failed request aborts the benchmark with ITS error (a None latency
    silently polluting the medians would hide the root cause)."""
    walls, lats = [], []
    for r in range(repeats):
        lat = [None] * c
        errs = [None] * c

        def call(i):
            t0 = time.perf_counter()
            try:
                submit(videos[(r * c + i) % len(videos)])
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                errs[i] = exc
                return
            lat[i] = time.perf_counter() - t0

        threads = [threading.Thread(target=call, args=(i,)) for i in range(c)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for e in errs:
            if e is not None:
                raise RuntimeError(f"request failed at concurrency {c}") from e
        walls.append(time.perf_counter() - t0)
        lats.extend(lat)
    return walls, lats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--concurrency", default="1,2,4,8")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--batch-multiple", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=10.0)
    ap.add_argument("--http", action="store_true",
                    help="go through the full HTTP server instead of the "
                         "batching queue directly")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke mode: force the host-CPU backend (validates "
                         "the tool when the TPU tunnel is down)")
    args = ap.parse_args()
    levels = [int(x) for x in args.concurrency.split(",")]

    import os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # backend-suffixed cache shared with the test suite / other tools
    from mri2speech_tpu.utils.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    pipe = build_pipeline()
    rng = np.random.default_rng(0)
    # distinct input pool so XLA/the tunnel can't cache-collapse repeats
    videos = [
        (rng.random((args.frames, 256, 256)) * 255).astype(np.uint8)
        for _ in range(4)
    ]
    audio_s = args.frames * pipe.hop_total / SR

    server = BatchingInferenceServer(
        pipe, max_batch=args.max_batch,
        batch_window_ms=args.window_ms, batch_multiple=args.batch_multiple,
    )
    httpd = None
    if args.http:
        import http.client
        import io

        # build the HTTP front around the already-started batching server so
        # both modes measure the same queue instance
        from http.server import ThreadingHTTPServer

        from mri2speech_tpu.infer.server import make_handler

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server, SR))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        port = httpd.server_address[1]
        bodies = []
        for v in videos:
            buf = io.BytesIO()
            np.save(buf, v)
            bodies.append(buf.getvalue())

        def submit(video):
            i = next(k for k, v in enumerate(videos) if v is video)
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", "/synthesize", body=bodies[i])
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()[:200]
            resp.read()
            conn.close()
    else:
        def submit(video):
            server.synthesize(video, timeout=600)

    # warm: compiles the single (batch_multiple, Tp) program
    t0 = time.perf_counter()
    submit(videos[0])
    warm_s = time.perf_counter() - t0

    results = {}
    for c in levels:
        walls, lats = run_level(submit, videos, c, args.repeats)
        wall = float(np.median(walls))
        results[str(c)] = {
            "wall_s_median": wall,
            "latency_s_median": float(np.median(lats)),
            "latency_s_p90": float(np.percentile(lats, 90)),
            "requests_per_s": c / wall,
            "audio_s_per_wall_s": c * audio_s / wall,
        }
        print(f"  c={c}: wall {wall:.3f}s  lat "
              f"{results[str(c)]['latency_s_median']:.3f}s  "
              f"{results[str(c)]['audio_s_per_wall_s']:.1f}x real-time",
              file=sys.stderr)

    stats = server.stats()
    best = max(results.values(), key=lambda r: r["audio_s_per_wall_s"])
    out = {
        "metric": "server_audio_s_per_wall_s_best",
        "value": best["audio_s_per_wall_s"],
        "unit": "x_realtime",
        "frames_per_request": args.frames,
        "audio_s_per_request": audio_s,
        "mode": "http" if args.http else "queue",
        "max_batch": args.max_batch,
        "batch_multiple": args.batch_multiple,
        "window_ms": args.window_ms,
        "warm_compile_s": warm_s,
        "levels": results,
        "requests_served": stats["requests_served"],
        "batches_dispatched": stats["batches_dispatched"],
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    server.shutdown()
    if httpd is not None:
        httpd.shutdown()
        httpd.server_close()


if __name__ == "__main__":
    main()
