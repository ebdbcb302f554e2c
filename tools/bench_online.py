"""Benchmark the ONLINE streaming serving mode on the live chip.

Measures what matters for real-time use: steady-state wall time per pushed
chunk (each `push` blocks on its emitted audio via np.asarray — honest timing
under the axon tunnel, see CLAUDE.md) against the chunk's real-time budget
``chunk * hop / sr`` seconds, plus the worst chunk and the startup latency.

Run AFTER any CPU suite finishes (serial-only rule — one host core).

Usage: python tools/bench_online.py [--frames 512] [--chunk 16] [--lookahead 16]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_pipeline  # full-size models, random weights
from mri2speech_tpu.infer.online import OnlineVideoToSpeech

SR = 11413


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--lookahead", type=int, default=16)
    ap.add_argument("--bulk_window", type=int, default=8)
    args = ap.parse_args()

    import jax

    from mri2speech_tpu.utils.profiling import enable_persistent_compilation_cache

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    enable_persistent_compilation_cache()
    pipe = build_pipeline(lstm_impl="scan")  # online path uses the scan LSTM
    online = OnlineVideoToSpeech.from_pipeline(
        pipe, chunk=args.chunk, lookahead=args.lookahead
    )
    rng = np.random.default_rng(0)
    frames = (rng.random((args.frames, 256, 256)) * 255).astype(np.uint8)
    W = args.chunk
    budget_s = W * online.hop / SR

    # warm: one full stream compiles all four programs
    t0 = time.perf_counter()
    online.push(frames)
    online.flush()
    warm_s = time.perf_counter() - t0
    online.reset()

    # count device dispatches per steady chunk: wrap the five compiled
    # programs with counters (the fused-tail design claims 2/chunk — CNN +
    # fused mel+generator tail; this records what actually runs)
    counts = {}

    def _counting(name, fn):
        def wrapped(*a, **k):
            counts[name] = counts.get(name, 0) + 1
            return fn(*a, **k)
        return wrapped

    for name in ("_cnn_fn", "_mel_fn", "_gen_prefix_fn", "_gen_steady_fn", "_tail_fn"):
        setattr(online, name, _counting(name, getattr(online, name)))

    per_chunk = []
    total_audio = 0
    startup_s = None
    steady_start_counts = None
    t_start = time.perf_counter()
    for i in range(0, args.frames, W):
        t0 = time.perf_counter()
        audio, _ = online.push(frames[i : i + W])
        dt = time.perf_counter() - t0
        total_audio += audio.size
        if audio.size and startup_s is None:
            startup_s = time.perf_counter() - t_start
        if audio.size:  # steady-state chunks only (startup pushes are cheap)
            if steady_start_counts is None:
                steady_start_counts = dict(counts)
            per_chunk.append(dt)
    t0 = time.perf_counter()
    audio, _ = online.flush()
    flush_s = time.perf_counter() - t0
    total_audio += audio.size
    assert total_audio == args.frames * online.hop, (total_audio, args.frames)

    med = float(np.median(per_chunk))
    result = {
        "metric": "online_chunk_seconds_median",
        "value": med,
        "unit": "s",
        "chunk_frames": W,
        "lookahead_frames": online.r * W,
        "latency_frames": online.latency_frames,
        "latency_s": online.latency_frames * online.hop / SR,
        "chunk_budget_s": budget_s,
        "steady_rtf": med / budget_s,  # <1 = real-time
        "chunk_p90_s": float(np.percentile(per_chunk, 90)),
        "chunk_max_s": float(np.max(per_chunk)),
        "startup_s": startup_s,
        "flush_s": flush_s,
        "warm_compile_s": warm_s,
        "n_steady_chunks": len(per_chunk),
        "backend": jax.default_backend(),
    }
    if steady_start_counts is not None and len(per_chunk) > 1:
        # dispatches issued across the steady chunks AFTER the first emission
        n = len(per_chunk) - 1
        steady_disp = {
            k: (counts.get(k, 0) - steady_start_counts.get(k, 0)) / n
            for k in counts
            if counts.get(k, 0) != steady_start_counts.get(k, 0)
        }
        result["dispatches_per_steady_chunk"] = steady_disp
        result["dispatches_per_steady_chunk_total"] = round(
            sum(steady_disp.values()), 3
        )

    # bulk-push throughput: one whole-video push through the grouped
    # pre-upload window (chunk i+1 uploads while chunk i computes; group
    # boundaries prefetch+release device buffers). This is the
    # faster-than-real-time ingest number — per-chunk latency above is the
    # live-stream number.
    bulk = OnlineVideoToSpeech.from_pipeline(
        pipe, chunk=args.chunk, lookahead=args.lookahead,
        max_inflight_chunks=args.bulk_window,
    )
    bulk.push(frames[: 6 * W])
    bulk.flush()  # warm this instance's programs (jit caches are per-instance)
    bulk.reset()
    t0 = time.perf_counter()
    a1, _ = bulk.push(frames)
    a2, _ = bulk.flush()
    dt = time.perf_counter() - t0
    result["bulk_push_seconds_total"] = dt
    result["bulk_push_chunk_ms"] = round(dt / (args.frames // W) * 1000, 2)
    result["bulk_push_rtf"] = dt / ((a1.size + a2.size) / SR)
    result["bulk_window_chunks"] = args.bulk_window
    print(json.dumps(result))


if __name__ == "__main__":
    main()
