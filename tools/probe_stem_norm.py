"""Bound the residual stem headroom: what does the on-device normalize cost?

The serving acoustic stage (30.3 ms post-pad_ir) includes the per-frame
zscore->minmax normalize of uint8 frames (algebraically = plain per-frame
min-max; see infer/pipeline.py::_normalize_frames). Folding that affine into
the s2d stem conv's epilogue is an exact rewrite, but is only worth building
if the normalize actually costs time XLA doesn't already hide. This probe
times the acoustic stage three ways at exact serving shapes:

* zscore:   uint8 frames -> on-device normalize -> model   (the serving path)
* prenorm:  pre-normalized bf16 frames -> model            (upper bound on
            what ANY normalize fold could save)
* raw_cast: uint8 frames -> astype(float)/255 -> model     (cheapest affine)

Usage: python tools/probe_stem_norm.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import bench

T = 512
K = 8


def timeit(fn, *args, repeats=3):
    def k_passes(*a):
        return jax.lax.fori_loop(0, K, lambda i, acc: fn(acc, *a), jnp.float32(0.0))

    compiled = jax.jit(k_passes).lower(*args).compile()
    float(compiled(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(compiled(*args))
        ts.append((time.perf_counter() - t0) / K)
    return float(np.median(ts))


def main() -> None:
    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else None
    pipeline = bench.build_pipeline(
        dtype=dtype, lstm_impl="pallas" if backend == "tpu" else "scan"
    )
    rng = np.random.default_rng(0)
    frames_u8 = (rng.random((T, 256, 256)) * 255).astype(np.uint8)
    f, mask = pipeline.prepare_inputs(frames_u8)
    f_dev = jax.device_put(jnp.asarray(f))
    m_dev = jax.device_put(jnp.asarray(mask))
    # pre-normalized variant: the exact normalize output, computed once
    f_norm = jax.jit(pipeline._normalize_frames)(f_dev)
    if dtype is not None:
        f_norm = f_norm.astype(dtype)
    f_norm = jax.device_put(f_norm)

    def body_zscore(acc, v, x, m):
        g = pipeline._normalize_frames(x + (acc * 0).astype(x.dtype))
        pred = pipeline.acoustic_model.apply(v, g, train=False, mask=m + acc * 1e-30)
        return jnp.sum(pred.astype(jnp.float32)) * 1e-30 + acc

    def body_prenorm(acc, v, x, m):
        pred = pipeline.acoustic_model.apply(
            v, x + acc.astype(x.dtype) * 1e-30, train=False, mask=m + acc * 1e-30
        )
        return jnp.sum(pred.astype(jnp.float32)) * 1e-30 + acc

    def body_rawcast(acc, v, x, m):
        g = (x + (acc * 0).astype(x.dtype)).astype(jnp.float32) / 255.0
        pred = pipeline.acoustic_model.apply(v, g, train=False, mask=m + acc * 1e-30)
        return jnp.sum(pred.astype(jnp.float32)) * 1e-30 + acc

    out = {}
    for name, body, x in (
        ("zscore", body_zscore, f_dev),
        ("prenorm", body_prenorm, f_norm),
        ("raw_cast", body_rawcast, f_dev),
    ):
        t = timeit(body, pipeline.acoustic_variables, x, m_dev)
        out[f"{name}_ms"] = round(t * 1e3, 3)
        print(name, out[f"{name}_ms"], "ms", flush=True)
    out["normalize_cost_ms"] = round(out["zscore_ms"] - out["prenorm_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
