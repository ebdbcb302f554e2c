"""Hypothesis probe: do 128-multiple channels speed up the acoustic 'ir' stages?

Round-2 profile (docs/BENCH_NOTES.md): s4-s6 (ir104/120/208) run at 28-53
TF/s vs 111-114 for the er stages — ~17 ms of the 32 ms acoustic stage.
VERDICT item 5 suggests zero-padding the 104/120-channel stages to 128-lane
multiples. Before building the exact zero-weight transform, this probe times
SPEC-LEVEL variants (different param count — a pure timing experiment):

* b2:      the standard spec (104/120/208, mids 416/720/1248)
* pad128:  ir channels 128/128/256 (mids 512/768/1536) — everything a
           128-multiple, ~1.23x the ir FLOPs
* b2_nose: standard channels with se_ratio=0 — isolates the SE blocks' cost
* b2_dw5:  (diagnostic) standard spec timed per-stage cumulatively

If pad128's ms/GFLOP is NOT materially better than b2's, exact padding cannot
win (it adds the same FLOPs without the measurement noise) and the floor is
elsewhere (dw/SE serialization). Usage: python tools/probe_ir_pad.py
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

from mri2speech_tpu.models.effnetv2 import EffNetV2Features, StageSpec

K = 8
T = 512


def timeit(fn, *args, repeats=3, k=K):
    def k_passes(*a):
        return jax.lax.fori_loop(0, k, lambda i, acc: fn(acc, *a), jnp.float32(0.0))

    compiled = jax.jit(k_passes).lower(*args).compile()
    float(compiled(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(compiled(*args))
        ts.append((time.perf_counter() - t0) / k)
    flops = float("nan")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        pass
    return float(np.median(ts)), flops


SPECS = {
    "b2": (
        StageSpec("cn", 3, 1, 1, 16, 2),
        StageSpec("er", 3, 2, 4, 32, 3),
        StageSpec("er", 3, 2, 4, 56, 3),
        StageSpec("ir", 3, 2, 4, 104, 4, 0.25),
        StageSpec("ir", 3, 1, 6, 120, 6, 0.25),
        StageSpec("ir", 3, 2, 6, 208, 10, 0.25),
    ),
    "pad128": (
        StageSpec("cn", 3, 1, 1, 16, 2),
        StageSpec("er", 3, 2, 4, 32, 3),
        StageSpec("er", 3, 2, 4, 56, 3),
        StageSpec("ir", 3, 2, 4, 128, 4, 0.25),
        StageSpec("ir", 3, 1, 6, 128, 6, 0.25),
        StageSpec("ir", 3, 2, 6, 256, 10, 0.25),
    ),
    "b2_nose": (
        StageSpec("cn", 3, 1, 1, 16, 2),
        StageSpec("er", 3, 2, 4, 32, 3),
        StageSpec("er", 3, 2, 4, 56, 3),
        StageSpec("ir", 3, 2, 4, 104, 4, 0.0),
        StageSpec("ir", 3, 1, 6, 120, 6, 0.0),
        StageSpec("ir", 3, 2, 6, 208, 10, 0.0),
    ),
}


def main() -> None:
    rng = np.random.default_rng(0)
    # EXACT serving layout: (T, 256, 256, 1) bf16 frames, s2d stem — stage
    # spatial dims match bench.py's acoustic stage (s4/s5 at 16x16, s6 at 8x8)
    x = jnp.asarray(rng.random((T, 256, 256, 1)).astype(np.float32), jnp.bfloat16)

    results = {}
    for name, spec in SPECS.items():
        model = EffNetV2Features(spec=spec, stem_s2d=True, dtype=jnp.bfloat16)
        vars_ = jax.jit(lambda r, m=model: m.init(r, jnp.zeros((1, 256, 256, 1))))(
            jax.random.PRNGKey(0)
        )

        def body(acc, v, xx, m=model):
            y = m.apply(v, xx + acc.astype(xx.dtype) * 1e-3, train=False)
            return y[0, 0, 0, 0].astype(jnp.float32) * 1e-30 + acc

        t, flops = timeit(body, vars_, x)
        results[f"{name}_ms"] = round(t * 1e3, 3)
        results[f"{name}_gflops"] = round(flops / 1e9, 1)
        results[f"{name}_tflops"] = round(flops / t / 1e12, 1)
        print(name, json.dumps({kk: results[kk] for kk in results if kk.startswith(name)}), flush=True)

    # cumulative truncated stacks of the b2 spec: per-stage in-graph deltas
    for n_stages in (3, 4, 5, 6):
        spec = SPECS["b2"][:n_stages]
        model = EffNetV2Features(spec=spec, stem_s2d=True, dtype=jnp.bfloat16)
        vars_ = jax.jit(lambda r, m=model: m.init(r, jnp.zeros((1, 256, 256, 1))))(
            jax.random.PRNGKey(0)
        )

        def body(acc, v, xx, m=model):
            y = m.apply(v, xx + acc.astype(xx.dtype) * 1e-3, train=False)
            return y[0, 0, 0, 0].astype(jnp.float32) * 1e-30 + acc

        t, flops = timeit(body, vars_, x)
        results[f"cum_s{n_stages}_ms"] = round(t * 1e3, 3)
        print(f"cum_s{n_stages}", round(t * 1e3, 3), "ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
