"""In-graph attribution of the MultiScaleDiscriminator forward cost.

probe_msd_convs.py measured isolated k41 convs at ~3.2 ms each — but 24 such
convs live in the full MSD forward, which takes 18 ms total, so isolated
numbers do NOT add up (XLA pipelines across in-graph neighbours). This probe
times TRUNCATED DiscriminatorS stacks (scale 0, batch 32) cumulatively, so
layer deltas are in-graph marginal costs.

Usage: python tools/probe_msd_cumulative.py
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

K = 64  # small ops: K must amortise the ~26 ms tunnel RTT per call (RTT/K floor)
B = 32
T = 8400
# (features, kernel, stride, groups, padding) — models/vocoder.py spec
SPEC = [
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
]


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


def stack_fn(n_layers, weights):
    def f(x):
        y = x
        for i in range(n_layers):
            feats, k, s, g, p = SPEC[i]
            y = jax.lax.conv_general_dilated(
                y, weights[i], window_strides=(s,), padding=[(p, p)],
                dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=g,
            )
            y = jax.nn.leaky_relu(y, 0.1)
        return y

    return f


def main() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, 1)).astype(np.float32) * 0.1)
    weights = []
    cin = 1
    for feats, k, s, g, p in SPEC:
        weights.append(
            jnp.asarray(
                rng.standard_normal((k, cin // g, feats)).astype(np.float32) * 0.02
            )
        )
        cin = feats

    results = {}
    prev = 0.0
    for n in range(1, len(SPEC) + 1):
        f = stack_fn(n, weights)

        def body(acc, xx, f=f):
            o = f(xx + acc * 1e-30)
            return o.reshape(-1)[0].astype(jnp.float32) * 1e-30 + acc

        t = timeit(body, x) * 1e3
        results[f"upto_l{n}_ms"] = round(t, 3)
        results[f"delta_l{n}_ms"] = round(t - prev, 3)
        prev = t
        print(f"l{n}: cumulative {t:.3f} ms, delta {t - prev:.3f}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
