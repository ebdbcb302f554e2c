"""Probe the vocoder GAN step's discriminator cost structure on the chip.

Round-2 measured the D+G step at 117 ms fp32 with the cost uniformly spread
over the discriminator fwd+bwd passes (~23% MFU everywhere — see
docs/BENCH_NOTES.md "Why the GAN step doesn't speed up in bf16"). This probe
times the exact restructuring candidates:

* ``batch_concat``: run each sub-discriminator ONCE on ``concat([y, y_hat])``
  (batch 2B) instead of twice at batch B — bit-exact per sample for the
  weight-norm sub-Ds (see MultiPeriodDiscriminator/MultiScaleDiscriminator).

Usage: python tools/probe_gan_step.py [--repeats N]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.models.vocoder import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)

K = 8


def timeit(fn, *args, repeats=5):
    """K chained passes in one executable; forced fetch (see bench.py)."""

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


def lsgan_d_loss(rs, gs):
    return sum(jnp.mean((r - 1.0) ** 2) for r in rs) + sum(jnp.mean(g**2) for g in gs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    h = default_vocoder_config()
    B, L = h["batch_size"], h["segment_size"]
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, 1, L)).astype(np.float32) * 0.1)
    yh = jnp.asarray(rng.standard_normal((B, 1, L)).astype(np.float32) * 0.1)

    mpd = MultiPeriodDiscriminator()
    mpd_cat = MultiPeriodDiscriminator(batch_concat=True)
    mpd_p = mpd.init(jax.random.PRNGKey(0), y, yh)["params"]
    msd = MultiScaleDiscriminator()
    msd_cat = MultiScaleDiscriminator(batch_concat=True)
    msd_vars = msd.init(jax.random.PRNGKey(1), y, yh)
    msd_p, msd_s = msd_vars["params"], msd_vars.get("norm_stats", {})

    results = {}

    # exactness check first (device, fp32): concat must match separate
    rs0, gs0, fr0, fg0 = mpd.apply({"params": mpd_p}, y, yh)
    rs1, gs1, fr1, fg1 = mpd_cat.apply({"params": mpd_p}, y, yh)
    md = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(rs0 + gs0, rs1 + gs1)
    )
    results["mpd_concat_maxdiff"] = md

    for name, mod in (("separate", mpd), ("concat", mpd_cat)):
        def fwd(acc, p, a, b, m=mod):
            rs, gs, _, _ = m.apply({"params": p}, a + acc * 1e-30, b + acc * 1e-30)
            return (
                sum(jnp.sum(r) for r in rs) + sum(jnp.sum(g) for g in gs)
            ).astype(jnp.float32) * 1e-30 + acc

        results[f"mpd_fwd_{name}"] = timeit(fwd, mpd_p, y, yh, repeats=args.repeats)

        def fwdbwd(acc, p, a, b, m=mod):
            def loss(pp):
                rs, gs, _, _ = m.apply({"params": pp}, a + acc * 1e-30, b + acc * 1e-30)
                return lsgan_d_loss(rs, gs)

            l, g = jax.value_and_grad(loss)(p)
            gleaf = jax.tree_util.tree_leaves(g)[0].reshape(-1)[0]
            return (l + gleaf).astype(jnp.float32) * 1e-30 + acc

        results[f"mpd_fwdbwd_{name}"] = timeit(
            fwdbwd, mpd_p, y, yh, repeats=args.repeats
        )

    for name, mod in (("separate", msd), ("concat", msd_cat)):
        def fwd(acc, p, s, a, b, m=mod):
            (rs, gs, _, _), _ = m.apply(
                {"params": p, "norm_stats": s},
                a + acc * 1e-30, b + acc * 1e-30, mutable=["norm_stats"],
            )
            return (
                sum(jnp.sum(r) for r in rs) + sum(jnp.sum(g) for g in gs)
            ).astype(jnp.float32) * 1e-30 + acc

        results[f"msd_fwd_{name}"] = timeit(
            fwd, msd_p, msd_s, y, yh, repeats=args.repeats
        )

        def fwdbwd(acc, p, s, a, b, m=mod):
            def loss(pp):
                (rs, gs, _, _), _ = m.apply(
                    {"params": pp, "norm_stats": s},
                    a + acc * 1e-30, b + acc * 1e-30, mutable=["norm_stats"],
                )
                return lsgan_d_loss(rs, gs)

            l, g = jax.value_and_grad(loss)(p)
            gleaf = jax.tree_util.tree_leaves(g)[0].reshape(-1)[0]
            return (l + gleaf).astype(jnp.float32) * 1e-30 + acc

        results[f"msd_fwdbwd_{name}"] = timeit(
            fwdbwd, msd_p, msd_s, y, yh, repeats=args.repeats
        )

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
