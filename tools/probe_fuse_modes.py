"""Probe per-stage MRF fuse-mode combinations on the live chip.

The MFU accounting in bench.py showed the generator at 4.8% MFU — the dense
MRF fusion trades ~4.7x redundant FLOPs (k_max tap padding x block-diagonal
branches) for lane packing, which only pays where branch channels underfill
the MXU. This probe times the generator under per-stage mode combos to pick
the default inference layout. Stage branch channels: 256, 128, 64, 32.

Usage: python tools/probe_fuse_modes.py   (on the TPU)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

repo_root = str(Path(__file__).resolve().parents[1])
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mri2speech_tpu.config import default_vocoder_config  # noqa: E402
from mri2speech_tpu.models.layers import fold_weight_norm  # noqa: E402
from mri2speech_tpu.models.vocoder import Generator, fuse_mrf_params  # noqa: E402

T = 512
K = 8
REPEATS = 5

COMBOS = [
    ("dense", "dense", "dense", "dense"),   # round-1 default
    ("none", "dense", "dense", "dense"),
    ("dense", "none", "dense", "dense"),
    ("none", "none", "dense", "dense"),
    ("none", "none", "none", "dense"),
    ("none", "none", "none", "none"),       # unfused (but polyphase ups)
    ("none", "none", "none", "pallas"),     # Pallas fused-stage kernel (v1, rolls)
    ("none", "none", "pallas", "pallas"),
    ("none", "none", "none", "pallas2"),    # v2: scratch-slice taps, compact IO
    ("none", "none", "pallas2", "pallas2"),
    # NOTE: stage-1 pallas combos OOM scoped VMEM: NBC=384 packed tap
    # matrices are 6 x (11,384,384) = 19 MB even in bf16 > the 16 MB budget.
]


def main() -> None:
    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else None
    h = dict(default_vocoder_config())

    gen_wn = Generator(h=h)
    params_wn = jax.jit(
        lambda r: gen_wn.init(r, jnp.zeros((1, 64, 4)))["params"]
    )(jax.random.PRNGKey(1))
    folded = fold_weight_norm(jax.device_get(params_wn))

    x = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, T)),
                    dtype or jnp.float32)
    )

    results = []
    for combo in COMBOS:
        gen = Generator(h=h, use_weight_norm=False, fuse_mrf=True,
                        fuse_mode=combo, dtype=dtype)
        params = jax.device_put(fuse_mrf_params(folded, h, mode=list(combo)))

        def body(acc, p, xx):
            audio = gen.apply({"params": p}, xx + acc.astype(xx.dtype) * 1e-3)
            return audio[0, 0, 0].astype(jnp.float32) * 1e-30 + acc

        def k_passes(p, xx):
            return jax.lax.fori_loop(0, K, lambda i, a: body(a, p, xx),
                                     jnp.float32(0.0))

        compiled = jax.jit(k_passes).lower(params, x).compile()
        float(compiled(params, x))  # warm; float() forces through the tunnel
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(compiled(params, x))
            times.append((time.perf_counter() - t0) / K)
        t = float(np.median(times)) * 1e3
        results.append((combo, t))
        print(f"{'/'.join(m[0] for m in combo)}: {t:.2f} ms", flush=True)

    best = min(results, key=lambda r: r[1])
    print(f"BEST: {best[0]} at {best[1]:.2f} ms")


if __name__ == "__main__":
    main()
