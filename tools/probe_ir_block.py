"""In-graph attribution inside one acoustic 'ir' (SE-MBConv) block.

Round-2/3 profile: s4-s6 take ~17 ms of the ~31 ms CNN at 28-53 TF/s while
the dense 'er' stages run at 111-114 TF/s. Byte accounting says the ir
stages are bound by HBM passes over the 6x-expanded mid tensors (e.g. s5:
(512, 16, 16, 720) bf16 = 94 MB, touched ~5x per block), not by MXU rate.
This probe measures the in-graph marginal cost of each op in a block at the
EXACT s5 serving shapes (cumulative truncation, K=64 — RTT/K trap), plus
two pass-reduction candidates:

* se_einsum:  fold the SE gate into the conv_pwl contraction via
  einsum('bhwk,bk,kn->bhwn') — if XLA fuses the elementwise producer into
  the dot operand, this removes one full read+write of the mid tensor.
* bn_folded:  inference-fold BN scales into the conv weights — measures
  whether the separate BN ops cost anything (XLA should fuse them anyway).

Usage: python tools/probe_ir_block.py
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

K = 64
B, H, W = 512, 16, 16
C, EXPAND = 120, 6
MID = C * EXPAND  # 720
RED = C // 4  # SE reduced dim 30
N_BLOCKS = 6  # s5 has 6 blocks — stack them so XLA pipelines like the real net


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
    return float(np.median(ts))


def make_weights(key):
    ks = jax.random.split(key, 6)
    s = lambda k, shape: (jax.random.normal(k, shape, jnp.bfloat16) * 0.05)
    return {
        "w_pw": s(ks[0], (C, MID)),
        "w_dw": s(ks[1], (3, 3, 1, MID)),
        "w_r": s(ks[2], (MID, RED)),
        "b_r": jnp.zeros((RED,), jnp.bfloat16),
        "w_e": s(ks[3], (RED, MID)),
        "b_e": jnp.zeros((MID,), jnp.bfloat16),
        "w_pwl": s(ks[4], (MID, C)),
    }


def block(x, w, upto, se_mode="gate"):
    """One s5-shaped ir block truncated at `upto` ops."""
    y = jnp.einsum("bhwc,cm->bhwm", x, w["w_pw"])  # pw (BN+SiLU fused in)
    y = jax.nn.silu(y)
    if upto == "pw":
        return y
    y = jax.lax.conv_general_dilated(
        y, w["w_dw"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=MID,
    )
    y = jax.nn.silu(y)
    if upto == "dw":
        return y
    if upto in ("se", "full", "full_einsum"):
        g = jnp.mean(y, axis=(1, 2))  # (B, MID)
        g = jax.nn.silu(g @ w["w_r"] + w["b_r"])
        g = jax.nn.sigmoid(g @ w["w_e"] + w["b_e"])
        if upto == "se":
            return y * g[:, None, None, :]
        if upto == "full_einsum":
            # fold the gate into the pwl contraction: one fewer mid pass IF
            # XLA fuses the elementwise producer into the dot operand
            return jnp.einsum("bhwk,bk,kc->bhwc", y, g, w["w_pwl"]) + x
        y = y * g[:, None, None, :]
    return jnp.einsum("bhwk,kc->bhwc", y, w["w_pwl"]) + x  # pwl + residual


def stack(upto):
    def f(acc, x, ws):
        y = x + acc.astype(x.dtype) * 1e-3
        for i in range(N_BLOCKS):
            o = block(y, ws[i], upto)
            # truncated variants change the channel count — project back so
            # blocks chain (the projection cost is constant across variants)
            y = o if o.shape[-1] == C else o[..., :C]
        return y[0, 0, 0, 0].astype(jnp.float32) * 1e-30 + acc

    return f


def main() -> None:
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.bfloat16)
    ws = [make_weights(jax.random.fold_in(rng, i)) for i in range(N_BLOCKS)]

    results = {}
    prev = 0.0
    for upto in ("pw", "dw", "se", "full", "full_nose", "full_einsum"):
        mode = "full" if upto == "full_nose" else upto
        if upto == "full_nose":
            def f(acc, x, ws):
                y = x + acc.astype(x.dtype) * 1e-3
                for i in range(N_BLOCKS):
                    yy = block(y, ws[i], "dw")
                    y = jnp.einsum("bhwk,kc->bhwc", yy, ws[i]["w_pwl"]) + y
                return y[0, 0, 0, 0].astype(jnp.float32) * 1e-30 + acc
        else:
            f = stack(mode)
        t = timeit(f, x, ws)
        results[f"{upto}_ms"] = round(t * 1e3, 3)
        results[f"{upto}_delta_ms"] = round((t - prev) * 1e3, 3)
        if upto in ("pw", "dw", "se", "full"):
            prev = t
        print(upto, round(t * 1e3, 3), "ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
