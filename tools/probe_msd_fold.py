"""Time-fold (s2d-on-time) variants for the MSD kernel-41 convs.

probe_msd_convs.py measured a ~3.2 ms/pass floor for EVERY variant of EVERY
MSD k41 conv — independent of FLOPs (grouped vs 16x-dense same time) and of
tensor size (T=8400 and T=131 same time) — i.e. a per-TAP lowering overhead
(~78 us/tap), not a compute or bandwidth roofline. The fix candidate: fold
time into channels so the same sums compute as a V-tap block conv
(V = ceil((s(F-1)+41)/(sF)), 3-6 taps) over block-Toeplitz kernels — the
stem-s2d trick applied to 1-D convs.

Variants (exact up to fp reassociation):
* foldF_dense — fold by F, one dense block kernel (grouped structure kept as
  zero blocks inside the folded kernel)
Usage: python tools/probe_msd_fold.py
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

K = 8
KSIZE = 41
PAD = 20
LAYERS = [
    ("l1", 128, 128, 2, 4, 8400),
    ("l2", 128, 256, 2, 16, 4200),
    ("l3", 256, 512, 4, 16, 2100),
    ("l4", 512, 1024, 4, 16, 525),
    ("l5", 1024, 1024, 1, 16, 131),
]
B = 32


def grouped_ref(x, w, stride, groups):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(PAD, PAD)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
    )


def build_fold_kernel(w, stride, groups, F):
    """w (41, Cin/G, Cout) -> W' (V, s*F*Cin, F*Cout), block-Toeplitz, np."""
    k, cgi, cout = w.shape
    cin = cgi * groups
    cgo = cout // groups
    sF = stride * F
    V = -(-(stride * (F - 1) + k) // sF)  # ceil
    Wp = np.zeros((V, sF * cin, F * cout), np.float32)
    w_np = np.asarray(w)
    for v in range(V):
        for r in range(F):
            for q in range(sF):
                j = sF * v + q - stride * r
                if not (0 <= j < k):
                    continue
                for g in range(groups):
                    Wp[
                        v,
                        q * cin + g * cgi : q * cin + (g + 1) * cgi,
                        r * cout + g * cgo : r * cout + (g + 1) * cgo,
                    ] = w_np[j][:, g * cgo : (g + 1) * cgo]
    return Wp, V, sF


def fold_fn(stride, groups, F, T):
    def f(x, wp):
        # x (B, T, Cin); pre-pad so conv taps read folded blocks VALID-style
        b, t, cin = x.shape
        sF = stride * F
        t_out = (t + 2 * PAD - KSIZE) // stride + 1
        V = wp.shape[0]
        u_count = -(-t_out // F)
        need = sF * (u_count - 1 + V - 1) + sF  # blocks reachable by taps
        padded = np.ceil((PAD + t) / 1).astype(int) if False else None
        pad_right = need - PAD - t
        xp = jnp.pad(x, ((0, 0), (PAD, max(0, pad_right)), (0, 0)))
        xf = xp[:, : sF * (u_count + V - 1)].reshape(b, u_count + V - 1, sF * cin)
        y = jax.lax.conv_general_dilated(
            xf, wp, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )  # (B, u_count, F*Cout)
        cout = wp.shape[-1] // F
        return y.reshape(b, u_count * F, cout)[:, :t_out]

    return f


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
    rng = np.random.default_rng(0)
    results = {}
    for name, ci, co, s, g, t in LAYERS:
        x = jnp.asarray(rng.standard_normal((B, t, ci)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((KSIZE, ci // g, co)).astype(np.float32) * 0.02
        )
        ref = np.asarray(jax.jit(lambda a, b: grouped_ref(a, b, s, g))(x, w))

        for F in (8, 16):
            wp_np, V, sF = build_fold_kernel(w, s, g, F)
            wp = jnp.asarray(wp_np)
            f = fold_fn(s, g, F, t)
            out = np.asarray(jax.jit(f)(x, wp))
            md = float(np.max(np.abs(out - ref)))
            scale = max(1.0, float(np.abs(ref).max()))
            assert md < 2e-3 * scale, (name, F, md, scale)

            def fwd(acc, xx, ww, f=f):
                o = f(xx + acc * 1e-30, ww)
                return o.reshape(-1)[0].astype(jnp.float32) * 1e-30 + acc

            def fwdbwd(acc, xx, ww, f=f):
                def loss(a, b):
                    return jnp.sum(f(a, b) ** 2)

                l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(
                    xx + acc * 1e-30, ww
                )
                return (
                    l * 0 + gx.reshape(-1)[0] + gw.reshape(-1)[0]
                ).astype(jnp.float32) * 1e-30 + acc

            results[f"{name}_fold{F}_V"] = V
            results[f"{name}_fold{F}_fwd_ms"] = timeit(fwd, x, wp) * 1e3
            results[f"{name}_fold{F}_fwdbwd_ms"] = timeit(fwdbwd, x, wp) * 1e3
        print(name, json.dumps({kk: (round(vv, 3) if isinstance(vv, float) else vv) for kk, vv in results.items() if kk.startswith(name)}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
