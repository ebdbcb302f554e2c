"""Probe implementations of the MSD's grouped kernel-41 convs on the chip.

probe_gan_step.py showed the MultiScaleDiscriminator forward at ~18 ms — 3x
the MultiPeriodDiscriminator — at ~14 TF/s overall, i.e. the groups-16
kernel-41 convs (`models.py:210-235` spec) run far below the MXU rates the
dense convs in this repo reach (er stages: 111 TF/s). XLA's grouped-conv
lowering was already measured pathological once (grouped-fused MRF: 79.9 ms
vs 25.0 dense, round 1).

Variants per layer, all mathematically exact:
* grouped   — feature_group_count as-is (baseline)
* split     — G separate dense convs on channel slices, concatenated
* packN     — block-diagonal dense convs over packs of N groups (FLOPs xN,
              output lanes filled to Cg_out*N)
* dense     — one block-diagonal dense conv over all groups (FLOPs xG)

Each is timed forward AND value_and_grad((x, w)) (the training-step shape of
work). Usage: python tools/probe_msd_convs.py
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
# (name, C_in, C_out, k, stride, groups, T_in)  — scale-0 shapes at B=32
LAYERS = [
    ("l1", 128, 128, 41, 2, 4, 8400),
    ("l2", 128, 256, 41, 2, 16, 4200),
    ("l3", 256, 512, 41, 4, 16, 2100),
    ("l4", 512, 1024, 41, 4, 16, 525),
    ("l5", 1024, 1024, 41, 1, 16, 131),
]
B = 32  # concat-batched y/y_hat
PAD = 20


def conv(x, w, stride, groups):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(PAD, PAD)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
    )


def grouped_fn(stride, groups):
    return lambda x, w: conv(x, w, stride, groups)


def split_fn(stride, groups):
    def f(x, w):
        k, cgi, cout = w.shape
        cgo = cout // groups
        outs = [
            conv(
                x[..., g * cgi : (g + 1) * cgi],
                w[..., g * cgo : (g + 1) * cgo],
                stride, 1,
            )
            for g in range(groups)
        ]
        return jnp.concatenate(outs, axis=-1)

    return f


def packed_fn(stride, groups, pack):
    def f(x, w):
        k, cgi, cout = w.shape
        cgo = cout // groups
        outs = []
        for j in range(groups // pack):
            # block-diagonal dense kernel over `pack` groups (exact: off-block
            # weights are zero; autodiff slices the block grads back out)
            wd = jnp.zeros((k, pack * cgi, pack * cgo), w.dtype)
            for t in range(pack):
                g = j * pack + t
                wd = wd.at[:, t * cgi : (t + 1) * cgi, t * cgo : (t + 1) * cgo].set(
                    w[..., g * cgo : (g + 1) * cgo]
                )
            outs.append(
                conv(x[..., j * pack * cgi : (j + 1) * pack * cgi], wd, stride, 1)
            )
        return jnp.concatenate(outs, axis=-1)

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
    for name, ci, co, k, s, g, t in LAYERS:
        x = jnp.asarray(rng.standard_normal((B, t, ci)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, ci // g, co)).astype(np.float32) * 0.02
        )
        cgo = co // g
        variants = {"grouped": grouped_fn(s, g), "split": split_fn(s, g)}
        pack = 1
        while cgo * pack < 128 and pack < g:
            pack *= 2
        if 1 < pack < g:
            variants[f"pack{pack}"] = packed_fn(s, g, pack)
        variants["dense"] = packed_fn(s, g, g)

        ref = None
        for vname, fn in variants.items():
            out = jax.jit(fn)(x, w)
            if ref is None:
                ref = np.asarray(out)
            else:
                md = float(np.max(np.abs(np.asarray(out) - ref)))
                assert md < 1e-3 * max(1.0, float(np.abs(ref).max())), (
                    name, vname, md,
                )

            def fwd(acc, xx, ww, fn=fn):
                o = fn(xx + acc * 1e-30, ww)
                return o.reshape(-1)[0].astype(jnp.float32) * 1e-30 + acc

            def fwdbwd(acc, xx, ww, fn=fn):
                def loss(a, b):
                    return jnp.sum(fn(a, b) ** 2)

                l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(
                    xx + acc * 1e-30, ww
                )
                return (
                    l * 0 + gx.reshape(-1)[0] + gw.reshape(-1)[0]
                ).astype(jnp.float32) * 1e-30 + acc

            results[f"{name}_{vname}_fwd_ms"] = timeit(fwd, x, w) * 1e3
            results[f"{name}_{vname}_fwdbwd_ms"] = timeit(fwdbwd, x, w) * 1e3
        print(name, json.dumps({kk: round(vv, 3) for kk, vv in results.items() if kk.startswith(name)}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
