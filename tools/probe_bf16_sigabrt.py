"""Isolate which component of the bf16 D+G step SIGABRTs XLA in a fori carry.

Round-2 found: the FULL bf16 D+G training step compiles standalone but
SIGABRTs this XLA's layout assignment when chained inside a fori_loop carry
(docs/BENCH_NOTES.md) — so the bf16 step could only be measured host-pipelined
(106 ms vs 117.7 fp32). This tool bisects: each candidate sub-graph is
compiled in a K-step fori chain IN A SUBPROCESS (the crash is a hard abort,
not an exception), and the parent records which survive:

* gen_fwdbwd_bf16   — generator fwd + vjp pullback, bf16 module
* mpd_fwdbwd_bf16   — MPD LSGAN fwd+bwd, bf16
* msd_fwdbwd_bf16   — MSD LSGAN fwd+bwd (norm_stats carried), bf16
* full_step_bf16    — the real trainer step, bf16
* full_step_bf16_d_fp32 — bf16 generator, fp32 discriminators
* full_step_fp32_d_bf16 — fp32 generator, bf16 discriminators

If exactly one family triggers the abort, the trainer can keep that family
fp32 and run the rest bf16 inside the fused loop. Results land in BENCH_NOTES.

Usage: python tools/probe_bf16_sigabrt.py           (parent, runs all cases)
       python tools/probe_bf16_sigabrt.py CASE      (worker, may abort)
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CASES = [
    "gen_fwdbwd_bf16",
    "mpd_fwdbwd_bf16",
    "msd_fwdbwd_bf16",
    "full_step_bf16",
    "full_step_bf16_d_fp32",
    "full_step_fp32_d_bf16",
]
K = 4


def run_case(case: str) -> None:
    import jax
    import jax.numpy as jnp

    from mri2speech_tpu.config import default_vocoder_config
    from mri2speech_tpu.models.vocoder import (
        Generator,
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )

    # reduced shapes by default: the full-shape graphs compile for 30+ min
    # per case on this host; pass FULL=1 to bisect at production shapes
    import os

    if os.environ.get("M2S_SIGABRT_FULL", "") == "1":
        h = default_vocoder_config()
    else:
        h = default_vocoder_config(batch_size=4, segment_size=2100)
    B, L = h["batch_size"], h["segment_size"]
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, 1, L)).astype(np.float32) * 0.1)
    mel_frames = L // h["hop_size"]
    x = jnp.asarray(
        rng.standard_normal((B, h["num_mels"], mel_frames)).astype(np.float32)
    )
    bf16 = jnp.bfloat16

    if case == "gen_fwdbwd_bf16":
        gen = Generator(h=h, dtype=bf16)
        p = gen.init(jax.random.PRNGKey(0), x[:1])["params"]

        # params/inputs are ARGUMENTS (CLAUDE.md: closing over weights bakes
        # them in as HLO literals — slow remote compiles AND it can change the
        # very fusion decisions this probe bisects)
        def body(i, acc, p_, x_):
            def loss(pp):
                yh = gen.apply({"params": pp}, x_ + acc * 1e-30)
                return jnp.mean(jnp.abs(yh))

            l, g = jax.value_and_grad(loss)(p_)
            return (l + jax.tree_util.tree_leaves(g)[0].reshape(-1)[0]).astype(
                jnp.float32
            ) * 1e-30 + acc

        operands = (p, x)

    elif case in ("mpd_fwdbwd_bf16", "msd_fwdbwd_bf16"):
        if case.startswith("mpd"):
            d = MultiPeriodDiscriminator(dtype=bf16)
            v = d.init(jax.random.PRNGKey(0), y, y)
            apply_kw = {}
        else:
            d = MultiScaleDiscriminator(dtype=bf16)
            v = d.init(jax.random.PRNGKey(0), y, y)
            apply_kw = dict(mutable=["norm_stats"])
        p = v["params"]
        ns = {k: vv for k, vv in v.items() if k == "norm_stats"}

        def body(i, acc, p_, ns_, y_):
            def loss(pp):
                out = d.apply({"params": pp, **ns_}, y_ + acc * 1e-30, y_, **apply_kw)
                rs = out[0][0] if apply_kw else out[0]
                return sum(jnp.mean((r - 1.0) ** 2) for r in rs)

            l, g = jax.value_and_grad(loss)(p_)
            return (l + jax.tree_util.tree_leaves(g)[0].reshape(-1)[0]).astype(
                jnp.float32
            ) * 1e-30 + acc

        operands = (p, ns, y)

    else:
        from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig

        cfg = VocoderTrainerConfig(bf16=(case != "full_step_fp32_d_bf16"))
        trainer = VocoderTrainer(h, cfg)
        if case == "full_step_bf16_d_fp32":
            trainer.mpd = MultiPeriodDiscriminator(dtype=None)
            trainer.msd = MultiScaleDiscriminator(dtype=None)
        elif case == "full_step_fp32_d_bf16":
            trainer.mpd = MultiPeriodDiscriminator(dtype=bf16)
            trainer.msd = MultiScaleDiscriminator(dtype=bf16)
        state = trainer.init_state(jax.random.PRNGKey(0))
        audio = jnp.asarray(
            (rng.standard_normal((B, L)).astype(np.float32) * 0.1).clip(-1, 1)
        )
        lr = jnp.float32(h["learning_rate"])

        def k_steps(state, audio, lr):
            def sbody(i, st):
                st, _ = trainer._train_step_fn(
                    st, audio, None, lr, lr, fine_tuning=False
                )
                return st
            st = jax.lax.fori_loop(0, K, sbody, state)
            return jax.tree_util.tree_leaves(st.gen_params)[0].reshape(-1)[0].astype(jnp.float32)

        t0 = time.perf_counter()
        compiled = jax.jit(k_steps).lower(state, audio, lr).compile()
        float(compiled(state, audio, lr))
        t1 = time.perf_counter()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(state, audio, lr))
            ts.append((time.perf_counter() - t0) / K)
        print(json.dumps({"case": case, "ok": True, "step_ms": round(float(np.median(ts)) * 1e3, 2)}))
        return

    def k_passes(*ops):
        return jax.lax.fori_loop(
            0, K, lambda i, acc: body(i, acc, *ops), jnp.float32(0.0)
        )

    compiled = jax.jit(k_passes).lower(*operands).compile()
    float(compiled(*operands))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(compiled(*operands))
        ts.append((time.perf_counter() - t0) / K)
    print(json.dumps({"case": case, "ok": True, "pass_ms": round(float(np.median(ts)) * 1e3, 2)}))


def main() -> None:
    if len(sys.argv) > 1:
        run_case(sys.argv[1])
        return
    for case in CASES:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, case],
                capture_output=True, text=True, timeout=1500,
            )
        except subprocess.TimeoutExpired:
            print(f"{case}: TIMEOUT >1500s (compile hang counts as a failure "
                  f"mode distinct from the SIGABRT)", flush=True)
            continue
        tail = (proc.stdout or "").strip().splitlines()
        msg = tail[-1] if tail else ""
        if proc.returncode == 0:
            print(f"{case}: {msg}  ({time.time()-t0:.0f}s)", flush=True)
        else:
            sig = -proc.returncode if proc.returncode < 0 else proc.returncode
            err_tail = (proc.stderr or "").strip().splitlines()[-3:]
            print(f"{case}: CRASH rc={proc.returncode} (sig/rc {sig}) "
                  f"{' | '.join(err_tail)}  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
