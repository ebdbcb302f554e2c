"""Training-step throughput benchmark on the attached chip.

Measures both trainers at the reference's recipe shapes:
* acoustic: batch 8 (micro-batch 2), ref_frames=4, 256x256 frames ->
  optimizer steps/sec and mel frames/sec (B*T per step)
* vocoder GAN: batch 16, segment 8400 -> D+G steps/sec and audio-seconds/sec

Dispatch latency is amortised with K loop-carried steps inside one executable
(see bench.py). Results print as JSON lines; record per-round numbers in
docs/BENCH_NOTES.md.
"""
from __future__ import annotations

import json
import time

import numpy as np

import sys as _sys
from pathlib import Path as _Path

_repo = str(_Path(__file__).resolve().parents[1])
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import jax
import jax.numpy as jnp

from mri2speech_tpu.config import default_vocoder_config
from mri2speech_tpu.models.acoustic import AcousticModel
from mri2speech_tpu.train.acoustic import (
    AcousticTrainer,
    AcousticTrainerConfig,
    _reshape_micro,
)
from mri2speech_tpu.train.vocoder import VocoderTrainer, VocoderTrainerConfig

V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_HBM_BPS = 819e9


K_STEPS = 8


def _cost_fields(lowered, step_s: float, note: str = "") -> dict:
    """FLOPs/bandwidth accounting from XLA cost_analysis.

    CAVEAT (measured, see bench.py): cost_analysis counts any lax loop BODY
    exactly once regardless of trip count. Callers must therefore lower a
    program whose inner loops have trip count 1 (e.g. micro_batch == batch
    for the acoustic trainer) for the numbers to mean per-step work; inner
    recurrences (the BiLSTM scan) remain undercounted — noted in `flops_note`.
    """
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        byts = float(ca.get("bytes accessed", float("nan")))
    except Exception:
        return {}
    out = {
        "gflops_per_step": flops / 1e9,
        "achieved_tflops": flops / step_s / 1e12,
        "hbm_gb_per_s": byts / step_s / 1e9,
    }
    if note:
        out["flops_note"] = note
    if jax.default_backend() == "tpu":
        out["mfu_pct"] = 100.0 * flops / step_s / V5E_PEAK_FLOPS_BF16
        out["hbm_pct"] = 100.0 * byts / step_s / V5E_PEAK_HBM_BPS
    return out


def bench_acoustic(use_bf16: bool, repeats: int = 5) -> dict:
    """K chained optimizer steps inside ONE executable, result force-fetched.

    Chaining the state through the loop makes every pass depend on the carry
    (params change each step), so XLA cannot hoist anything; float() forces
    completion (block_until_ready is unreliable through the axon tunnel and
    per-step fetches would add the ~50 ms RTT to every step).
    """
    B, T, HW = 8, 4, 256
    rng = np.random.default_rng(0)
    batch = {
        "mri": rng.random((B, T, 1, HW, HW)).astype(np.float32),
        "mel": rng.standard_normal((B, T, 64)).astype(np.float32),
        "mask": np.ones((B, T), dtype=np.float32),
    }
    model = AcousticModel(
        use_checkpoint=True, dtype=jnp.bfloat16 if use_bf16 else None
    )
    trainer = AcousticTrainer(model, AcousticTrainerConfig(micro_batch_size=2))
    state = trainer.init_state(batch)
    micro = {k: jnp.asarray(v) for k, v in _reshape_micro(batch, 2).items()}
    micro = jax.device_put(micro)
    lr = jnp.float32(1e-4)

    def k_steps(state, micro, lr, key):
        def body(i, carry):
            st, ky = carry
            ky = jax.random.fold_in(ky, i)
            st, _ = trainer._train_step_fn(st, micro, lr, ky)
            return (st, ky)
        st, _ = jax.lax.fori_loop(0, K_STEPS, body, (state, key))
        return st.global_step

    compiled = jax.jit(k_steps).lower(state, micro, lr, jax.random.PRNGKey(0)).compile()
    float(compiled(state, micro, lr, jax.random.PRNGKey(0)))  # warm + force
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        float(compiled(state, micro, lr, jax.random.PRNGKey(i)))
        times.append((time.perf_counter() - t0) / K_STEPS)
    step_s = float(np.median(times))
    out = {
        "metric": "acoustic_train_step_seconds",
        "value": step_s,
        "unit": "s/step",
        "batch": B,
        "micro_batch": 2,
        "mel_frames_per_sec_train": B * T / step_s,
        "dtype": "bf16" if use_bf16 else "f32",
    }
    # FLOPs accounting: micro_batch == batch so the accumulation scan has
    # trip count 1 (same arithmetic per step; see _cost_fields caveat)
    trainer_ca = AcousticTrainer(model, AcousticTrainerConfig(micro_batch_size=B))
    state_ca = trainer_ca.init_state(batch)
    micro_ca = jax.device_put(
        {k: jnp.asarray(v) for k, v in _reshape_micro(batch, B).items()}
    )
    out.update(
        _cost_fields(
            jax.jit(trainer_ca._train_step_fn).lower(
                state_ca, micro_ca, lr, jax.random.PRNGKey(0)
            ),
            step_s,
            note="BiLSTM recurrence scan undercounted (body counted once)",
        )
    )
    return out


def bench_vocoder(
    repeats: int = 3,
    bf16: bool = False,
    bf16_opt: bool = False,
    bf16_grads: bool = False,
) -> dict:
    h = default_vocoder_config()
    trainer = VocoderTrainer(
        h,
        VocoderTrainerConfig(
            fine_tuning=False, bf16=bf16, bf16_opt_state=bf16_opt,
            bf16_grads=bf16_grads,
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = h["batch_size"]
    audio = jnp.asarray(
        (rng.standard_normal((B, h["segment_size"])).astype(np.float32) * 0.1).clip(-1, 1)
    )
    lr_g = jnp.float32(trainer.sched_g.lr)
    lr_d = jnp.float32(trainer.sched_d.lr)

    def k_steps(state, audio, lr_g, lr_d):
        def body(i, st):
            st, _ = trainer._train_step_fn(
                st, audio, None, lr_g, lr_d, fine_tuning=False
            )
            return st
        st = jax.lax.fori_loop(0, K_STEPS, body, state)
        return jax.tree_util.tree_leaves(st.gen_params)[0].reshape(-1)[0].astype(jnp.float32)

    # only the lower/compile/warm phase may fall back; once the fused loop is
    # warm the timed loop runs outside the try so one median never mixes the
    # two methodologies
    compiled = None
    try:
        compiled = jax.jit(k_steps).lower(state, audio, lr_g, lr_d).compile()
        float(compiled(state, audio, lr_g, lr_d))  # warm + force
    except Exception:
        # the bf16 D+G step inside a fori carry crashes this XLA's compiler
        # (SIGABRT in layout assignment; see docs/BENCH_NOTES.md); fall back to
        # HOST-pipelined chained steps through the trainer's own jitted wrapper
        # (which compiles): K async dispatches, ONE forced metric fetch at the
        # end — dispatch streams, so no ~50 ms RTT per step is added
        compiled = None
    times = []
    if compiled is not None:
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(compiled(state, audio, lr_g, lr_d))
            times.append((time.perf_counter() - t0) / K_STEPS)
    else:
        batch = {"audio": np.asarray(audio), "mel": None}
        state, m = trainer.train_step(state, batch)  # warm/compile
        float(m["loss_gen_all"])
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _i in range(K_STEPS):
                state, m = trainer.train_step(state, batch)
            float(m["loss_gen_all"])
            times.append((time.perf_counter() - t0) / K_STEPS)
    step_s = float(np.median(times))
    out = {
        "metric": "vocoder_gan_step_seconds",
        "value": step_s,
        "unit": "s/step",
        "batch": B,
        "dtype": "bf16" if bf16 else "f32",
        "opt_state_dtype": "bf16" if bf16_opt else "f32",
        "grad_dtype": "bf16" if bf16_grads else "f32",
        "methodology": "fused_k_loop" if compiled is not None else "host_pipelined",
        "audio_seconds_per_sec_train": B * h["segment_size"] / h["sampling_rate"] / step_s,
    }
    out.update(
        _cost_fields(
            jax.jit(trainer._train_step_fn, static_argnames=("fine_tuning",)).lower(
                state, audio, None, lr_g, lr_d, fine_tuning=False
            ),
            step_s,
        )
    )
    return out


def bench_input_pipeline(n_pairs_per_stem: int = 100, n_stems: int = 3) -> dict:
    """Host input-pipeline throughput next to the device step.

    Measures the REAL training input path — mmap'd npy triplets ->
    `FixedLenPairDataset.gather_batch` (native C++ row gather when built) ->
    `BatchLoader` prefetch threads — at the reference recipe shapes (batch 8,
    ref_frames 4, 256x256 fp32), on THIS host. The resulting batches/s against
    the measured device step time shows which side bounds the 4,500-epoch
    acoustic recipe (docs/BENCH_NOTES.md asserts input-bound; this records the
    number).
    """
    import shutil
    import tempfile
    from pathlib import Path

    from mri2speech_tpu.data.dataset import BatchLoader, FixedLenPairDataset
    from mri2speech_tpu.runtime.native import native_available

    root = Path(tempfile.mkdtemp(prefix="m2s_inbench_"))
    try:
        npy_dir = root / "pairs_ref4_npy"
        rng = np.random.default_rng(0)
        for s in range(n_stems):
            d = npy_dir / f"stem{s}"
            d.mkdir(parents=True)
            np.save(
                d / "mri.npy",
                rng.random((n_pairs_per_stem, 4, 1, 256, 256), dtype=np.float32),
            )
            np.save(
                d / "mel.npy",
                rng.standard_normal((n_pairs_per_stem, 4, 64)).astype(np.float32),
            )
            np.save(d / "mask.npy", np.ones((n_pairs_per_stem, 4), np.float32))
        ds = FixedLenPairDataset(str(root), ref_frames=4)
        idx = np.arange(len(ds))
        B = 8
        loader = BatchLoader(ds, idx, batch_size=B, drop_last=True, prefetch=2)
        # warm the page cache (the steady-state recipe re-reads resident pages)
        for _ in loader:
            pass
        n_batches = len(loader)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            seen = 0
            for batch in loader:
                seen += 1
            times.append((time.perf_counter() - t0) / seen)
        batch_s = float(np.median(times))
        bytes_per_batch = B * (4 * 1 * 256 * 256 + 4 * 64 + 4) * 4
        return {
            "metric": "input_pipeline_batch_seconds",
            "value": batch_s,
            "unit": "s/batch",
            "batch": B,
            "batches_per_sec": 1.0 / batch_s,
            "host_MBps": bytes_per_batch / batch_s / 1e6,
            "native_gather": bool(native_available()),
            "n_batches_per_epoch": n_batches,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    backend = jax.default_backend()
    from mri2speech_tpu.utils.profiling import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    a = bench_acoustic(use_bf16=(backend == "tpu"))
    a["backend"] = backend
    print(json.dumps(a))
    ip = bench_input_pipeline()
    # duty cycle: fraction of wall time the chip would be busy if the host
    # feeds it sequentially (prefetch overlaps, so this is the lower bound)
    ip["device_step_seconds"] = a["value"]
    ip["device_duty_cycle_if_serial"] = a["value"] / (a["value"] + ip["value"])
    ip["input_bound"] = bool(ip["value"] > a["value"])
    print(json.dumps(ip))
    v = bench_vocoder()
    v["backend"] = backend
    print(json.dumps(v))
    if backend == "tpu":
        for kw in (
            {"bf16": True},
            {"bf16_opt": True},
            {"bf16": True, "bf16_opt": True},
            # the round-3 proposed grad/loss dtype lever, measured at last:
            # bf16 grads + fp32 master params/moments, with and without
            # bf16 forwards
            {"bf16_grads": True},
            {"bf16": True, "bf16_grads": True},
        ):
            vb = bench_vocoder(**kw)
            vb["backend"] = backend
            print(json.dumps(vb))


if __name__ == "__main__":
    main()
