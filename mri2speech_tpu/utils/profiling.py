"""Tracing / profiling subsystem.

The reference has only wall-clock epoch timing and per-batch s/b prints
(`train.py:133,196-197,262`). Here profiling is first-class:

* :func:`trace` — context manager around `jax.profiler.trace`, producing a
  TensorBoard-loadable XPlane trace of device + host activity
* :class:`StepTimer` — lightweight step timing with percentile summaries,
  logged as `perf/*` scalars by the trainers
* :func:`device_memory_stats` — per-device live/peak HBM bytes where the
  backend exposes them (the `torch.cuda.max_memory_allocated` analogue)
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-duration tracker (seconds)."""

    def __init__(self, window: int = 200) -> None:
        self.window = window
        self._durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() without start()")
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._durations.append(dt)
        if len(self._durations) > self.window:
            self._durations.pop(0)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self._durations:
            return {}
        d = np.asarray(self._durations)
        return {
            "steps_per_sec": float(1.0 / d.mean()),
            "step_seconds_mean": float(d.mean()),
            "step_seconds_p50": float(np.percentile(d, 50)),
            "step_seconds_p90": float(np.percentile(d, 90)),
            "step_seconds_max": float(d.max()),
        }


def enable_persistent_compilation_cache(
    min_compile_time_secs: float = 0.3,
) -> str:
    """Turn on JAX's persistent compilation cache, one dir per backend.

    Measured working through the axon remote-compile tunnel on this host
    (toy jit: 170 s cold -> 0.9 s warm), so benchmark/tool reruns skip
    minutes of remote compiles. Execution timings are unaffected — the
    cache shortcuts compilation only. The dir is suffixed with the backend
    name because mixing TPU remote-compile and CPU AOT entries in one dir
    warns/can SIGABRT after toolchain changes (see CLAUDE.md).

    Returns the cache directory path.
    """
    import os

    path = os.path.expanduser(f"~/.cache/jax_comp_cache_{jax.default_backend()}")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    return path


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """{device: {bytes_in_use, peak_bytes_in_use, ...}} where available."""
    out: Dict[str, Dict[str, int]] = {}
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[str(dev)] = {
                k: int(v)
                for k, v in stats.items()
                if isinstance(v, (int, np.integer))
            }
    return out
