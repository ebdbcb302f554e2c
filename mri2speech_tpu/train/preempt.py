"""Preemption-safe training: signal -> safe-point checkpoint -> clean exit.

TPU capacity is routinely preempted (maintenance events, spot/preemptible
reservations, pod rescheduling), and the platform's notice is a SIGTERM with
a short grace window. The reference has no story for this — an interrupted
acoustic run loses everything since the last *best-val* epoch
(`train_mri_acoustic_model.py:508-521` saves on val improvement only), and
an interrupted vocoder run loses up to `checkpoint_interval` (5000) steps
(`train.py:199-211`).

Design — cooperative, not asynchronous: the signal handler only sets a flag;
the training loop polls it at step boundaries (the safe points — between
dispatches the host owns a consistent `TrainState`) and then saves a FULL
resume checkpoint through the trainer's existing checkpoint scheme, so
auto-resume needs no new restore path.

Multi-host: a preemption notice may land on one process only. Polling uses
an all-gather OR across processes so every host agrees on the same step to
stop and the sharded-orbax save (which requires all processes to
participate) is entered by everyone. Single-process meshes skip the
collective entirely.
"""
from __future__ import annotations

import signal
import threading
from typing import Optional, Sequence

import numpy as np

import jax


class PreemptionGuard:
    """Installs signal handlers; exposes a poll the training loop checks.

    Usage::

        with PreemptionGuard() as guard:
            for batch in loader:
                state, metrics = train_step(state, batch)
                if guard.should_stop():
                    save_full_resume_checkpoint(state)
                    break

    `should_stop()` is the multi-host-agreed flag (collective OR when
    `jax.process_count() > 1`); `.triggered` is the local, collective-free
    view. `trip()` raises the flag programmatically (tests, external
    preemption-notice watchers).
    """

    def __init__(
        self,
        signals: Sequence[int] = (signal.SIGTERM, signal.SIGINT),
        sync_every: int = 10,
    ) -> None:
        """sync_every: multi-host polls run the agreement collective every
        Nth step only (a per-step cross-host barrier is needless overhead;
        reaction latency stays <= N steps, well inside any grace window).
        Single-process runs always react at the next step regardless."""
        self._signals = tuple(signals)
        self._prev = {}
        self._event = threading.Event()
        self._installed = False
        self._sync_every = max(1, int(sync_every))
        self._polls = 0
        self._agreed = False

    # -- signal plumbing ----------------------------------------------------
    def _handler(self, signum, frame):  # noqa: ARG002
        self._event.set()
        # one graceful signal is the contract; restore the previous handlers
        # so a SECOND Ctrl-C / SIGTERM can force-quit a hung step or a
        # stalled checkpoint save instead of being swallowed
        self.uninstall()

    def install(self) -> "PreemptionGuard":
        if not self._installed:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handler)
            self._installed = True
        return self

    def uninstall(self) -> None:
        if self._installed:
            for s, prev in self._prev.items():
                signal.signal(s, prev)
            self._prev.clear()
            self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()

    # -- polling -------------------------------------------------------------
    def trip(self) -> None:
        """Raise the flag as if a signal had arrived."""
        self._event.set()

    @property
    def triggered(self) -> bool:
        """This process's local flag (no collective)."""
        return self._event.is_set()

    def should_stop(self) -> bool:
        """Multi-host-agreed stop decision; call at step boundaries.

        Once a poll agrees to stop, every later call returns True without
        further collectives. With `sync_every > 1` the collective runs on
        every Nth poll on EVERY host — the stride must be deterministic in
        the poll count alone (never short-circuited by the local flag),
        because a collective entered by one host but not another would
        deadlock the mesh. Training loops poll once per step in lockstep,
        so poll counts agree; a signal is acted on within `sync_every`
        steps.
        """
        if self._agreed:
            return True
        if jax.process_count() == 1:
            self._agreed = self._event.is_set()
            return self._agreed
        self._polls += 1
        if (self._polls % self._sync_every) != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self._event.is_set()], dtype=np.bool_)
        )
        self._agreed = bool(np.any(flags))
        return self._agreed


def maybe_resume_path(
    explicit: Optional[str], emergency: str
) -> Optional[str]:
    """Resume-path policy. The emergency snapshot wins when it exists —
    it is namespaced to the run's own checkpoint path, so its presence
    means the LAST run of this exact lineage was preempted and the
    snapshot holds strictly newer progress than any explicit --resume_ckpt
    (re-running the identical command after a preemption must not silently
    resume the older checkpoint and then garbage-collect the snapshot).
    Otherwise the explicit path; None when neither exists."""
    import os

    if os.path.exists(emergency):
        return emergency
    if explicit:
        return explicit
    return None
