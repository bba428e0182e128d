"""Preemption-safe training: SIGTERM -> global consensus -> checkpoint.

The reference has no failure/elastic story (SURVEY.md §5: only
KeyboardInterrupt cleanup handlers, /root/reference/main.py:144-157). On
TPU fleets, maintenance events and spot reclaims deliver SIGTERM with a
short grace window; without handling it a run loses everything since the
last ``save_frequency`` checkpoint. ``PreemptionGuard`` turns the signal
into a clean stop: the handler only sets a host-local flag, and the
trainer polls ``consensus()`` at points that are program-order-identical
on every process (log-frequency boundaries and epoch ends), so on a
multi-process mesh all hosts agree to stop at the SAME step and the Orbax
save (which every process must join) cannot deadlock on a half-signaled
pod. The signal may land on any subset of hosts — consensus is a global
OR via ``process_allgather``.
"""

from __future__ import annotations

import signal
from typing import Dict, Tuple

import numpy as np

import jax


class PreemptionGuard:
    """Installable SIGTERM latch with multi-host consensus.

    Usage::

        guard = PreemptionGuard().install()
        try:
            ...  # poll guard.consensus() at host-identical program points
        finally:
            guard.uninstall()

    ``install``/``uninstall`` save and restore the previous handlers, so
    library users keep their own SIGTERM disposition outside ``train()``.
    Signal handlers only run in the main thread; polling from the train
    loop (also the main thread) needs no locking.
    """

    def __init__(self, signals: Tuple[int, ...] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._prev: Dict[int, object] = {}
        self._flag = False

    def install(self) -> "PreemptionGuard":
        for sig in self._signals:
            self._prev[sig] = signal.signal(sig, self._on_signal)
        return self

    def uninstall(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()

    def _on_signal(self, signum, frame):
        # Async-signal context: only set the flag. Saving a checkpoint
        # here would re-enter JAX/Orbax at an arbitrary bytecode boundary.
        self._flag = True

    @property
    def signaled(self) -> bool:
        """This host's local flag (no communication)."""
        return self._flag

    def consensus(self) -> bool:
        """True iff ANY process was signaled — identical on all processes.

        A collective on multi-process meshes: every process MUST call it
        at the same program point the same number of times (the trainer
        polls only at log-frequency boundaries and epoch ends, whose
        counts are host-identical because batch counts are).
        """
        if jax.process_count() == 1:
            return self._flag
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self._flag], dtype=np.bool_))
        return bool(np.any(flags))
