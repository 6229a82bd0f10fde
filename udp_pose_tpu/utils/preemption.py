"""Preemption-safe training (TPU-native failure recovery).

Cloud TPU VMs announce eviction (maintenance events, preemptible /
spot capacity) by delivering SIGTERM with a short grace window.  The
reference's recovery story is checkpoint auto-resume only
(deep_hrnet/tools/train.py:169-179 AUTO_RESUME; RSN engine.py:82-84
``--continue``): a preempted run loses everything since the last
epoch boundary / CHECKPOINT_PERIOD.  Here a signal handler flips a
flag, the train loops poll it at step boundaries, save a checkpoint
and exit cleanly — AUTO_RESUME then continues *exactly* where the run
stopped (the epoch loader is epoch-seeded and deterministic, so a
mid-epoch resume replays the batch sequence and skips the consumed
prefix; the RSN iteration loop resumes at iteration+1).

Multi-host: acting on a local flag would desynchronise the hosts (one
leaves the step loop while the rest enter a collective and hang), so
the flag is OR-reduced across processes — callers only act on the
synced value, and only at a cadence every host hits at the same step
(the train CLIs use their PRINT_FREQ boundary).
"""

from __future__ import annotations

import signal


class PreemptionGuard:
    """Installs a SIGTERM handler; ``should_stop()`` reports it safely.

    Single-process: ``should_stop()`` is the local flag (poll every
    step — it is just a bool read).  Multi-process: call with
    ``sync=True`` at a step every host reaches (collective!); unsynced
    calls return False so no host ever acts alone.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = False
        self._prev = {}
        for s in signals:
            self._prev[s] = signal.signal(s, self._handle)

    def _handle(self, signum, frame):
        self._flag = True

    @property
    def preempted(self) -> bool:
        """The local (this-process) flag; informational only."""
        return self._flag

    def should_stop(self, num_shards: int = 1, sync: bool = True) -> bool:
        if num_shards <= 1:
            return self._flag
        if not sync:
            return False
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self._flag], np.int32))
        return bool(np.asarray(flags).any())

    def restore(self):
        """Reinstall the previous handlers (for in-process tests)."""
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev = {}
