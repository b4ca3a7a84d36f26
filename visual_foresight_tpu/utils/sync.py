"""Shared trajectory counters for multi-process data collection.

Mirrors reference ``visual_mpc/utils/sync.py:4-26``: a lock-guarded shared int
used so N sim workers can pull globally unique trajectory indices.
"""

from multiprocessing import Value, Lock


class SyncCounter:
    def __init__(self, base_value=0):
        self._lock = Lock()
        self._value = Value('i', base_value)

    @property
    def ret_increment(self):
        with self._lock:
            ret = self._value.value
            self._value.value += 1
        return ret

    @property
    def value(self):
        with self._lock:
            return self._value.value


class ManagedSyncCounter(SyncCounter):
    """Same semantics but backed by a ``multiprocessing.Manager`` so it can be
    shipped through manager queues to pool workers."""

    def __init__(self, manager, base_value=0):
        self._lock = manager.Lock()
        self._value = manager.Value('i', base_value)
