"""Wall-clock timing utilities.

The reference's only instrumentation is a start/stop wall-clock ``Timer``
(``/root/reference/nn/utils.py:97-114``). We keep that surface and add a
device-synchronizing context manager for honest TPU timings (XLA dispatch is
async; without ``block_until_ready`` wall-clock lies).
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """start()/stop() wall clock; elapsed rounded to 3 decimals."""

    def __init__(self):
        self._start = 0.0
        self._elapsed = 0.0

    def start(self):
        self._start = time.time()

    def stop(self):
        self._elapsed = round(time.time() - self._start, 3)
        self._start = 0.0

    @property
    def elapsed_time(self) -> float:
        return self._elapsed


@contextlib.contextmanager
def device_timer(result: dict, key: str = "seconds", sync=None):
    """Times a block; if ``sync`` (a pytree) is given, blocks on it first.

    Usage::

        out = {}
        with device_timer(out, sync=lambda: x):
            x = step(x)
    """
    import jax

    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync() if callable(sync) else sync)
    result[key] = time.perf_counter() - t0
