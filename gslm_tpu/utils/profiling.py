"""Tracing / profiling hooks.

TPU-native replacement for the reference's manual CUDA-event timing
(train.py:60-61,89,144 cuda.Event pairs → TensorBoard iter_time) and its
gc-walking memory forensics (tests/test_render_backward_mem.py):

- ``trace(dir)``: jax.profiler trace context — view in TensorBoard or
  Perfetto; captures XLA/Mosaic kernel timelines on TPU.
- ``IterTimer``: wall-clock per-iteration timer with EMA, device-sync on
  demand (the jitted step is async; sync only when a reading is taken).
- ``device_memory_stats()``: live/peak HBM bytes per device.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    with jax.profiler.trace(log_dir, create_perfetto_link=False):
        yield


class IterTimer:
    def __init__(self, ema: float = 0.6):
        self._ema = ema
        self._last = time.perf_counter()
        self.value_ms = 0.0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = (now - self._last) * 1e3
        self._last = now
        self.value_ms = (self._ema * self.value_ms + (1 - self._ema) * dt
                         if self.value_ms else dt)
        return dt


def device_memory_stats() -> dict:
    import jax
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {"bytes_in_use": s.get("bytes_in_use"),
                           "peak_bytes_in_use": s.get("peak_bytes_in_use")}
        except Exception:
            out[str(d)] = {}
    return out


def enable_nan_debugging():
    """jax equivalent of torch autograd anomaly mode (reference
    train.py:267,285 --detect_anomaly): raise at the first NaN produced
    by any jitted computation."""
    import jax
    jax.config.update("jax_debug_nans", True)


def timeit_ms(fn, args, iters: int = 8, warmup: int = 1) -> float:
    """Median-of-3 wall-clock per call, in ms, one device sync per block.

    The shared harness for the scripts/profile_*.py A/B measurements.
    Caveats (measured on the axon-tunneled v5e): block_until_ready can
    return without syncing for scalar-only outputs — time graphs that
    RETURN ARRAYS; and only full-pipeline A/B diffs of real jitted graphs
    are trustworthy (in-jit microbenchmarks let XLA hoist work)."""
    import time

    import jax
    import numpy as np

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts)) * 1e3
