"""Profiling & throughput instrumentation.

The reference's only profiler hook is TF RunMetadata FULL_TRACE every 10th
update (ppo2.py:277-287) plus an fps counter (:407-408). TPU-native
equivalents: ``jax.profiler`` traces on demand and a tiny rate meter whose
records can stream through the native telemetry ring
(utils.native.TelemetryRing).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    """steps/s / solves/s counter with exponential smoothing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.rate: Optional[float] = None
        self._t = time.perf_counter()

    def tick(self, units: float) -> float:
        now = time.perf_counter()
        dt = max(now - self._t, 1e-9)
        self._t = now
        inst = units / dt
        self.rate = inst if self.rate is None else (
            self.alpha * inst + (1 - self.alpha) * self.rate)
        return self.rate


@contextlib.contextmanager
def timed(label: str, sink=None) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink(label, dt)
    else:
        print(f"[timing] {label}: {dt * 1e3:.2f} ms")


def enable_compile_cache(path: str = ".jax_cache",
                         min_compile_secs: float = 10.0) -> str:
    """Persistent XLA compilation cache.

    The batch-in-lanes physics path (envs.blackpanther.step_batch) trades a
    very long first compile (~40 min for the 8-substep scan on a v5e) for
    ~4x runtime; with this cache the compile is paid once per
    config/batch-shape and reloaded in seconds afterwards.

    IRRL_CACHE_DIR overrides the location: the pytest conftest points it at
    a suite-private dir AND disables persistent-cache writes entirely —
    serializing the receding-horizon MPC executable on the CPU backend
    segfaults in jax's cache serializer (deterministic, reproduced at
    isolated cache dirs; TPU-backend writes from the production jobs are
    unaffected)."""
    import os

    import jax

    path = os.environ.get("IRRL_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
