"""Tracing / profiling utilities.

The reference has none (SURVEY.md §5.1 — only tqdm bars). This provides:
  * `StepTimer` — wall-clock per-step timing with EMA + percentile summary,
    cheap enough to leave on (host-side, no device sync unless asked).
  * `trace` — context manager around `jax.profiler` producing an
    xprof-compatible trace directory.
  * `device_memory_stats` — per-device live-bytes snapshot.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax
import numpy as np


class StepTimer:
    """EMA + windowed percentiles of step wall-times.

    Call `tick()` once per step (after a `block_until_ready` if exact device
    timing is wanted). `summary()` returns a dict for logging.
    """

    def __init__(self, window: int = 200, ema: float = 0.02):
        self.window = deque(maxlen=window)
        self.ema_coef = ema
        self.ema = None
        self._last = None
        self.count = 0

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.window.append(dt)
            self.ema = dt if self.ema is None else (
                self.ema_coef * dt + (1 - self.ema_coef) * self.ema)
            self.count += 1
        self._last = now
        return dt

    def summary(self) -> dict:
        if not self.window:
            return {"steps": 0}
        arr = np.asarray(self.window)
        return {
            "steps": self.count,
            "mean_ms": float(arr.mean() * 1e3),
            "ema_ms": float((self.ema or 0.0) * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
        }


def enable_persistent_compile_cache(
        path: str = "/tmp/rodygs_jax_cache",
        min_compile_secs: float = 5.0) -> None:
    """Persist compiled executables across process restarts.

    The 1080p joint pipeline has ~8 jit variants at ~160 s of (remote)
    compile each on the axon tunnel, and the remote-compile helper crashes
    intermittently under back-to-back large compiles; with this cache a
    restarted run skips straight to execution. Errors are non-fatal by
    default (`jax_raise_persistent_cache_errors=False`), so backends whose
    executables don't serialize simply fall back to fresh compiles.
    """
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@contextlib.contextmanager
def trace(logdir: str):
    """xprof-compatible device trace: `with trace("/tmp/trace"): step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    out = []
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out.append({
                "device": str(d),
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            })
    return out
