"""Profiling and tracing utilities.

The reference has no profiling story (SURVEY.md §5); here we wrap
``jax.profiler`` so any run can capture an xprof/perfetto trace, plus a
lightweight step timer for throughput accounting without traces.

Usage:
    with trace("traces/run1"):
        train_step(...)

    timer = StepTimer()
    for batch in data:
        with timer:
            state, m = step(state, batch)
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace (view with xprof/tensorboard/perfetto)."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in traces (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulate wall-clock step times; robust percentiles in summary."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self, skip_warmup: int = 1) -> dict:
        ts = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "steps": len(self.times),
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p95_s": float(np.percentile(ts, 95)),
            "steps_per_sec": float(1.0 / ts.mean()) if ts.mean() > 0 else 0.0,
        }


def device_memory_stats() -> dict:
    """Per-device memory usage when the backend exposes it."""
    import jax

    stats = {}
    for dev in jax.local_devices():
        try:
            s = dev.memory_stats()
            if s:
                stats[str(dev)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
        except Exception:
            continue
    return stats


def probe_link(size_mb: int = 16, repeats: int = 2) -> dict:
    """Measure the host<->device link: one ``size_mb`` float32 round trip.

    The shared relay's link swings ~2x intra-day independently of chip
    compute (BASELINE r13 B'), so every e2e/wire bench records this probe in
    its JSON — cross-session comparisons cite it instead of link-weather
    anecdotes (VERDICT r3 item 6). Reported number is the best of
    ``repeats`` (the first may pay handshake/allocation); MB/s counts both
    directions (2 x size_mb / wall).
    """
    import jax

    x = np.ones((size_mb * 1024 * 1024 // 4,), np.float32)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        d = jax.device_put(x)
        np.asarray(d)  # full fetch: completion barrier AND the down leg
        best = min(best, time.perf_counter() - t0)
    return {
        "size_mb": size_mb,
        "roundtrip_s": round(best, 4),
        "mb_per_s": round(2 * size_mb / best, 1),
        "device": str(jax.devices()[0]),
    }
