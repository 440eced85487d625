"""Per-stage wall-clock tracking + device profiling hooks.

Parity with the reference's profiling stack (``zeus/common/util/
profile_stats.py:33-276``): ``LoopTracker`` (with/enter/loop timings),
``SingleTracker``, ``TimerRecorder`` (mean/max over a window with
periodic reports) — used by its learner/explorer/broker to report
``wait_model_ms / explore_ms / train_ms`` style metrics
(``logger.py:110-112``).  The fused-step design needs far fewer probes:
one step = one device call, so the interesting split is
host-dispatch vs device-compute, plus XLA's own profiler for on-device
breakdown (``device_profile``; the reference has no device-level story —
tracemalloc+psutil only, ``profile_stats.py:278-293``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque
from typing import Dict, Optional


class TimerRecorder:
    """Rolling mean/max of named durations (``profile_stats.py:231-276``)."""

    def __init__(self, maxlen: int = 100):
        self._buf: Dict[str, deque] = defaultdict(lambda: deque(maxlen=maxlen))

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._buf[name].append(time.perf_counter() - t0)

    def append(self, name: str, seconds: float) -> None:
        self._buf[name].append(seconds)

    def report(self, prefix: str = "") -> Dict[str, float]:
        out = {}
        for name, vals in self._buf.items():
            if not vals:
                continue
            out[f"{prefix}{name}_ms"] = 1000.0 * sum(vals) / len(vals)
            out[f"{prefix}{name}_max_ms"] = 1000.0 * max(vals)
        return out


class LoopTracker:
    """Tracks the phases of a repeating loop: time between ``mark`` calls.

    ``with_time``/``enter_time``/``loop_time`` semantics of the reference
    collapse into named marks: ``tracker.mark("rollout")`` …
    """

    def __init__(self, maxlen: int = 100):
        self._timers = TimerRecorder(maxlen)
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def mark(self, name: str) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._timers.append(name, now - self._last)
        self._last = now

    def report(self, prefix: str = "") -> Dict[str, float]:
        return self._timers.report(prefix)


@contextlib.contextmanager
def device_profile(log_dir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto.

    Beyond-reference capability: the reference cannot see inside TF's
    runtime; ``jax.profiler`` shows per-op device time, HBM traffic and
    fusion decisions.
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_stats() -> Dict[str, float]:
    """RSS + device memory stats (≈ ``show_memory_stats``,
    ``profile_stats.py:278-293``, plus device-side numbers)."""
    out: Dict[str, float] = {}
    try:
        import psutil
        out["host_rss_mb"] = psutil.Process().memory_info().rss / 1e6
    except ImportError:
        pass
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            out["device_in_use_mb"] = stats.get("bytes_in_use", 0) / 1e6
            out["device_limit_mb"] = stats.get("bytes_limit", 0) / 1e6
    except Exception:
        pass
    return out
