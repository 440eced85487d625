"""BatchedPredictor — shared batched-inference service for host-farm actors.

Reference parity: the Predictor process (``xt/framework/predictor.py:31-98``)
serves remote inference for async algorithms, and the throughput champion
``AtariImpalaOpt`` batches inference across ``vector_env_size`` envs in one
graph call (``xt/agent/atari_impala_opt.py:60-137``).  Round 2 had neither:
every farm worker thread issued its own ``policy(obs[None])`` — a batch-1
device round trip per env step, serialized under the GIL, which is why the
host-farm path ran at 0.04× the reference (BENCH_r02).

TPU-native shape: one collector thread owns the device.  Workers enqueue
single observations and block on an event; the collector gathers every
pending request (plus a sub-millisecond grace window for late arrivals),
**pads the stack to a fixed batch** so XLA compiles exactly one shape —
compile latency through the tunnel is seconds-to-minutes, so a varying
batch dimension is not an option — runs ONE jitted apply, and scatters
results back.  In steady state the batch size ≈ number of active workers,
amortizing the host↔device latency across the whole farm.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


class _Request:
    __slots__ = ("obs", "event", "action", "extras")

    def __init__(self, obs: np.ndarray):
        self.obs = obs
        self.event = threading.Event()
        self.action: Any = None
        self.extras: Dict[str, np.ndarray] = {}


class BatchedPredictor:
    """Batch single-obs inference requests across worker threads.

    ``policy(obs[B, ...]) -> action[B]`` or ``(action[B], extras)`` is any
    batched numpy callable (e.g. :func:`make_behaviour_policy` output).
    ``max_batch`` should be the worker count; the input is always padded
    to ``max_batch`` so the jitted apply underneath compiles once.
    """

    def __init__(self, policy: Callable, max_batch: int,
                 grace_s: float = 0.0005):
        self._policy = policy
        self._policy_lock = threading.Lock()
        self.max_batch = max(1, int(max_batch))
        self.grace_s = float(grace_s)
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        # PredictStats parity (zeus/common/util/profile_stats.py:98-124)
        self.stats = {"requests": 0, "batches": 0, "wait_ms_total": 0.0}
        self._stats_lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._serve, daemon=True, name="batched-predictor")
        self._thread.start()

    # -- worker side ---------------------------------------------------------
    def predict(self, obs: np.ndarray) -> Tuple[Any, Dict[str, np.ndarray]]:
        """Blocking single-observation inference (no batch axis).

        Returns ``(action, extras)`` with the batch axis stripped.
        """
        req = _Request(np.asarray(obs))
        t0 = time.monotonic()
        self._q.put(req)
        req.event.wait()
        with self._stats_lock:
            self.stats["wait_ms_total"] += (time.monotonic() - t0) * 1e3
        return req.action, req.extras

    # -- learner side (weight fan-out analog) --------------------------------
    def set_policy(self, policy: Callable) -> None:
        with self._policy_lock:
            self._policy = policy

    @property
    def mean_batch_size(self) -> float:
        with self._stats_lock:
            b = self.stats["batches"]
            return self.stats["requests"] / b if b else 0.0

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)

    # -- collector -----------------------------------------------------------
    def _collect(self) -> list:
        """Block for the first request, then sweep the queue (with a short
        grace window so the rest of the farm's in-flight requests join)."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        reqs = [first]
        deadline = time.monotonic() + self.grace_s
        while len(reqs) < self.max_batch:
            try:
                reqs.append(self._q.get_nowait())
            except queue.Empty:
                if time.monotonic() >= deadline:
                    break
                time.sleep(0.0001)
        return reqs

    def _serve(self) -> None:
        while not self._stop.is_set():
            reqs = self._collect()
            if not reqs:
                continue
            n = len(reqs)
            obs = np.stack([r.obs for r in reqs])
            if n < self.max_batch:   # fixed compiled shape
                pad = np.zeros((self.max_batch - n,) + obs.shape[1:], obs.dtype)
                obs = np.concatenate([obs, pad], axis=0)
            with self._policy_lock:
                policy = self._policy
            out = policy(obs)
            if isinstance(out, tuple):
                action, extras = out
            else:
                action, extras = out, {}
            action = np.asarray(action)
            if action.ndim == 0:     # scalar stub policies broadcast
                action = np.full((obs.shape[0],), action)
            extras = {k: np.asarray(v) for k, v in extras.items()}
            for i, r in enumerate(reqs):
                r.action = action[i]
                r.extras = {k: v[i] for k, v in extras.items()}
                r.event.set()
            with self._stats_lock:
                self.stats["requests"] += n
                self.stats["batches"] += 1
