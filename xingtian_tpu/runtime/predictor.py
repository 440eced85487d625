"""BatchedPredictor — shared batched-inference service for host-farm actors.

Reference parity: the Predictor process (``xt/framework/predictor.py:31-98``)
serves remote inference for async algorithms, and the throughput champion
``AtariImpalaOpt`` batches inference across ``vector_env_size`` envs in one
graph call (``xt/agent/atari_impala_opt.py:60-137``).  Round 2 had neither:
every farm worker thread issued its own ``policy(obs[None])`` — a batch-1
device round trip per env step, serialized under the GIL, which is why the
host-farm path ran at 0.04× the reference (BENCH_r02).

TPU-native shape: one collector thread owns the device.  Workers enqueue
observation *vectors* (their ``vector_env_size`` envs' stacked obs — the
AtariImpalaOpt amortization) and block on an event; the collector gathers
pending requests until every expected row is present (or the adaptive
window closes), **pads the stack to a fixed row count** so XLA compiles
exactly one shape — compile latency through the tunnel is
seconds-to-minutes, so a varying batch dimension is not an option — runs
ONE jitted apply, and scatters result slices back.  In steady state the
batch ≈ every env in the farm: one device round trip serves the whole
farm's step.

Collection is adaptive because the farm's request arrivals are *not*
synchronized: after a batch returns, each worker re-steps its envs under
the GIL, so arrivals trickle in over host-milliseconds.  A fixed
sub-millisecond grace window (round 2's design) degrades to batch-1 under
exactly the load it was built for.  The collector instead fires when
``expected_rows()`` rows are present, or when no new request has arrived
for ``grace_s`` (idle-gap), or at a ``cap_s`` hard deadline.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


class _Request:
    __slots__ = ("obs", "rows", "event", "action", "extras")

    def __init__(self, obs, rows: int):
        self.obs = obs           # [rows, *obs_shape] array OR dict of such
        self.rows = rows
        self.event = threading.Event()
        self.action: Any = None
        self.extras: Dict[str, np.ndarray] = {}


def _req_rows(obs) -> int:
    if isinstance(obs, dict):
        return next(iter(obs.values())).shape[0]
    return obs.shape[0]


class BatchedPredictor:
    """Batch inference requests across worker threads.

    ``policy(obs[B, ...]) -> action[B]`` or ``(action[B], extras)`` is any
    batched numpy callable (e.g. :func:`make_behaviour_policy` output).
    ``max_batch`` should be the farm's TOTAL env count; input is always
    padded to ``max_batch`` rows so the jitted apply underneath compiles
    once.  ``expected_rows`` (optional callable) returns how many rows the
    collector should wait for before firing — typically the number of envs
    on currently-active workers.
    """

    def __init__(self, policy: Callable, max_batch: int,
                 grace_s: float = 0.002, cap_s: float = 0.05,
                 expected_rows: Optional[Callable[[], int]] = None,
                 n_streams: int = 1):
        self._policy = policy
        self._policy_lock = threading.Lock()
        self.max_batch = max(1, int(max_batch))
        self.grace_s = float(grace_s)
        self.cap_s = float(cap_s)
        # ``n_streams`` serving threads keep that many device calls IN
        # FLIGHT at once: when the apply is latency- rather than
        # compute-bound (a remote/tunneled device, or a small model), a
        # single stream serializes the farm on round trips — streams
        # pipeline them. The reference scales the same way by running
        # one Predictor process per explorer group
        # (predictor.py:101-132's per-predictor msg loops).
        self.n_streams = max(1, int(n_streams))
        # fixed compiled shape PER STREAM: each stream serves its share of
        # the farm, so padding to the full farm width would multiply
        # transfer+compute by n_streams for the same work
        self.pad_batch = -(-self.max_batch // self.n_streams)
        self._expected = expected_rows or (lambda: self.max_batch)
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        # first serving-stream exception (e.g. the policy raised): recorded
        # here, surfaced by predict_batch/raise_if_failed instead of being
        # silently lost on a daemon thread (ADVICE r3 medium)
        self.error: Optional[BaseException] = None
        # PredictStats parity (zeus/common/util/profile_stats.py:98-124)
        self.stats = {"requests": 0, "rows": 0, "batches": 0,
                      "wait_ms_total": 0.0}
        self._stats_lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._serve, daemon=True,
                             name=f"batched-predictor-{i}")
            for i in range(self.n_streams)]
        for t in self._threads:
            t.start()

    # -- worker side ---------------------------------------------------------
    def predict(self, obs: np.ndarray) -> Tuple[Any, Dict[str, np.ndarray]]:
        """Blocking single-observation inference (no batch axis).

        Returns ``(action, extras)`` with the batch axis stripped.
        """
        action, extras = self.predict_batch(np.asarray(obs)[None])
        return (np.asarray(action)[0],
                {k: v[0] for k, v in extras.items()})

    def predict_batch(self, obs) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        """Blocking vector inference: ``obs[k, ...] -> (action[k], extras)``.

        ``obs`` is a ``[k, ...]`` array, or a dict of aligned ``[k, ...]``
        arrays for structured requests (e.g. the slim-frame engine's
        ``{"frame", "row", "clear"}``).  One request per worker sweep —
        the AtariImpalaOpt ``vector_env_size`` amortization across the
        device round trip.
        """
        if not isinstance(obs, dict):
            obs = np.asarray(obs)
        if _req_rows(obs) > self.pad_batch:
            raise ValueError(
                f"request of {_req_rows(obs)} rows exceeds the per-stream "
                f"compiled batch {self.pad_batch} (max_batch={self.max_batch}"
                f" / n_streams={self.n_streams}) — lower envs_per_worker or "
                "n_streams")
        req = _Request(obs, _req_rows(obs))
        if self._stop.is_set():     # post-close call: don't hang forever
            self.raise_if_failed()  # stopped BECAUSE a stream died → raise
            self._fail_request(req)
            return req.action, req.extras
        t0 = time.monotonic()
        self._q.put(req)
        while not req.event.wait(timeout=1.0):
            if self._stop.is_set():   # closed while we were enqueueing
                self._fail_request(req)
                break
        with self._stats_lock:
            self.stats["wait_ms_total"] += (time.monotonic() - t0) * 1e3
        if req.action is None and self.error is not None:
            # the serving stream died — re-raise in the caller's thread so
            # the farm records a real error instead of stepping envs with
            # fabricated actions (ADVICE r3 medium + low #2)
            raise RuntimeError(
                "BatchedPredictor serving stream failed") from self.error
        return req.action, req.extras

    # -- learner side (weight fan-out analog) --------------------------------
    def set_policy(self, policy: Callable) -> None:
        with self._policy_lock:
            self._policy = policy

    @property
    def mean_batch_size(self) -> float:
        """Mean inference rows per device call (≈ farm env count when
        coalescing works; ~1 when it degrades to per-request calls)."""
        with self._stats_lock:
            b = self.stats["batches"]
            return self.stats["rows"] / b if b else 0.0

    def close(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        # release anyone still blocked: workers mid-sweep may have
        # enqueued (or be about to enqueue) after the streams exited —
        # answer with zero actions so their threads can observe the
        # farm's stop flag instead of hanging on event.wait() forever
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            self._fail_request(r)

    def raise_if_failed(self) -> None:
        """Surface a serving-stream failure to the learner side (called by
        the farm's drain loop so a dead predictor fails fast instead of
        timing out 120 s later)."""
        if self.error is not None:
            raise RuntimeError(
                "BatchedPredictor serving stream failed") from self.error

    @staticmethod
    def _fail_request(r: _Request) -> None:
        # ``action=None`` sentinel: callers must break out of their sweep
        # rather than step envs with fabricated zeros (wrong — and invalid
        # for continuous action spaces)
        r.action = None
        r.extras = {}
        r.event.set()

    # -- collector -----------------------------------------------------------
    def _collect(self, carry: Optional[_Request]) -> tuple:
        """Block for the first request, then accumulate until this
        stream's share of expected rows is present, the idle-gap closes,
        or the hard cap.  Returns ``(reqs, carry)`` — a request that
        would overflow the stream's compiled batch is carried to the
        next tick instead of being dropped or split."""
        if carry is not None:
            first = carry
        else:
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                return [], None
        reqs = [first]
        rows = first.rows
        hard_deadline = time.monotonic() + self.cap_s
        last_arrival = time.monotonic()
        while rows < self.pad_batch:
            # each stream waits for its SHARE of the farm's rows — with
            # n_streams pipelining, a stream that waited for everything
            # would leave the other streams idle
            expected = min(-(-self._expected() // self.n_streams),
                           self.pad_batch)
            if rows >= expected:
                break
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                now = time.monotonic()
                if now - last_arrival >= self.grace_s or now >= hard_deadline:
                    break
                time.sleep(0.0002)
                continue
            if rows + r.rows > self.pad_batch:
                return reqs, r          # overflow: serve now, carry r
            reqs.append(r)
            rows += r.rows
            last_arrival = time.monotonic()
        return reqs, None

    def _assemble(self, reqs, rows: int, policy):
        """Concatenate requests and pad to the stream's compiled shape.

        Dict requests pad via the policy's ``pad_request`` (a stateful
        engine routes padding rows to a scratch slot so they never
        corrupt real env state); array requests pad with zeros.
        """
        first = reqs[0].obs
        if isinstance(first, dict):
            obs = {k: np.concatenate([r.obs[k] for r in reqs], axis=0)
                   for k in first}
            if rows < self.pad_batch:
                pad = policy.pad_request(self.pad_batch - rows)
                obs = {k: np.concatenate([obs[k], pad[k]], axis=0)
                       for k in obs}
            return obs
        obs = np.concatenate([r.obs for r in reqs], axis=0)
        if rows < self.pad_batch:   # fixed compiled shape per stream
            pad = np.zeros((self.pad_batch - rows,) + obs.shape[1:],
                           obs.dtype)
            obs = np.concatenate([obs, pad], axis=0)
        return obs

    def _serve(self) -> None:
        carry: Optional[_Request] = None
        try:
            carry = self._serve_loop(carry)
        except BaseException as exc:  # noqa: BLE001 — daemon-thread boundary
            # a policy exception must not strand blocked workers: record
            # it, stop every stream, and fail everything queued so waiters
            # wake with the sentinel and re-raise in their own threads
            if self.error is None:
                self.error = exc
            self._stop.set()
            while True:
                try:
                    self._fail_request(self._q.get_nowait())
                except queue.Empty:
                    break
        finally:
            if carry is not None:   # don't strand a carried request
                self._fail_request(carry)

    def _serve_loop(self, carry: "Optional[_Request]"):
        while not self._stop.is_set():
            reqs, carry = self._collect(carry)
            if not reqs:
                continue
            rows = sum(r.rows for r in reqs)
            try:
                with self._policy_lock:
                    policy = self._policy
                obs = self._assemble(reqs, rows, policy)
                out = policy(obs)
            except BaseException:
                for r in reqs:          # wake this batch's waiters too
                    self._fail_request(r)
                raise
            if isinstance(out, tuple):
                action, extras = out
            else:
                action, extras = out, {}
            action = np.asarray(action)
            if action.ndim == 0:     # scalar stub policies broadcast
                action = np.full((self.pad_batch,), action)
            extras = {k: np.asarray(v) for k, v in extras.items()}
            lo = 0
            for r in reqs:
                hi = lo + r.rows
                r.action = action[lo:hi]
                r.extras = {k: v[lo:hi] for k, v in extras.items()}
                lo = hi
                r.event.set()
            with self._stats_lock:
                self.stats["requests"] += len(reqs)
                self.stats["rows"] += rows
                self.stats["batches"] += 1
        return carry
