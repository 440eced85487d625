"""Asynchronous host trajectory farm with elastic load-shedding.

The reference's steady-state actor side is N explorer processes pushing
trajectory segments into the learner's queue, with an *elastic throttle*:
the Controller watches train-queue depth and issues ``decrease`` /
``increase`` commands; the Broker suspends/resumes explorer processes via
psutil (``xt/framework/broker.py:210-227`` — ``alloc_actor`` — and
``:536-554`` — ``alloc``).  On TPU the fast path needs none of this (envs
are on-device inside the jitted step), but *host* simulators (ALE, SC2 —
anything non-JAX) still follow the producer/consumer shape.  This module
is that path, TPU-native:

* ``AsyncTrajectoryFarm`` — a pool of host worker threads, each owning an
  env (:class:`~xingtian_tpu.envs.host.HostEnvProtocol`) and rolling out
  fixed-length segments under the *current host policy* (a numpy
  callable, refreshed from device params — the weight-distribution
  analog of ShareBuf fan-out, ``broker.py:394-421``);
* a bounded segment queue between farm and learner — the TPU keeps
  training while hosts step (the reference's async pipeline,
  ``sync_model_interval`` semantics live in how often the caller invokes
  :meth:`set_policy`);
* ``ElasticThrottle`` — the reference's load-shedding verbatim: queue
  deeper than the high-water mark → suspend workers (stop wasting host
  CPU producing stale off-policy data); drained below the low-water
  mark → resume.  Unlike the reference (whose monitor thread is
  *disabled* at ``broker.py:89-91``), this one is on by default.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Elastic throttle — alloc_actor semantics (broker.py:210-227)
# ---------------------------------------------------------------------------

@dataclass
class ElasticThrottle:
    """Decide suspend/resume from queue depth.

    Reference behaviour: depth > 5 → "decrease" two explorers; depth == 0
    for a sustained interval → "increase" one (``broker.py:210-227``).
    Watermarks and step sizes are parameters here.
    """

    high_water: int = 5
    low_water: int = 0
    decrease_step: int = 2
    increase_step: int = 1
    min_active: int = 1
    cooldown_s: float = 0.05
    _last_change: float = field(default=0.0, repr=False)

    def decide(self, depth: int, active: int, total: int,
               now: Optional[float] = None) -> int:
        """Return the change in active worker count (±k or 0)."""
        now = time.monotonic() if now is None else now
        if now - self._last_change < self.cooldown_s:
            return 0
        if depth > self.high_water and active > self.min_active:
            self._last_change = now
            return -min(self.decrease_step, active - self.min_active)
        if depth <= self.low_water and active < total:
            self._last_change = now
            return min(self.increase_step, total - active)
        return 0


# ---------------------------------------------------------------------------
# Trajectory segment
# ---------------------------------------------------------------------------

@dataclass
class Segment:
    """One fixed-length rollout chunk from one worker (time-major)."""

    obs: np.ndarray        # [T, *obs_shape]
    action: np.ndarray     # [T, ...]
    reward: np.ndarray     # [T]
    done: np.ndarray       # [T] bool
    last_obs: np.ndarray   # [*obs_shape] — bootstrap observation
    policy_version: int    # which set_policy() produced it (staleness)
    worker_id: int
    extras: Dict[str, np.ndarray] = field(default_factory=dict)
    # slim pixel transport (see AsyncTrajectoryFarm.slim_pixel_frames):
    # when set, ``obs``/``last_obs`` hold only each step's NEWEST frame
    # ([T, H, W, 1] / [H, W, 1]) and ``frame_prefix`` holds the 3 older
    # stack slots at segment start ([H, W, n_stack-1], already
    # boundary-zeroed by the host preprocessor); the learner re-stacks on
    # device (``Algorithm.restack_pixels``)
    frame_prefix: Optional[np.ndarray] = None
    # ``extras``: per-step behaviour-policy outputs ([T, ...] each) when the
    # policy returns ``(action, extras_dict)`` — e.g. behaviour logits for
    # V-trace (the reference ships these inside the trajectory too,
    # ``atari_impala_opt.py:60-88``)


def stack_segments(segments: Sequence[Segment]) -> Dict[str, np.ndarray]:
    """Batch segments → time-major arrays ``[T, B, ...]`` ready for
    ``jax.device_put`` (the lz4/plasma/zmq hop of the reference collapses
    into one host→HBM transfer)."""
    out = {
        "obs": np.stack([s.obs for s in segments], axis=1),
        "action": np.stack([s.action for s in segments], axis=1),
        "reward": np.stack([s.reward for s in segments], axis=1),
        "done": np.stack([s.done for s in segments], axis=1),
        "last_obs": np.stack([s.last_obs for s in segments], axis=0),
        "policy_version": np.asarray(
            [s.policy_version for s in segments], np.int32),
    }
    if segments and segments[0].extras:
        out["extras"] = {
            k: np.stack([s.extras[k] for s in segments], axis=1)
            for k in segments[0].extras
        }
    if segments and segments[0].frame_prefix is not None:
        out["frame_prefix"] = np.stack(
            [s.frame_prefix for s in segments], axis=0)   # [B, H, W, S-1]
    return out


# ---------------------------------------------------------------------------
# The farm
# ---------------------------------------------------------------------------

def _rows_of(env) -> int:
    """Env-instance rows an env object contributes: a BATCHED env (e.g.
    the native C++ farm, ``envs/native_farm.py``) is ``n`` internal envs
    behind one object."""
    return int(env.n) if getattr(env, "BATCHED", False) else 1


class AsyncTrajectoryFarm:
    """N host envs rolled out by worker threads into a bounded queue.

    ``policy(obs[1, ...]) -> action`` is any numpy callable; swap it with
    :meth:`set_policy` (e.g. a jitted apply + ``np.asarray`` refreshed
    every learner step — the reference's ``sync_model_interval``).

    An env object may be *batched* (``BATCHED=True`` + ``reset_batch`` /
    ``step_batch``): the worker then steps all its internal envs with ONE
    call per tick.  For the native C++ farm that call releases the GIL,
    so stepping parallelizes across cores underneath Python — the
    process-explorer scaling model of the reference
    (``broker.py:478-505``) without processes.
    """

    def __init__(self, env_fns: Sequence[Callable[[], object]],
                 rollout_len: int = 32,
                 queue_capacity: int = 64,
                 policy: Optional[Callable] = None,
                 throttle: Optional[ElasticThrottle] = None,
                 seed: int = 0,
                 batched_inference: bool = True,
                 envs_per_worker: int = 1,
                 inference_streams: int = 0,
                 discrete_actions: bool = True,
                 sync_epoch: bool = False,
                 slim_pixel_frames: bool = False):
        self._envs = [fn() for fn in env_fns]
        # ``envs_per_worker`` > 1 = the reference's ``vector_env_size``
        # (atari_impala_opt.py:35-60): each worker thread sweeps k envs and
        # issues ONE k-row inference request per step, amortizing the
        # host↔device round trip and the GIL churn across k transitions
        k = max(1, int(envs_per_worker))
        self._worker_envs = [self._envs[i:i + k]
                             for i in range(0, len(self._envs), k)]
        self.n_workers = len(self._worker_envs)
        self.rollout_len = int(rollout_len)
        self._q: "queue.Queue[Segment]" = queue.Queue(maxsize=queue_capacity)
        self._policy = policy or (
            lambda obs: np.zeros((obs.shape[0],), np.int32))
        self._policy_version = 0
        self._policy_lock = threading.Lock()
        # batched remote-inference service (Predictor parity,
        # xt/framework/predictor.py:31-98): workers share ONE device apply
        # per tick instead of a batch-1 round trip each — see
        # runtime/predictor.py for why this is the host-farm throughput fix
        self._predictor = None
        if batched_inference and self.n_workers > 1:
            from xingtian_tpu.runtime.predictor import BatchedPredictor
            # default 1 stream maximizes coalescing (right when the apply
            # is fast relative to sim stepping); raise it to pipeline a
            # latency-bound apply — e.g. a remote/tunneled device — at the
            # cost of smaller per-call batches
            # clamp streams so the per-stream compiled batch
            # (ceil(total/streams)) can never fall below the WIDEST
            # worker's request (with a ragged last worker that is
            # envs_per_worker, not total/n_workers)
            total_rows = sum(_rows_of(e) for e in self._envs)
            max_req = max(sum(_rows_of(e) for e in grp)
                          for grp in self._worker_envs)
            streams = min(max(1, int(inference_streams)),
                          max(1, total_rows // max_req))
            if getattr(self._policy, "stateful", False):
                # a stateful engine (device-resident frame cache) is a
                # serialized read-modify-write — one serving stream only
                streams = 1
            self._predictor = BatchedPredictor(
                self._policy, max_batch=total_rows,
                expected_rows=self._active_env_rows,
                n_streams=streams)
        if (getattr(self._policy, "stateful", False)
                and self._predictor is None and self.n_workers > 1):
            # a stateful engine's frame cache is read-modify-write; letting
            # multiple worker threads call it directly would silently
            # corrupt cached stacks (ADVICE r4 low #3) — the batched
            # predictor is the serialization point
            raise ValueError(
                "stateful policy with multiple workers requires "
                "batched_inference=True (the predictor serializes access "
                "to the engine's device-side frame cache)")
        self.throttle = throttle or ElasticThrottle()
        self._seed = seed
        # only a known-discrete action space may squeeze a trailing [k,1]
        # axis (a 1-D continuous Box action would silently lose its action
        # dim otherwise — ADVICE r3 low #4)
        self._discrete = bool(discrete_actions)
        # sync_epoch = the reference's ``async_flag=False`` explorers
        # (``xt/algorithm/ppo/ppo.py:50`` + agent.sync_model blocking):
        # each worker produces exactly one segment per env per epoch, then
        # blocks until the learner calls :meth:`release_epoch` after its
        # update + policy refresh.  Guarantees every drained batch is
        # on-policy (single policy_version) with zero discarded rollouts.
        self._sync_epoch = bool(sync_epoch)
        self._epoch_gates = [threading.Event() for _ in range(self.n_workers)]
        # slim pixel transport: stacked-frame observations are 4× redundant
        # (consecutive stacks share n_stack−1 frames), and on a
        # bandwidth-limited host→device link (≈50 MB/s through the axon
        # tunnel, ~0.5 ms per 84×84×4 step) the learner upload is the farm's
        # hard ceiling.  When enabled, segments carry each step's NEWEST
        # frame only + a 3-slot prefix; the learner reconstructs full
        # stacks on device (Algorithm.restack_pixels) — same data, ~4×
        # less wire.  Enable ONLY for frame-stacked envs (the host env
        # advertises FRAME_STACKED) — an RGB channel axis is not a stack.
        self._slim = bool(slim_pixel_frames)

        self._stop = threading.Event()
        self._gates = [threading.Event() for _ in range(self.n_workers)]
        for g in self._gates:
            g.set()                        # all workers start active
        self._dead: set = set()            # crashed workers: never resumed
        self._threads: List[threading.Thread] = []
        # stats (≈ explorer_stats counters, broker.py:462-476)
        self.stats = {
            "segments_produced": 0, "env_steps": 0,
            "suspends": 0, "resumes": 0, "worker_errors": 0,
        }
        self.errors: List[str] = []   # last error per crashed worker
        self._stats_lock = threading.Lock()
        # finished-episode returns from the real sims (explorer ep stats,
        # broker_stats' train_reward source) — last 100, like the
        # reference's mean_explore_reward window
        self._ep_returns: List[float] = []

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "AsyncTrajectoryFarm":
        for wid in range(self.n_workers):
            t = threading.Thread(
                target=self._worker, args=(wid,), daemon=True,
                name=f"farm-worker-{wid}")
            t.start()
            self._threads.append(t)
        return self

    def close(self):
        self._stop.set()
        if self._predictor is not None:
            self._predictor.close()
        for g in self._gates:
            g.set()                        # unblock suspended workers
        for g in self._epoch_gates:
            g.set()                        # unblock epoch-gated workers
        # drain so producers blocked on a full queue can observe _stop
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        for t in self._threads:
            t.join(timeout=2.0)
        for env in self._envs:
            close = getattr(env, "close", None)
            if callable(close):   # real sims (gym/Box2D/SC2) hold native
                try:              # resources the GC won't release
                    close()
                except Exception:  # noqa: BLE001 — teardown best-effort
                    pass

    # -- policy distribution (weight fan-out analog) ------------------------
    def set_policy(self, policy: Callable) -> int:
        with self._policy_lock:
            self._policy = policy
            self._policy_version += 1
            version = self._policy_version
        if self._predictor is not None:
            self._predictor.set_policy(policy)
        return version

    @property
    def inference_batch_mean(self) -> float:
        """Mean device-inference batch size (≈ active workers when the
        batched predictor is on; 1.0 on the legacy per-worker path)."""
        if self._predictor is not None:
            return self._predictor.mean_batch_size
        return 1.0

    # -- consumer side -------------------------------------------------------
    def drain(self, batch: int, timeout: float = 30.0) -> List[Segment]:
        """Blocking-pop ``batch`` segments (the learner's train_q.recv,
        ``learner.py:303-306``), then let the throttle react to the new
        queue depth."""
        out: List[Segment] = []
        deadline = time.monotonic() + timeout
        while len(out) < batch:
            if self._predictor is not None:
                # a dead inference service fails the drain immediately
                # instead of masquerading as a 120 s producer timeout
                self._predictor.raise_if_failed()
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise TimeoutError(
                    f"farm produced {len(out)}/{batch} segments in {timeout}s"
                    + (f"; worker errors: {self.errors[-3:]}"
                       if self.errors else ""))
            try:
                out.append(self._q.get(timeout=min(remaining, 0.5)))
            except queue.Empty:
                continue
        self._apply_throttle()
        return out

    def release_epoch(self) -> None:
        """Sync-epoch mode: open the next collection epoch (call after the
        learner update + :meth:`set_policy` refresh)."""
        for wid, g in enumerate(self._epoch_gates):
            if wid not in self._dead:
                g.set()

    def drain_arrays(self, batch: int, timeout: float = 30.0):
        return stack_segments(self.drain(batch, timeout))

    @property
    def queue_depth(self) -> int:
        return self._q.qsize()

    @property
    def active_workers(self) -> int:
        return sum(1 for g in self._gates if g.is_set())

    @property
    def episode_reward_mean(self) -> float:
        """Mean return of the last ≤100 finished host episodes (the
        reference's explorer ``mean_explore_reward``); NaN before the
        first episode completes."""
        with self._stats_lock:
            if not self._ep_returns:
                return float("nan")
            return float(np.mean(self._ep_returns))

    def _record_episode(self, ret: float) -> None:
        with self._stats_lock:
            self._ep_returns.append(float(ret))
            if len(self._ep_returns) > 100:
                del self._ep_returns[:len(self._ep_returns) - 100]

    def _active_env_rows(self) -> int:
        """Env instances on currently-active workers — how many inference
        rows the predictor should expect per farm-wide tick."""
        return sum(sum(_rows_of(e) for e in envs) for g, envs in
                   zip(self._gates, self._worker_envs) if g.is_set())

    # -- internals -----------------------------------------------------------
    def _apply_throttle(self):
        if self._sync_epoch:
            # lock-step collection: every env's segment is required each
            # epoch, so load-shedding would deadlock the drain
            return
        delta = self.throttle.decide(
            self.queue_depth, self.active_workers, self.n_workers)
        if delta < 0:
            # suspend the highest-id active workers (reference suspends an
            # arbitrary psutil child set, broker.py:536-545)
            for g in reversed(self._gates):
                if delta == 0:
                    break
                if g.is_set():
                    g.clear()
                    delta += 1
                    with self._stats_lock:
                        self.stats["suspends"] += 1
        elif delta > 0:
            for wid, g in enumerate(self._gates):
                if delta == 0:
                    break
                # a cleared gate may mean "crashed", not "throttled" —
                # resuming a dead worker would inflate active_workers and
                # make the predictor wait on rows that never arrive
                if not g.is_set() and wid not in self._dead:
                    g.set()
                    delta -= 1
                    with self._stats_lock:
                        self.stats["resumes"] += 1

    def _worker(self, wid: int):
        """Crash containment: the reference kills the whole explorer
        process on any error (``explorer.py:91-93`` → ``os._exit(4)``);
        here a crashed worker is recorded and parked (its gate cleared) so
        the rest of the farm keeps producing."""
        try:
            self._worker_loop(wid)
        except Exception as exc:  # noqa: BLE001 — worker isolation boundary
            with self._stats_lock:
                self.stats["worker_errors"] += 1
                self.errors.append(f"worker {wid}: {exc!r}")
            self._dead.add(wid)
            self._gates[wid].clear()

    def _worker_loop(self, wid: int):
        envs = self._worker_envs[wid]
        # one BATCHED env per worker → GIL-free native stepping path
        batched = envs[0] if (len(envs) == 1
                              and getattr(envs[0], "BATCHED", False)) else None
        k = batched.n if batched is not None else len(envs)
        base = sum(sum(_rows_of(e) for e in grp)
                   for grp in self._worker_envs[:wid])
        if batched is not None:
            # returned array is the env's internal buffer; contents are
            # copied into obs_buf at each sweep top before the next call
            obs = np.asarray(batched.reset_batch(self._seed + base))
        else:
            obs = np.stack([np.asarray(e.reset(self._seed + base + j))
                            for j, e in enumerate(envs)])      # [k, ...]
        ep_ret = np.zeros((k,), np.float64)   # running episode returns
        T = self.rollout_len
        rows = np.arange(base, base + k, dtype=np.int32)  # global env ids
        # stateful slim engine: device holds the frame stacks; first tick
        # must clear (the reset obs is a fresh stack)
        prev_done = np.ones((k,), bool)
        while not self._stop.is_set():
            self._gates[wid].wait()        # suspended ⇔ gate cleared
            if self._stop.is_set():
                return
            if self._sync_epoch:
                # wait for the learner to open this epoch (update done +
                # fresh policy installed) — ``async_flag=False`` semantics
                while not self._epoch_gates[wid].wait(timeout=0.5):
                    if self._stop.is_set():
                        return
                self._epoch_gates[wid].clear()
            with self._policy_lock:
                policy, version = self._policy, self._policy_version
            obs_buf = np.empty((T, *obs.shape), obs.dtype)     # [T, k, ...]
            act_buf: List = []
            rew_buf = np.empty((T, k), np.float32)
            done_buf = np.empty((T, k), bool)
            extras_buf: Dict[str, List] = {}
            stateful = getattr(policy, "stateful", False)
            for t in range(T):
                obs_buf[t] = obs
                if stateful:
                    # slim request: newest frame + row + clear — the
                    # device-side engine owns the rolling stacks
                    req = {"frame": np.ascontiguousarray(obs[..., -1:]),
                           "row": rows, "clear": prev_done.copy()}
                else:
                    req = obs
                if self._predictor is not None:
                    # ONE k-row request per sweep step: the predictor
                    # coalesces it with every other worker's rows into a
                    # single device apply
                    a, extras_t = self._predictor.predict_batch(req)
                else:
                    out = policy(req)
                    extras_t = {}
                    if isinstance(out, tuple):
                        a, extras_t = out
                    else:
                        a = out
                if a is None:
                    # predictor failed/closed mid-sweep: abandon the sweep
                    # (never step envs with fabricated actions)
                    if self._predictor is not None:
                        self._predictor.raise_if_failed()
                    return
                a = np.asarray(a)
                if a.ndim == 0:                    # scalar stub broadcast
                    a = np.full((k,), a)
                elif self._discrete and a.ndim == 2 and a.shape[-1] == 1:
                    a = a.reshape(k)               # [k,1] → discrete [k]
                act_buf.append(a)
                for key, v in extras_t.items():
                    extras_buf.setdefault(key, []).append(
                        np.asarray(v).reshape((k,) + np.asarray(v).shape[1:]))
                if batched is not None:
                    # ONE native call steps all k envs on the C++ pool;
                    # the GIL is released for its duration
                    o, r, d = batched.step_batch(a)
                    obs = np.asarray(o)
                    rew_buf[t] = r
                    done_buf[t] = d
                    ep_ret += r
                    for j in np.nonzero(d)[0]:
                        self._record_episode(ep_ret[j])
                        ep_ret[j] = 0.0
                else:
                    for j, env in enumerate(envs):
                        o, r, d = env.step(a[j])
                        obs[j] = np.asarray(o)
                        rew_buf[t, j] = r
                        done_buf[t, j] = d
                        ep_ret[j] += r
                        if d:
                            self._record_episode(ep_ret[j])
                            ep_ret[j] = 0.0
                prev_done = done_buf[t].copy()
            actions = np.stack(act_buf)                        # [T, k, ...]
            extras = {key: np.stack(v) for key, v in extras_buf.items()}
            for j in range(k):
                if self._slim:
                    seg = Segment(
                        obs=np.ascontiguousarray(obs_buf[:, j, ..., -1:]),
                        action=actions[:, j],
                        reward=rew_buf[:, j], done=done_buf[:, j],
                        last_obs=np.ascontiguousarray(obs[j][..., -1:]),
                        policy_version=version, worker_id=wid,
                        extras={key: v[:, j] for key, v in extras.items()},
                        # older stack slots at segment start — already
                        # boundary-zeroed by the host preprocessor
                        frame_prefix=np.ascontiguousarray(
                            obs_buf[0, j, ..., :-1]))
                else:
                    seg = Segment(
                        obs=obs_buf[:, j], action=actions[:, j],
                        reward=rew_buf[:, j], done=done_buf[:, j],
                        last_obs=obs[j].copy(),
                        policy_version=version, worker_id=wid,
                        extras={key: v[:, j] for key, v in extras.items()})
                while not self._stop.is_set():
                    try:
                        self._q.put(seg, timeout=0.5)
                        break
                    except queue.Full:
                        # producer-side backpressure: also give the
                        # throttle a chance to suspend us
                        self._apply_throttle()
            with self._stats_lock:
                self.stats["segments_produced"] += k
                self.stats["env_steps"] += T * k
