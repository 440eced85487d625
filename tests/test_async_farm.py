"""Async host trajectory farm + elastic throttle (load-shedding analog)."""

import threading
import time

import numpy as np
import pytest

from xingtian_tpu.envs.async_farm import (
    AsyncTrajectoryFarm, ElasticThrottle, stack_segments)
from xingtian_tpu.envs.host import NumpyCartPole


def _farm(n=4, rollout_len=8, **kw):
    return AsyncTrajectoryFarm(
        [NumpyCartPole for _ in range(n)], rollout_len=rollout_len, **kw)


class TestThrottle:
    def test_decrease_above_high_water(self):
        th = ElasticThrottle(high_water=5, decrease_step=2, cooldown_s=0.0)
        assert th.decide(depth=6, active=4, total=4) == -2

    def test_never_below_min_active(self):
        th = ElasticThrottle(high_water=5, decrease_step=2, min_active=1,
                             cooldown_s=0.0)
        assert th.decide(depth=100, active=2, total=4) == -1
        assert th.decide(depth=100, active=1, total=4) == 0

    def test_increase_when_drained(self):
        th = ElasticThrottle(low_water=0, increase_step=1, cooldown_s=0.0)
        assert th.decide(depth=0, active=2, total=4) == 1
        assert th.decide(depth=0, active=4, total=4) == 0

    def test_steady_band_no_change(self):
        th = ElasticThrottle(high_water=5, low_water=0, cooldown_s=0.0)
        assert th.decide(depth=3, active=4, total=4) == 0

    def test_cooldown(self):
        th = ElasticThrottle(high_water=5, cooldown_s=10.0)
        assert th.decide(depth=6, active=4, total=4, now=100.0) == -2
        assert th.decide(depth=6, active=2, total=4, now=100.5) == 0
        assert th.decide(depth=6, active=2, total=4, now=111.0) == -1


class TestFarm:
    def test_produces_and_drains(self):
        farm = _farm(n=4, rollout_len=8).start()
        try:
            batch = farm.drain_arrays(4, timeout=20.0)
            assert batch["obs"].shape == (8, 4, 4)      # [T, B, obs]
            assert batch["reward"].shape == (8, 4)
            assert batch["last_obs"].shape == (4, 4)
            assert farm.stats["segments_produced"] >= 4
        finally:
            farm.close()

    def test_policy_versions_propagate(self):
        farm = _farm(n=2, rollout_len=4).start()
        try:
            farm.drain(2, timeout=20.0)
            v = farm.set_policy(lambda obs: 1)
            assert v == 1
            deadline = time.monotonic() + 20.0
            while time.monotonic() < deadline:
                segs = farm.drain(2, timeout=20.0)
                if all(s.policy_version == 1 for s in segs):
                    # new policy always pushes right: action must be 1
                    assert all(np.all(s.action == 1) for s in segs)
                    return
            pytest.fail("new policy version never reached the segments")
        finally:
            farm.close()

    def test_backpressure_suspends_then_resumes(self):
        farm = _farm(
            n=4, rollout_len=2, queue_capacity=8,
            throttle=ElasticThrottle(high_water=4, low_water=1,
                                     decrease_step=2, increase_step=4,
                                     min_active=1, cooldown_s=0.0))
        farm.start()
        try:
            deadline = time.monotonic() + 20.0
            while farm.active_workers == 4 and time.monotonic() < deadline:
                time.sleep(0.05)   # don't drain: queue fills → suspend
            assert farm.active_workers < 4
            assert farm.stats["suspends"] >= 1
            # drain everything → resume
            deadline = time.monotonic() + 20.0
            while time.monotonic() < deadline:
                while farm.queue_depth > 0:
                    farm.drain(1, timeout=5.0)
                farm._apply_throttle()
                if farm.active_workers == 4:
                    break
            assert farm.active_workers == 4
            assert farm.stats["resumes"] >= 1
        finally:
            farm.close()

    def test_batched_inference_batches_across_workers(self):
        """Predictor parity (VERDICT r2 #2): with N workers sharing the
        batched predictor, the device sees batches ≈ active workers, not
        N× batch-1 calls."""
        def batched_policy(obs):
            time.sleep(0.002)   # stand-in for device round-trip latency
            return np.zeros((obs.shape[0],), np.int32)

        farm = _farm(n=8, rollout_len=4, policy=batched_policy).start()
        try:
            farm.drain(8, timeout=30.0)
            assert farm._predictor is not None
            # in the latency-bound regime nearly every worker's request
            # coalesces into each device call
            assert farm.inference_batch_mean >= 4.0, (
                f"mean inference batch {farm.inference_batch_mean:.2f} — "
                "requests are not coalescing")
        finally:
            farm.close()

    def test_batched_inference_off_uses_per_worker_policy(self):
        farm = _farm(n=2, rollout_len=4, batched_inference=False).start()
        try:
            farm.drain(2, timeout=20.0)
            assert farm._predictor is None
            assert farm.inference_batch_mean == 1.0
        finally:
            farm.close()

    def test_stack_segments_roundtrip(self):
        farm = _farm(n=3, rollout_len=5).start()
        try:
            segs = farm.drain(3, timeout=20.0)
            batch = stack_segments(segs)
            assert batch["action"].shape == (5, 3)
            assert batch["policy_version"].shape == (3,)
        finally:
            farm.close()

    def test_worker_crash_is_contained(self):
        """A crashing env parks its worker; the others keep producing
        (the reference instead kills the whole explorer process,
        explorer.py:91-93)."""
        class Bomb:
            def reset(self, seed):
                return np.zeros(4, np.float32)

            def step(self, action):
                raise RuntimeError("sim exploded")

        farm = AsyncTrajectoryFarm(
            [NumpyCartPole, Bomb], rollout_len=4)
        farm.start()
        try:
            segs = farm.drain(3, timeout=20.0)
            assert all(s.worker_id == 0 for s in segs)
            deadline = time.monotonic() + 10.0
            while farm.stats["worker_errors"] == 0 and \
                    time.monotonic() < deadline:
                time.sleep(0.02)
            assert farm.stats["worker_errors"] == 1
            assert "sim exploded" in farm.errors[0]
        finally:
            farm.close()

    def test_close_is_idempotent_and_fast(self):
        farm = _farm(n=2, rollout_len=4).start()
        t0 = time.monotonic()
        farm.close()
        farm.close()
        assert time.monotonic() - t0 < 10.0


class TestVectorizedWorkers:
    """envs_per_worker>1 = the reference's vector_env_size: one k-row
    inference request per worker sweep (atari_impala_opt.py:35-60)."""

    def test_segments_per_env_and_shapes(self):
        farm = AsyncTrajectoryFarm(
            [NumpyCartPole for _ in range(8)], rollout_len=6,
            envs_per_worker=4).start()
        try:
            assert farm.n_workers == 2
            segs = farm.drain(8, timeout=30.0)
            batch = stack_segments(segs)
            assert batch["obs"].shape == (6, 8, 4)
            assert batch["reward"].shape == (6, 8)
            # both workers contribute whole per-env segments
            assert {s.worker_id for s in segs} <= {0, 1}
        finally:
            farm.close()

    def test_per_env_trajectories_are_consistent(self):
        """Each env's segment must be a coherent single-env trajectory:
        replaying the env's dynamics from the recorded (obs, action)
        reproduces the recorded next obs."""
        farm = AsyncTrajectoryFarm(
            [NumpyCartPole for _ in range(4)], rollout_len=5,
            envs_per_worker=2, batched_inference=False).start()
        try:
            segs = farm.drain(4, timeout=30.0)
            for s in segs:
                # within a segment (no reset), consecutive obs must differ
                # in the way CartPole integrates: x' = x + dt * x_dot
                for t in range(len(s.reward) - 1):
                    if s.done[t]:
                        continue
                    x, x_dot = s.obs[t][0], s.obs[t][1]
                    np.testing.assert_allclose(
                        s.obs[t + 1][0], x + 0.02 * x_dot, rtol=1e-4)
        finally:
            farm.close()

    def test_predictor_coalesces_vector_requests(self):
        def batched_policy(obs):
            time.sleep(0.002)
            return np.zeros((obs.shape[0],), np.int32)

        farm = AsyncTrajectoryFarm(
            [NumpyCartPole for _ in range(16)], rollout_len=4,
            envs_per_worker=4, policy=batched_policy).start()
        try:
            farm.drain(16, timeout=30.0)
            # 4 workers x 4 rows each: device batches should approach 16
            assert farm.inference_batch_mean >= 8.0, (
                f"mean rows/call {farm.inference_batch_mean:.2f}")
        finally:
            farm.close()

    def test_extras_sliced_per_env(self):
        def policy_with_extras(obs):
            b = obs.shape[0]
            return (np.zeros((b,), np.int32),
                    {"logits": np.arange(b * 2, dtype=np.float32).reshape(b, 2)})

        farm = AsyncTrajectoryFarm(
            [NumpyCartPole for _ in range(4)], rollout_len=3,
            envs_per_worker=2, policy=policy_with_extras).start()
        try:
            segs = farm.drain(4, timeout=30.0)
            for s in segs:
                assert s.extras["logits"].shape == (3, 2)
        finally:
            farm.close()


class TestPipelinedStreams:
    def test_streams_keep_multiple_calls_in_flight(self):
        """With a latency-bound policy (tunnel-RTT stand-in), n_streams
        must keep >1 device call concurrently in flight; a single stream
        must keep exactly 1."""
        lock = threading.Lock()

        def make_policy(tracker):
            def slow_policy(obs):
                with lock:
                    tracker["live"] += 1
                    tracker["peak"] = max(tracker["peak"], tracker["live"])
                time.sleep(0.02)
                with lock:
                    tracker["live"] -= 1
                return np.zeros((obs.shape[0],), np.int32)
            return slow_policy

        for streams, want_peak in ((1, 1), (4, 2)):
            tracker = {"live": 0, "peak": 0}
            farm = AsyncTrajectoryFarm(
                [NumpyCartPole for _ in range(32)], rollout_len=8,
                envs_per_worker=4, policy=make_policy(tracker),
                inference_streams=streams).start()
            try:
                farm.drain(32, timeout=60.0)
                if streams == 1:
                    assert tracker["peak"] == 1, tracker
                else:
                    assert tracker["peak"] >= want_peak, tracker
            finally:
                farm.close()

    def test_single_stream_remains_default(self):
        farm = AsyncTrajectoryFarm(
            [NumpyCartPole for _ in range(4)], rollout_len=4).start()
        try:
            assert farm._predictor.n_streams == 1
        finally:
            farm.close()
