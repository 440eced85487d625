"""Device-resident frame-stack cache (SlimFrameInference).

The engine must reproduce the host preprocessor's stacks EXACTLY from
newest-frame + clear-flag requests — including episode boundaries and
out-of-order interleaving across workers — and its padding rows must
never corrupt real env state.
"""

import numpy as np
import pytest

import jax

from xingtian_tpu.envs.ale import FakeALE
from xingtian_tpu.envs.async_farm import AsyncTrajectoryFarm
from xingtian_tpu.registry import Registers
from xingtian_tpu.runtime.slim_inference import SlimFrameInference


def _model(action_dim=6):
    return Registers.model.build(
        "ImpalaCnnOpt", state_dim=[84, 84, 4], action_dim=action_dim,
        input_dtype="uint8", model_config={"hidden_sizes": [32]})


def _params(model):
    return model.init_params(jax.random.PRNGKey(0))


class TestCacheExactness:
    def test_logits_match_full_stack_apply(self):
        """Engine logits == direct apply on the env's own host stacks,
        across resets (the cache replays the preprocessor's clear/push
        semantics on device)."""
        model = _model()
        params = _params(model)
        apply = jax.jit(model.apply)
        engine = SlimFrameInference(model, params, n_envs=2, seed=0)

        envs = [FakeALE(seed=s) for s in (0, 1)]
        obs = np.stack([e.reset(s) for s, e in enumerate(envs)])
        prev_done = np.ones((2,), bool)
        rng = np.random.RandomState(0)
        saw_boundary = False
        for t in range(30):
            req = {"frame": np.ascontiguousarray(obs[..., -1:]),
                   "row": np.arange(2, dtype=np.int32),
                   "clear": prev_done.copy()}
            a, extras = engine(req)
            ref_logits, _ = apply(params, obs)
            np.testing.assert_allclose(
                extras["logits"], np.asarray(ref_logits, np.float32),
                rtol=2e-4, atol=2e-4)
            acts = rng.randint(0, 6, size=2)
            for j, e in enumerate(envs):
                o, r, d = e.step(acts[j])
                obs[j] = np.asarray(o)
                prev_done[j] = d
                saw_boundary = saw_boundary or d
        assert saw_boundary, "need an episode boundary to test clearing"

    def test_interleaved_rows_keep_separate_state(self):
        """Requests covering different row subsets in different orders
        must not cross-contaminate cached stacks."""
        model = _model()
        params = _params(model)
        apply = jax.jit(model.apply)
        engine = SlimFrameInference(model, params, n_envs=3, seed=0)
        envs = [FakeALE(seed=s) for s in range(3)]
        obs = [np.asarray(e.reset(s)) for s, e in enumerate(envs)]
        dones = [True, True, True]

        def tick(idx):
            sub = np.array(idx, np.int32)
            req = {"frame": np.stack([obs[i][..., -1:] for i in idx]),
                   "row": sub,
                   "clear": np.array([dones[i] for i in idx], bool)}
            _, extras = engine(req)
            ref, _ = apply(params, np.stack([obs[i] for i in idx]))
            np.testing.assert_allclose(
                extras["logits"], np.asarray(ref, np.float32),
                rtol=2e-4, atol=2e-4)
            for i in idx:
                o, _, d = envs[i].step(0)
                obs[i] = np.asarray(o)
                dones[i] = d

        tick([0, 2])
        tick([1])
        tick([2, 1])
        tick([0])
        tick([0, 1, 2])

    def test_padding_rows_hit_scratch_only(self):
        model = _model()
        engine = SlimFrameInference(model, _params(model), n_envs=2)
        pad = engine.pad_request(3)
        assert pad["frame"].shape == (3, 84, 84, 1)
        assert np.all(pad["row"] == 2)          # scratch slot
        assert np.all(pad["clear"])
        before = np.asarray(engine._stack[:2]).copy()
        engine(pad)                              # serve a pad-only batch
        np.testing.assert_array_equal(np.asarray(engine._stack[:2]), before)

    def test_set_params_keeps_cache(self):
        model = _model()
        p0 = _params(model)
        engine = SlimFrameInference(model, p0, n_envs=1)
        f = np.random.RandomState(0).randint(
            0, 255, (1, 84, 84, 1)).astype(np.uint8)
        engine({"frame": f, "row": np.zeros(1, np.int32),
                "clear": np.ones(1, bool)})
        cached = np.asarray(engine._stack[0]).copy()
        engine.set_params(model.init_params(jax.random.PRNGKey(9)))
        np.testing.assert_array_equal(np.asarray(engine._stack[0]), cached)


class TestFarmWithEngine:
    def test_farm_end_to_end_slim_inference(self):
        """Full loop: workers ship slim requests, the predictor coalesces
        dict batches, the engine serves, IMPALA trains on the slim
        learner transport."""
        from xingtian_tpu.algos.impala import IMPALA

        model = _model()
        alg = IMPALA(model, None, dict(rollout_steps=8,
                                       sync_model_interval=1))
        state = alg.init_state(jax.random.PRNGKey(0))
        n_envs = 4
        engine = SlimFrameInference(model, state.actor_params,
                                    n_envs=n_envs, seed=0)
        farm = AsyncTrajectoryFarm(
            [FakeALE for _ in range(n_envs)], rollout_len=8,
            policy=engine, envs_per_worker=2,
            inference_streams=4,            # must clamp to 1 (stateful)
            slim_pixel_frames=True)
        assert farm._predictor.n_streams == 1
        farm.start()
        try:
            batch = farm.drain_arrays(n_envs, timeout=60.0)
            assert batch["obs"].shape[-1] == 1       # slim wire format
            assert "logits" in batch["extras"]
            state, metrics = jax.jit(alg.train_step_from_batch)(
                state, alg.batch_to_trajectory(batch))
            assert np.isfinite(float(metrics["loss"]))
            engine.set_params(state.actor_params)    # weight refresh
            farm.set_policy(engine)
            # the queue may still hold version-0 backlog; fresh segments
            # must eventually carry the bumped version
            import time as _t
            deadline = _t.monotonic() + 60.0
            vmax = 0
            while vmax < 1 and _t.monotonic() < deadline:
                batch = farm.drain_arrays(n_envs, timeout=60.0)
                vmax = int(np.max(batch["policy_version"]))
            assert vmax >= 1
        finally:
            farm.close()


class TestFarmTrainerSlimDevice:
    def test_yaml_slim_device_trains(self):
        """host_inference: slim_device end-to-end through FarmTrainer."""
        from xingtian_tpu.config import parse_config
        from xingtian_tpu.runtime.farm_trainer import FarmTrainer
        raw = {
            "alg_para": {"alg_name": "IMPALA",
                         "alg_config": {"rollout_steps": 8,
                                        "host_inference": "slim_device"}},
            "model_para": {"actor": {
                "model_name": "ImpalaCnnOpt", "action_dim": 6,
                "input_dtype": "uint8",
                "model_config": {"hidden_sizes": [32]}}},
            "env_para": {"env_name": "HostFarm",
                         "env_info": {"name": "FakeALE"}},
            "agent_para": {"agent_name": "x",
                           "agent_config": {"complete_step": 100000}},
            "env_num": 2,
            "benchmark": {"id": "t"},
        }
        tr = FarmTrainer(parse_config(raw)[0], with_workspace=False)
        assert tr._engine is not None
        assert tr.farm._predictor.n_streams == 1
        result = tr.train(max_updates=3)
        assert result["update_step"] == 3

    def test_slim_device_requires_stacked_env(self):
        from xingtian_tpu.config import parse_config
        from xingtian_tpu.runtime.farm_trainer import FarmTrainer
        raw = {
            "alg_para": {"alg_name": "IMPALA",
                         "alg_config": {"rollout_steps": 8,
                                        "host_inference": "slim_device"}},
            "model_para": {"actor": {"model_name": "ImpalaMlp",
                                     "action_dim": 2}},
            "env_para": {"env_name": "HostFarm",
                         "env_info": {"name": "NumpyCartPole"}},
            "agent_para": {"agent_name": "x",
                           "agent_config": {"complete_step": 1000}},
            "env_num": 2,
            "benchmark": {"id": "t"},
        }
        with pytest.raises(ValueError, match="frame-stacked"):
            FarmTrainer(parse_config(raw)[0], with_workspace=False)


class TestLargeBatchStress:
    @pytest.mark.slow
    def test_engine_512_rows_cpu(self):
        """Regression pin for the tunnel-abort class (VERDICT r4 weak #7):
        the engine must serve 512-row requests, partial-row requests, and
        scattered clears for many ticks in CPU mode with finite outputs
        and a consistent cache (spot-checked against a direct apply)."""
        model = _model(action_dim=4)
        params = _params(model)
        apply = jax.jit(model.apply)
        n = 512
        engine = SlimFrameInference(model, params, n_envs=n, seed=0)
        rng = np.random.RandomState(0)
        # mirror stacks host-side to verify the device cache at the end
        stacks = np.zeros((n, 84, 84, 4), np.uint8)
        for t in range(12):
            frames = rng.randint(0, 255, (n, 84, 84, 1)).astype(np.uint8)
            clear = rng.rand(n) < 0.1
            req = {"frame": frames,
                   "row": np.arange(n, dtype=np.int32),
                   "clear": clear}
            a, extras = engine(req)
            assert a.shape == (n,)
            assert np.all(np.isfinite(extras["logits"]))
            stacks[clear] = 0
            stacks = np.concatenate([stacks[..., 1:], frames], axis=-1)
        # cache correctness at scale: logits for a fresh tick must equal a
        # direct apply on the host-mirrored stacks
        frames = rng.randint(0, 255, (n, 84, 84, 1)).astype(np.uint8)
        stacks = np.concatenate([stacks[..., 1:], frames], axis=-1)
        _, extras = engine({"frame": frames,
                            "row": np.arange(n, dtype=np.int32),
                            "clear": np.zeros(n, bool)})
        ref_logits, _ = apply(params, stacks)
        np.testing.assert_allclose(
            extras["logits"], np.asarray(ref_logits, np.float32),
            rtol=2e-3, atol=2e-3)

    @pytest.mark.slow
    def test_engine_1024_rows_partial_requests(self):
        """1024-env cache served by alternating half-batches (the farm's
        per-worker request shape): row-subset requests must only touch
        their rows."""
        model = _model(action_dim=4)
        params = _params(model)
        n = 1024
        engine = SlimFrameInference(model, params, n_envs=n, seed=0)
        rng = np.random.RandomState(1)
        halves = [np.arange(0, n // 2, dtype=np.int32),
                  np.arange(n // 2, n, dtype=np.int32)]
        for t in range(8):
            rows = halves[t % 2]
            req = {"frame": rng.randint(0, 255, (rows.size, 84, 84, 1)
                                        ).astype(np.uint8),
                   "row": rows,
                   "clear": np.zeros(rows.size, bool)}
            a, extras = engine(req)
            assert a.shape == (rows.size,)
            assert np.all(np.isfinite(extras["logits"]))
