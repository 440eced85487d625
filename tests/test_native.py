"""Native C++ env farm tests: build, dynamics parity with the JAX env,
auto-reset semantics, jittable surface, and use inside an algorithm."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def farm():
    from xingtian_tpu.envs.native_farm import NativeFarmEnv
    return NativeFarmEnv("CartPole", n=32, seed=0)


class TestNativeFarm:
    def test_build_and_reset(self, farm):
        state, obs = farm.reset(jax.random.PRNGKey(0))
        assert obs.shape == (32, 4)
        assert float(jnp.max(jnp.abs(obs))) <= 0.05  # reset bounds

    def test_dynamics_match_jax_cartpole(self, farm):
        """One-step dynamics must equal the pure-JAX CartPole bit-for-bit
        (same constants, same Euler integration)."""
        from xingtian_tpu.envs.classic import CartPole, CartPoleState
        obs0 = farm._host_reset(0)
        jenv = CartPole()
        for action in (0, 1):
            js = CartPoleState(
                x=jnp.asarray(obs0[0, 0]), x_dot=jnp.asarray(obs0[0, 1]),
                theta=jnp.asarray(obs0[0, 2]), theta_dot=jnp.asarray(obs0[0, 3]),
                time=jnp.asarray(0))
            _, jts = jenv.step(js, jnp.asarray(action))
            obs_n, rew, done = farm._host_step(
                0, np.full((32,), action, np.int32))
            np.testing.assert_allclose(
                np.asarray(jts.obs), obs_n[0], rtol=1e-5, atol=1e-6)
            obs0 = obs_n  # second action continues from stepped state

    def test_autoreset(self, farm):
        farm._host_reset(0)
        acts = np.zeros((32,), np.int32)
        total_dones = 0
        for _ in range(250):
            obs, rew, done = farm._host_step(0, acts)
            total_dones += int(done.sum())
            # post-done obs must be freshly reset (within bounds)
            if done.any():
                assert np.all(np.abs(obs[done]) <= 0.05 + 1e-6)
        assert total_dones >= 32  # constant action tips every env

    def test_jit_surface(self, farm):
        state, obs = farm.reset(jax.random.PRNGKey(0))
        step = jax.jit(farm.step)
        for _ in range(5):
            state, ts = step(state, jnp.zeros((32,), jnp.int32))
        assert ts.obs.shape == (32, 4)
        assert bool(jnp.all(ts.reward == 1.0))

    def test_ppo_trains_on_native_farm(self):
        """The native farm drops into PPO via the same env interface."""
        from xingtian_tpu.envs.native_farm import NativeFarmEnv
        from xingtian_tpu.algos.ppo import PPO
        from xingtian_tpu.registry import Registers
        env = NativeFarmEnv("CartPole", n=16, seed=1)
        model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
        alg = PPO(model, env, dict(rollout_steps=64, BATCH_SIZE=256,
                                   NUM_SGD_ITER=2))
        state = alg.init_state(jax.random.PRNGKey(0))
        state, m = jax.jit(alg.train_step)(state)
        assert np.isfinite(float(m["loss"]))
        assert int(state.env_steps) == 64 * 16


class TestAtariStubParity:
    """The C++ AtariStub must match the Python FakeALE adapter EXACTLY —
    same FakeAtariCore dynamics, same preprocessing stack (repeat-4 +
    2-frame pixel max, BT.601 luma, index-map resize, 4-frame uint8
    stack, noop/fire reset, life-loss episodic done).  ``max_noops=1``
    makes both pipelines fully deterministic."""

    def test_exact_parity_300_steps(self):
        from xingtian_tpu.envs.ale import FakeALE
        from xingtian_tpu.envs.native_farm import NativeVecHostEnv

        n = 3
        native = NativeVecHostEnv("AtariStub", n=n, n_threads=2, seed=0,
                                  max_noops=1)
        pys = [FakeALE(max_noops=1) for _ in range(n)]
        try:
            obs_n = native.reset_batch(100)
            obs_p = np.stack([p.reset(100 + j) for j, p in enumerate(pys)])
            assert obs_n.shape == (n, 84, 84, 4) and obs_n.dtype == np.uint8
            np.testing.assert_array_equal(obs_n, obs_p)
            rng = np.random.RandomState(0)
            # 300 macro steps = 1200 raw steps: crosses many life losses
            # (every 40 raw) and several game overs (every 120 raw)
            for t in range(300):
                a = rng.randint(0, 4, size=n).astype(np.int32)
                on, rn, dn = native.step_batch(a)
                op, rp, dp = zip(*[p.step(a[j]) for j, p in enumerate(pys)])
                np.testing.assert_array_equal(on, np.stack(op), err_msg=f"t={t}")
                np.testing.assert_array_equal(rn, np.asarray(rp, np.float32))
                np.testing.assert_array_equal(dn, np.asarray(dp))
        finally:
            native.close()

    def test_episode_boundaries_occur(self):
        """Sanity: the parity window actually exercises done transitions."""
        from xingtian_tpu.envs.native_farm import NativeVecHostEnv
        env = NativeVecHostEnv("AtariStub", n=2, seed=0, max_noops=1)
        try:
            env.reset_batch(0)
            dones = 0
            for _ in range(200):
                _, _, d = env.step_batch(np.zeros(2, np.int32))
                dones += int(d.sum())
            assert dones >= 10    # life losses every 10 macro steps
        finally:
            env.close()


class TestNativeBatchedFarm:
    """Batched env objects through the async trajectory farm: one
    GIL-free native call per worker tick."""

    def _farm(self, **kw):
        from xingtian_tpu.envs.async_farm import AsyncTrajectoryFarm
        from xingtian_tpu.envs.native_farm import NativeFakeALE
        return AsyncTrajectoryFarm(
            [lambda: NativeFakeALE(n=4, n_threads=1, seed=0)
             for _ in range(2)],
            rollout_len=8, envs_per_worker=1,
            policy=lambda obs: np.zeros((obs.shape[0],), np.int32), **kw)

    def test_segments_from_batched_envs(self):
        farm = self._farm(batched_inference=False)
        farm.start()
        try:
            segs = farm.drain(8, timeout=30.0)
        finally:
            farm.close()
        assert len(segs) == 8
        s = segs[0]
        assert s.obs.shape == (8, 84, 84, 4) and s.obs.dtype == np.uint8
        assert s.reward.shape == (8,)
        # row accounting: 2 workers x 4 internal envs = 8 rows
        assert farm._active_env_rows() in (0, 8)

    def test_slim_transport_from_batched_envs(self):
        farm = self._farm(batched_inference=False, slim_pixel_frames=True)
        farm.start()
        try:
            segs = farm.drain(4, timeout=30.0)
        finally:
            farm.close()
        s = segs[0]
        assert s.obs.shape == (8, 84, 84, 1)        # newest frame only
        assert s.frame_prefix.shape == (84, 84, 3)  # older stack slots

    def test_farm_trainer_native_impala(self):
        """FarmTrainer end-to-end over the native farm (CPU learner)."""
        from xingtian_tpu.config import parse_config
        from xingtian_tpu.runtime.farm_trainer import FarmTrainer
        raw = {
            "alg_para": {"alg_name": "IMPALA",
                         "alg_config": {"rollout_steps": 8,
                                        "sync_model_interval": 2}},
            "model_para": {"actor": {
                "model_name": "ImpalaCnnOpt", "action_dim": 4,
                "input_dtype": "uint8",
                "model_config": {"hidden_sizes": [32]}}},
            "env_para": {"env_name": "HostFarm",
                         "env_info": {"name": "NativeFakeALE",
                                      "n_threads": 1}},
            "agent_para": {"agent_name": "x",
                           "agent_config": {"complete_step": 100000,
                                            "vector_env_size": 4}},
            "env_num": 2,
            "benchmark": {"id": "native_farm_smoke"},
        }
        cfg = parse_config(raw)[0]
        tr = FarmTrainer(cfg, with_workspace=False)
        assert tr._batched_env and tr.farm._slim
        assert tr.farm.n_workers == 2
        res = tr.train(max_updates=3)
        assert res["update_step"] == 3
        assert np.isfinite(res["loss"])


class TestNativeFarmEvaluateAndCLI:
    def test_cli_native_yaml_trains(self, tmp_path):
        """The native-farm YAML drives end-to-end through xt_main."""
        import os
        from xingtian_tpu.main import main
        examples = os.path.join(os.path.dirname(__file__), "..", "examples")
        rc = main(["-f", os.path.join(
            examples, "hostfarm_native_breakout_impala.yaml"),
            "-t", "train", "--max_updates", "2",
            "--archive_root", str(tmp_path)])
        assert rc == 0

    def test_evaluate_native_checkpoints(self, tmp_path):
        """-t evaluate works for checkpoints trained on the BATCHED
        native farm (the evaluator adapts the batch env to one row)."""
        from xingtian_tpu.config import parse_config
        from xingtian_tpu.runtime.evaluate import evaluate_from_archive
        from xingtian_tpu.runtime.farm_trainer import FarmTrainer
        raw = {
            "alg_para": {"alg_name": "IMPALA",
                         "alg_config": {"rollout_steps": 8,
                                        "save_model": True,
                                        "save_interval": 2}},
            "model_para": {"actor": {
                "model_name": "ImpalaCnnOpt", "action_dim": 4,
                "input_dtype": "uint8",
                "model_config": {"hidden_sizes": [32]}}},
            "env_para": {"env_name": "HostFarm",
                         "env_info": {"name": "NativeFakeALE",
                                      "n_threads": 1}},
            "agent_para": {"agent_name": "x",
                           "agent_config": {"complete_step": 100000,
                                            "vector_env_size": 4}},
            "env_num": 2,
            "benchmark": {"id": "native_eval_smoke"},
        }
        cfg = parse_config(raw)[0]
        tr = FarmTrainer(cfg, seed=0, archive_root=str(tmp_path))
        tr.train(max_updates=2)
        cfg.benchmark["eval"] = {"gap": 1, "episodes_per_eval": 2}
        rows = evaluate_from_archive(cfg, archive_root=str(tmp_path))
        assert len(rows) >= 1
        assert all(np.isfinite(r["eval_reward"]) for r in rows)
