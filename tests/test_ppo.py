"""End-to-end PPO tests — the milestone-2 slice (SURVEY §7.2): on-device
rollout → GAE → clipped losses → minibatch SGD, all in one jitted program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xingtian_tpu.algos.ppo import PPO
from xingtian_tpu.envs import VecEnv, make
from xingtian_tpu.registry import Registers


def _make_cartpole_ppo(**overrides):
    env = VecEnv(make("CartPole-v0"), n=10)
    model = Registers.model.build(
        "PpoMlp", state_dim=[4], action_dim=2,
        model_config={"hidden_sizes": [64, 64], "activation": "tanh"})
    cfg = dict(rollout_steps=200, BATCH_SIZE=200, NUM_SGD_ITER=8,
               LR=3e-4, ENTROPY_LOSS=0.01)
    cfg.update(overrides)
    return PPO(model, env, cfg)


class TestPPOCartPole:
    def test_learns_cartpole(self):
        """Reward must reach ≥150/200 within 25 updates (50k env steps).

        The reference's cartpole_ppo.yaml benchmark trains to ~195+; this
        asserts clear learning progress in a CI-sized budget.
        """
        alg = _make_cartpole_ppo()
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step, donate_argnums=0)
        best = 0.0
        for i in range(25):
            state, metrics = step(state)
            best = max(best, float(metrics["episode_reward_mean"]))
        assert best >= 150.0, f"PPO failed to learn CartPole: best={best}"

    def test_fixed_seed_determinism(self):
        """Golden-seed parity: identical seeds → bit-identical params."""
        def run():
            alg = _make_cartpole_ppo()
            state = alg.init_state(jax.random.PRNGKey(42))
            step = jax.jit(alg.train_step)
            for _ in range(3):
                state, metrics = step(state)
            return state.params, metrics

        p1, m1 = run()
        p2, m2 = run()
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            p1, p2)
        assert float(m1["loss"]) == float(m2["loss"])

    def test_metrics_keys(self):
        alg = _make_cartpole_ppo()
        state = alg.init_state(jax.random.PRNGKey(0))
        _, metrics = jax.jit(alg.train_step)(state)
        for k in ["loss", "actor_loss", "critic_loss", "entropy", "approx_kl",
                  "clip_frac", "episode_reward_mean", "episodes"]:
            assert k in metrics

    def test_env_step_accounting(self):
        alg = _make_cartpole_ppo()
        state = alg.init_state(jax.random.PRNGKey(0))
        state, _ = jax.jit(alg.train_step)(state)
        assert int(state.env_steps) == 200 * 10
        assert int(state.update_step) == 1


class TestPPOPendulum:
    def test_continuous_actions_run(self):
        env = VecEnv(make("Pendulum-v0"), n=8)
        model = Registers.model.build(
            "PpoMlp", state_dim=[3], action_dim=1, action_type="DiagGaussian")
        alg = PPO(model, env, dict(rollout_steps=64, BATCH_SIZE=128,
                                   NUM_SGD_ITER=4))
        state = alg.init_state(jax.random.PRNGKey(0))
        state, metrics = jax.jit(alg.train_step)(state)
        assert np.isfinite(float(metrics["loss"]))
        # reward is negative cost
        state, metrics = jax.jit(alg.train_step)(state)
        assert np.isfinite(float(metrics["actor_loss"]))


class TestPPOBreakoutGrid:
    def test_cnn_path_runs(self):
        env = VecEnv(make("Breakout"), n=4)
        model = Registers.model.build(
            "PpoCnn", state_dim=[10, 10, 4], action_dim=4, input_dtype="float32",
            model_config={"hidden_sizes": [64], "use_bf16": False})
        alg = PPO(model, env, dict(rollout_steps=16, BATCH_SIZE=32, NUM_SGD_ITER=2))
        state = alg.init_state(jax.random.PRNGKey(0))
        state, metrics = jax.jit(alg.train_step)(state)
        assert np.isfinite(float(metrics["loss"]))
