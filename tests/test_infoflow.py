"""Info-flow (recommender) DQN tests: dict observations end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xingtian_tpu.algos.dqn import DQNInfoFlowAlg
from xingtian_tpu.envs import VecEnv
from xingtian_tpu.envs.recsys import InfoFlowEnv
from xingtian_tpu.registry import Registers


def _make(n=16, **overrides):
    env = VecEnv(InfoFlowEnv(), n=n)
    model = Registers.model.build(
        "DqnRecModel", action_dim=10,
        model_config={"user_dim": 16, "item_dim": 16, "hist_len": 8})
    cfg = dict(BATCH_SIZE=64, UPDATE_FREQ=16, LRC=1e-3,
               TARGET_UPDATE_FREQ=200)
    cfg.update(overrides)
    return DQNInfoFlowAlg(model, env, cfg)


class TestInfoFlowEnv:
    def test_dict_observations(self):
        env = InfoFlowEnv()
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert set(obs) == {"user", "clicked", "viewed", "candidates"}
        assert obs["candidates"].shape == (10, 16)
        state, ts = env.step(state, jnp.asarray(3))
        assert float(ts.reward) in (0.0, 1.0)

    def test_click_updates_history(self):
        env = InfoFlowEnv()
        state, _ = env.reset(jax.random.PRNGKey(0))
        clicks = 0
        for t in range(20):
            state, ts = env.step(state, jnp.asarray(9))  # best-pull candidate
            clicks += int(ts.reward)
        assert int(state.clicked_pos) == clicks
        assert int(state.viewed_pos) == 20 - clicks


class TestInfoFlowDQN:
    def test_pytree_replay_roundtrip(self):
        alg = _make(n=4, BUFFER_SIZE=500, learning_starts=0)
        state = alg.init_state(jax.random.PRNGKey(0))
        state, m = jax.jit(alg.train_step)(state)
        assert np.isfinite(float(m["loss"]))
        # packed ring holds dict obs leaves once, [B, C] leading
        assert state.replay.obs["candidates"].shape[2:] == (10, 16)
        assert state.replay.obs["candidates"].shape[0] == 4

    @pytest.mark.slow
    def test_learns_above_random_ctr(self):
        """Random CTR on this env is ≈0.50; the agent must clearly beat it."""
        alg = _make()
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step, donate_argnums=0)
        best = 0.0
        for i in range(300):
            state, m = step(state)
            best = max(best, float(m["episode_reward_recent"]) / 20.0)
        assert best >= 0.58, f"info-flow DQN failed to beat random: {best}"
