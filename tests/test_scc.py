"""SCC tests: counterfactual credits, separate optimizers, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xingtian_tpu.algos.scc import SCC, SCCCritic
from xingtian_tpu.envs.multi_agent import CatchPigs


def _make(**overrides):
    env = CatchPigs(max_steps=20, pig_laziness=1.0)
    cfg = dict(episodes_per_collect=8, BATCH_SIZE=16, learning_starts=16,
               train_per_collect=2, TARGET_UPDATE_FREQ=100)
    cfg.update(overrides)
    return SCC(env, cfg)


class TestCredits:
    def test_two_agent_counterfactual(self):
        """credit_i = V(full) − V(block_i zeroed), exactly."""
        alg = _make()
        state = alg.init_state(jax.random.PRNGKey(0))
        B, T = 2, 4
        sa = jax.random.normal(
            jax.random.PRNGKey(1), (B, T, alg.n_agents * alg.block_dim))
        credits = alg._credits(state.params["critic"], sa, jax.random.PRNGKey(2))
        assert credits.shape == (B, T, 2)
        cp = state.params["critic"]
        v_full = alg.critic.apply(cp, sa)
        blocks = sa.reshape(B, T, alg.n_agents, alg.block_dim)
        sa_no0 = blocks.at[:, :, 0].set(0.0).reshape(B, T, -1)
        np.testing.assert_allclose(
            np.asarray(credits[..., 0]),
            np.asarray(v_full - alg.critic.apply(cp, sa_no0)),
            rtol=1e-5, atol=1e-6)

    def test_credits_stop_gradient(self):
        alg = _make()
        state = alg.init_state(jax.random.PRNGKey(0))
        sa = jnp.ones((1, 2, alg.n_agents * alg.block_dim))

        def f(cp):
            return jnp.sum(alg._credits(cp, sa, jax.random.PRNGKey(0)))

        grads = jax.grad(f)(state.params["critic"])
        total = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree_util.tree_leaves(grads))
        assert total == 0.0  # credits are targets, not a gradient path


class TestTraining:
    def test_train_step_runs(self):
        alg = _make()
        state = alg.init_state(jax.random.PRNGKey(0))
        state, m = jax.jit(alg.train_step)(state)
        for k in ("loss", "mixer_loss", "actor_loss"):
            assert np.isfinite(float(m[k])), k

    def test_param_groups_update_independently(self):
        """Critic uses Adam, actor RMSProp; both must actually move."""
        alg = _make(learning_starts=1)
        state = alg.init_state(jax.random.PRNGKey(0))
        a0 = jax.tree_util.tree_leaves(state.params["agent"])[0].copy()
        c0 = jax.tree_util.tree_leaves(state.params["critic"])[0].copy()
        step = jax.jit(alg.train_step)
        state, _ = step(state)
        state, _ = step(state)
        a1 = jax.tree_util.tree_leaves(state.params["agent"])[0]
        c1 = jax.tree_util.tree_leaves(state.params["critic"])[0]
        assert not np.array_equal(np.asarray(a0), np.asarray(a1))
        assert not np.array_equal(np.asarray(c0), np.asarray(c1))

    @pytest.mark.slow
    def test_scc_improves_catch_rate(self):
        env = CatchPigs(max_steps=50, pig_laziness=1.0)
        alg = SCC(env, dict(episodes_per_collect=16, BATCH_SIZE=64,
                            learning_starts=64, EPS_ANNEAL_STEPS=100000,
                            train_per_collect=8, TARGET_UPDATE_FREQ=200))
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step, donate_argnums=0)
        best = 0.0
        for i in range(120):
            state, m = step(state)
            best = max(best, float(m["catch_rate"]))
        assert best >= 0.10, f"SCC failed to improve: best={best}"
