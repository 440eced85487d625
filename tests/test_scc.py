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


def _make_3agent(**overrides):
    """External-episode SCC with 3 agents → the MC-Shapley credit path."""
    cfg = dict(MC_SAMPLE_TIMES=2, BATCH_SIZE=4, learning_starts=0,
               train_per_collect=1)
    cfg.update(overrides)
    return SCC.from_env_info(
        dict(n_agents=3, n_actions=4, obs_shape=[6], state_shape=[10],
             episode_limit=8), cfg)


class TestMCShapley:
    """VERDICT r2 weak #4: coalitions must RESAMPLE each update — a fixed
    key evaluates the same coalitions forever (fixed-bias estimator)."""

    def test_credits_differ_across_keys(self):
        alg = _make_3agent()
        state = alg.init_state(jax.random.PRNGKey(0))
        cp = state.params["critic"]
        sa = jax.random.normal(
            jax.random.PRNGKey(1), (2, 4, alg.n_agents * alg.block_dim))
        c_a = alg._credits(cp, sa, jax.random.PRNGKey(10))
        c_b = alg._credits(cp, sa, jax.random.PRNGKey(11))
        assert not np.allclose(np.asarray(c_a), np.asarray(c_b)), (
            "MC-Shapley credits identical under different keys — "
            "coalitions are not resampling")
        # deterministic given the key (reproducibility)
        c_a2 = alg._credits(cp, sa, jax.random.PRNGKey(10))
        np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_a2))

    def test_loss_resamples_on_identical_batches(self):
        """Same batch, different per-update keys → different actor loss."""
        alg = _make_3agent()
        state = alg.init_state(jax.random.PRNGKey(0))
        B, T, A = 4, alg.T, alg.n_agents
        k = jax.random.PRNGKey(3)
        batch = {
            "obs": jax.random.normal(k, (B, T + 1, A, alg.obs_dim)),
            "gstate": jnp.zeros((B, T + 1, alg.state_dim)),
            "avail": jnp.ones((B, T + 1, A, alg.n_actions)),
            "action": jnp.zeros((B, T, A), jnp.int32),
            "reward": jnp.ones((B, T)),
            "terminated": jnp.zeros((B, T)),
            "filled": jnp.ones((B, T)),
        }
        _, aux1 = alg._loss(state.params, state.target_params, batch,
                            jax.random.PRNGKey(21))
        _, aux2 = alg._loss(state.params, state.target_params, batch,
                            jax.random.PRNGKey(22))
        assert float(aux1["actor_loss"]) != float(aux2["actor_loss"])
        # the deterministic critic TD part is key-independent
        np.testing.assert_allclose(
            float(aux1["mixer_loss"]), float(aux2["mixer_loss"]))


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
