"""QMIX tests: unified env, episodic collection, masked TD math, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xingtian_tpu.algos.qmix import QMIX
from xingtian_tpu.envs.multi_agent import CatchPigs
from xingtian_tpu.models.qmix import QMixer


def _make(**overrides):
    env = CatchPigs(max_steps=20, pig_laziness=1.0)
    cfg = dict(episodes_per_collect=8, BATCH_SIZE=16, learning_starts=16,
               EPS_ANNEAL_STEPS=50000, train_per_collect=2,
               TARGET_UPDATE_FREQ=100)
    cfg.update(overrides)
    return QMIX(env, cfg)


class TestUnifiedEnv:
    def test_catchpigs_api(self):
        env = CatchPigs()
        assert env.spec.api_type == "unified" and env.spec.n_agents == 2
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (2, 147)
        state, ts = env.step(state, jnp.asarray([1, 2]))
        assert ts.obs.shape == (2, 147)
        assert ts.info["global_state"].shape == (6,)
        assert ts.reward.shape == ()

    def test_catch_ends_episode(self):
        env = CatchPigs(pig_laziness=1.0, shaped=False)
        state, _ = env.reset(jax.random.PRNGKey(0))
        # place pig at center, agents adjacent-after-move
        state = state.replace(
            pig=jnp.asarray([3, 3], jnp.int32),
            agents=jnp.asarray([[3, 1], [3, 5]], jnp.int32))
        # one step toward the pig each → both adjacent simultaneously
        state, ts = env.step(state, jnp.asarray([4, 3]))  # right, left
        assert bool(ts.info["caught"]) and bool(ts.done)
        assert float(ts.reward) >= 1.0


class TestCollection:
    def test_episode_batch_shapes(self):
        alg = _make()
        state = alg.init_state(jax.random.PRNGKey(0))
        eps = alg.epsilon(state.env_steps)
        episodes = alg._collect(state.params, jax.random.PRNGKey(1), eps)
        E, T = alg.E, alg.T
        assert episodes["obs"].shape == (E, T + 1, 2, 147)
        assert episodes["gstate"].shape == (E, T + 1, 6)
        assert episodes["action"].shape == (E, T, 2)
        assert episodes["filled"].shape == (E, T)
        f = np.asarray(episodes["filled"])
        # filled is a prefix mask: never rises after falling
        assert np.all(np.diff(f, axis=1) <= 0)
        # reward is zero on non-filled steps
        r = np.asarray(episodes["reward"])
        assert np.all(r[f == 0] == 0)


class TestLossMath:
    def test_mixer_monotone_in_agent_qs(self):
        mixer = QMixer(n_agents=2)
        params = mixer.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 2)), jnp.zeros((1, 6)))
        st = jax.random.normal(jax.random.PRNGKey(1), (5, 6))
        q1 = jnp.zeros((5, 2))
        q2 = q1.at[:, 0].add(1.0)   # raise one agent's Q
        out1 = mixer.apply(params, q1, st)
        out2 = mixer.apply(params, q2, st)
        assert np.all(np.asarray(out2) >= np.asarray(out1) - 1e-6)

    def test_masked_td_zero_when_perfect(self):
        """If Q_tot exactly equals the target, loss must be 0 — verified by
        constructing a fake batch where reward=0, terminated=1 everywhere
        filled, so y=0; and a mixer forced to output 0 via zero params."""
        alg = _make()
        state = alg.init_state(jax.random.PRNGKey(0))
        B, T = 2, alg.T
        batch = {
            "obs": jnp.zeros((B, T + 1, 2, 147)),
            "gstate": jnp.zeros((B, T + 1, 6)),
            "avail": jnp.ones((B, T + 1, 2, alg.n_actions)),
            "action": jnp.zeros((B, T, 2), jnp.int32),
            "reward": jnp.zeros((B, T)),
            "terminated": jnp.ones((B, T)),
            "filled": jnp.ones((B, T)),
        }
        zero_params = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        loss, aux = alg._loss(zero_params, zero_params, batch)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-10)

    def test_target_sync(self):
        alg = _make(TARGET_UPDATE_FREQ=2, train_per_collect=2, learning_starts=1)
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step)
        state, _ = step(state)   # buffer fills; 2 grad steps → one sync
        assert int(state.train_count) == 2
        t = jax.tree_util.tree_leaves(state.target_params)[0]
        p = jax.tree_util.tree_leaves(state.params)[0]
        np.testing.assert_array_equal(np.asarray(t), np.asarray(p))


class TestLearning:
    @pytest.mark.slow
    def test_qmix_improves_catch_rate(self):
        """Static-pig CatchPigs: catch rate must clearly beat the ~6%
        random-play baseline within a CI budget (deterministic seed)."""
        env = CatchPigs(max_steps=50, pig_laziness=1.0)
        alg = QMIX(env, dict(episodes_per_collect=16, BATCH_SIZE=64,
                             learning_starts=64, EPS_ANNEAL_STEPS=100000,
                             train_per_collect=8, TARGET_UPDATE_FREQ=200,
                             LR=5e-4))
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step, donate_argnums=0)
        best = 0.0
        for i in range(120):
            state, m = step(state)
            best = max(best, float(m["catch_rate"]))
        assert best >= 0.12, f"QMIX failed to improve: best={best}"
