"""StarCraftSkirmish (SMAC-analog) env invariants + QMIX/SCC integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xingtian_tpu.envs import make
from xingtian_tpu.envs.skirmish import (
    ATTACK_DMG, MAX_HP, N_FIXED_ACTIONS, StarCraftSkirmish)


@pytest.fixture(scope="module")
def env():
    return StarCraftSkirmish(map_name="3m")


class TestMechanics:
    def test_map_name_parsing(self):
        e = StarCraftSkirmish(map_name="5m_vs_6m")
        assert e.n_allies == 5 and e.n_enemies == 6
        assert e.spec.action_spec.n == N_FIXED_ACTIONS + 6
        with pytest.raises(ValueError):
            StarCraftSkirmish(map_name="corridor")

    def test_factory_resolves(self):
        e = make("StarCraftSkirmish", map_name="3m")
        assert e.spec.api_type == "unified"
        assert e.spec.n_agents == 3

    def test_reset_shapes(self, env):
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (3, env.spec.obs_shape[0])
        assert env.global_state(state).shape == (env.global_state_dim,)
        avail = env.avail_actions(state)
        assert avail.shape == (3, env.spec.action_spec.n)
        # everyone alive at reset: no-op forbidden, stop allowed
        np.testing.assert_array_equal(avail[:, 0], 0.0)
        np.testing.assert_array_equal(avail[:, 1], 1.0)

    def test_spawn_sides_and_attack_range(self, env):
        state, _ = env.reset(jax.random.PRNGKey(1))
        # allies spawn col 0, enemies col G-1: out of shoot range → no
        # attack available
        avail = env.avail_actions(state)
        np.testing.assert_array_equal(avail[:, N_FIXED_ACTIONS:], 0.0)

    def test_attack_damages_when_in_range(self, env):
        state, _ = env.reset(jax.random.PRNGKey(2))
        # teleport ally 0 next to enemy 0 (test-only state surgery)
        state = state.replace(
            ally_pos=state.ally_pos.at[0].set(state.enemy_pos[0] + 1))
        avail = env.avail_actions(state)
        assert avail[0, N_FIXED_ACTIONS] == 1.0
        actions = jnp.array([N_FIXED_ACTIONS, 1, 1])  # a0 attacks e0
        new_state, ts = env.step(state, actions)
        assert float(new_state.enemy_hp[0]) == MAX_HP - ATTACK_DMG
        assert float(ts.reward) > 0.0          # damage is rewarded

    def test_team_wipe_ends_episode_with_win_bonus(self, env):
        state, _ = env.reset(jax.random.PRNGKey(3))
        state = state.replace(
            enemy_hp=jnp.asarray([ATTACK_DMG, 0.0, 0.0]),
            ally_pos=state.ally_pos.at[0].set(state.enemy_pos[0] + 1))
        new_state, ts = env.step(
            state, jnp.array([N_FIXED_ACTIONS, 1, 1]))
        assert bool(ts.done)
        assert bool(ts.info["battle_won"])
        assert float(ts.reward) > 1.0          # kill + win bonus dominate

    def test_dead_agents_noop_only_and_zero_obs(self, env):
        state, _ = env.reset(jax.random.PRNGKey(4))
        state = state.replace(ally_hp=state.ally_hp.at[0].set(0.0))
        avail = env.avail_actions(state)
        np.testing.assert_array_equal(
            avail[0], jnp.eye(env.spec.action_spec.n)[0])
        obs = env._obs(state)
        np.testing.assert_array_equal(obs[0], 0.0)
        assert float(jnp.abs(obs[1]).sum()) > 0.0

    def test_enemy_ai_advances(self, env):
        state, _ = env.reset(jax.random.PRNGKey(5))
        new_state, _ = env.step(state, jnp.array([1, 1, 1]))  # all stop
        # enemies out of range must move closer to the allies
        d0 = jnp.abs(state.enemy_pos[:, 1] - state.ally_pos[:, 1].mean())
        d1 = jnp.abs(new_state.enemy_pos[:, 1] - state.ally_pos[:, 1].mean())
        assert float(jnp.sum(d1)) < float(jnp.sum(d0))

    def test_episode_limit(self):
        env = StarCraftSkirmish(map_name="2m", episode_limit=3)
        state, _ = env.reset(jax.random.PRNGKey(6))
        done = False
        for _ in range(3):
            state, ts = env.step(state, jnp.array([1, 1]))
            done = bool(ts.done)
        assert done


class TestUnifiedIntegration:
    @pytest.mark.slow
    def test_qmix_trains_on_skirmish(self):
        from xingtian_tpu.algos.qmix import QMIX
        env = StarCraftSkirmish(map_name="2m", episode_limit=20)
        alg = QMIX(env, dict(episodes_per_collect=4, BATCH_SIZE=4,
                             BUFFER_SIZE=64, learning_starts=4,
                             train_per_collect=1))
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step)
        for _ in range(3):
            state, metrics = step(state)
        assert int(state.update_step) == 3
        assert np.isfinite(float(metrics["loss"]))

    def test_collected_actions_respect_avail(self):
        """No agent may ever take an unavailable action (SMAC invariant)."""
        from xingtian_tpu.algos.qmix import QMIX
        env = StarCraftSkirmish(map_name="3m", episode_limit=30)
        alg = QMIX(env, dict(episodes_per_collect=4, EPS_START=1.0))
        state = alg.init_state(jax.random.PRNGKey(1))
        episodes = jax.jit(alg._collect, static_argnums=())(
            state.params, jax.random.PRNGKey(2), jnp.float32(1.0))
        avail = np.asarray(episodes["avail"][:, :-1])     # [E, T, A, nA]
        action = np.asarray(episodes["action"])           # [E, T, A]
        filled = np.asarray(episodes["filled"])[..., None]  # [E, T, 1]
        taken_ok = np.take_along_axis(
            avail, action[..., None], axis=-1)[..., 0]
        assert np.all((taken_ok > 0) | (filled == 0))

    def test_scc_trains_on_skirmish(self):
        from xingtian_tpu.algos.scc import SCC
        env = StarCraftSkirmish(map_name="2m", episode_limit=15)
        alg = SCC(env, dict(episodes_per_collect=4, BATCH_SIZE=4,
                            BUFFER_SIZE=64, learning_starts=4,
                            train_per_collect=1))
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step)
        state, metrics = step(state)
        assert np.isfinite(float(metrics["loss"]))
