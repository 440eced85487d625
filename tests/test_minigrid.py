"""MiniGrid-family tests: view geometry, movement rules, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xingtian_tpu.envs import VecEnv, make
from xingtian_tpu.envs.minigrid import MiniGrid


class TestMiniGrid:
    def test_obs_shape_and_planes(self):
        env = MiniGrid(size=9, view=5)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (5, 5, 3)
        assert set(np.unique(np.asarray(obs))) <= {0.0, 1.0}

    def test_walls_block_forward(self):
        env = MiniGrid(size=7)
        state, _ = env.reset(jax.random.PRNGKey(0))
        # place the agent next to the left wall, facing it
        state = state.replace(pos=jnp.asarray([3, 1], jnp.int32),
                              direction=jnp.asarray(3, jnp.int32))
        state, ts = env.step(state, jnp.asarray(2))  # forward into wall
        np.testing.assert_array_equal(np.asarray(state.pos), [3, 1])

    def test_turning(self):
        env = MiniGrid(size=7)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = state.replace(direction=jnp.asarray(0, jnp.int32))
        state, _ = env.step(state, jnp.asarray(1))  # turn right
        assert int(state.direction) == 1
        state, _ = env.step(state, jnp.asarray(0))  # turn left
        assert int(state.direction) == 0

    def test_goal_gives_reward_and_done(self):
        env = MiniGrid(size=7)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = state.replace(pos=jnp.asarray([3, 2], jnp.int32),
                              direction=jnp.asarray(1, jnp.int32),
                              goal=jnp.asarray([3, 3], jnp.int32))
        state, ts = env.step(state, jnp.asarray(2))
        assert bool(ts.done) and float(ts.reward) > 0.9

    def test_four_rooms_layout(self):
        env = MiniGrid(size=9, layout="four_rooms")
        walls = np.asarray(env.walls)
        assert walls[4, :].sum() == 7.0  # mid wall with 2 door gaps
        state, obs = env.reset(jax.random.PRNGKey(1))
        assert obs.shape == (5, 5, 3)

    def test_view_rotation_consistency(self):
        """The egocentric view must rotate with the agent's direction."""
        env = MiniGrid(size=9)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = state.replace(pos=jnp.asarray([4, 4], jnp.int32),
                              goal=jnp.asarray([2, 4], jnp.int32))  # north
        obs_up = env._obs(state.replace(direction=jnp.asarray(0, jnp.int32)))
        obs_right = env._obs(state.replace(direction=jnp.asarray(1, jnp.int32)))
        # facing up: goal straight ahead (above center); facing right: the
        # same goal appears rotated 90°
        np.testing.assert_array_equal(
            np.asarray(obs_up[..., 1]),
            np.asarray(jnp.rot90(obs_right[..., 1], -1)))


class TestLearning:
    @pytest.mark.slow
    def test_ppo_solves_empty_room(self):
        from xingtian_tpu.algos.ppo import PPO
        from xingtian_tpu.registry import Registers
        env = VecEnv(make("MiniGrid", size=7, layout="empty"), n=32)
        model = Registers.model.build(
            "PpoMlp", state_dim=[75], action_dim=3,
            model_config={"hidden_sizes": [128, 128], "activation": "relu"})
        alg = PPO(model, env, dict(rollout_steps=64, BATCH_SIZE=256,
                                   NUM_SGD_ITER=4, ENTROPY_LOSS=0.01,
                                   LR=7e-4, NORMALIZE_ADV=True))
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step, donate_argnums=0)
        best = 0.0
        for i in range(80):
            state, m = step(state)
            best = max(best, float(m["episode_reward_recent"]))
        assert best >= 0.9, f"PPO failed to solve MiniGrid: best={best}"
