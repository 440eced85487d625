"""Environment unit tests: dynamics, auto-reset, vectorization, pixels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xingtian_tpu.envs import VecEnv, make
from xingtian_tpu.envs.arcade import Breakout
from xingtian_tpu.envs.classic import CartPole, Pendulum


class TestCartPole:
    def test_reset_step_shapes(self):
        env = CartPole()
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (4,)
        state, ts = env.step(state, jnp.asarray(1))
        assert ts.obs.shape == (4,)
        assert ts.reward == 1.0
        assert ts.done.dtype == jnp.bool_

    def test_deterministic(self):
        env = CartPole()
        o1 = env.reset(jax.random.PRNGKey(7))[1]
        o2 = env.reset(jax.random.PRNGKey(7))[1]
        np.testing.assert_array_equal(o1, o2)

    def test_episode_terminates(self):
        env = CartPole()
        state, obs = env.reset(jax.random.PRNGKey(0))
        done = False
        for t in range(201):
            state, ts = env.step(state, jnp.asarray(0))  # constant push: falls over
            if bool(ts.done):
                done = True
                break
        assert done and t < 200  # constant action tips the pole well before the limit

    def test_time_limit(self):
        # alternate actions to keep it balanced long enough is hard; just
        # verify the time counter truncates at 200 even if alive
        env = CartPole()
        state, _ = env.reset(jax.random.PRNGKey(0))
        state = state.replace(time=jnp.asarray(199, jnp.int32))
        state, ts = env.step(state, jnp.asarray(0))
        assert bool(ts.done)


class TestPendulum:
    def test_rollout(self):
        env = Pendulum()
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (3,)
        total = 0.0
        for _ in range(200):
            state, ts = env.step(state, jnp.asarray([0.0]))
            total += float(ts.reward)
        assert bool(ts.done)
        assert total < 0.0  # pendulum cost is negative


class TestVecEnv:
    def test_autoreset_and_shapes(self):
        env = VecEnv(CartPole(), n=8)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (8, 4)
        step = jax.jit(env.step)
        for _ in range(250):  # > max episode length: every env must reset
            actions = jnp.zeros((8,), jnp.int32)
            state, ts = step(state, actions)
        # envs keep running past the time limit thanks to auto-reset;
        # cart position and pole angle always within the termination bounds
        assert jnp.all(jnp.abs(ts.obs[:, 0]) <= 2.4 + 0.1)
        assert jnp.all(jnp.abs(ts.obs[:, 2]) <= 0.21 + 0.05)

    def test_distinct_instances(self):
        env = VecEnv(CartPole(), n=4)
        _, obs = env.reset(jax.random.PRNGKey(0))
        # different PRNG streams → different initial states
        assert len(np.unique(np.asarray(obs))) > 4


class TestBreakout:
    def test_shapes(self):
        env = Breakout()
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (10, 10, 4)
        assert float(jnp.sum(obs[..., 3])) == 30.0  # 3 brick rows

    def test_random_play_scores_and_ends(self):
        env = VecEnv(Breakout(), n=16)
        state, obs = env.reset(jax.random.PRNGKey(1))
        step = jax.jit(env.step)
        key = jax.random.PRNGKey(2)
        total_r, total_d = 0.0, 0.0
        for _ in range(300):
            key, k = jax.random.split(key)
            actions = jax.random.randint(k, (16,), 0, 4)
            state, ts = step(state, actions)
            total_r += float(jnp.sum(ts.reward))
            total_d += float(jnp.sum(ts.done))
        assert total_r > 0  # some bricks broken
        assert total_d > 0  # some episodes ended

    def test_ball_stays_in_bounds(self):
        env = Breakout()
        state, _ = env.reset(jax.random.PRNGKey(3))
        for _ in range(200):
            state, ts = env.step(state, jnp.asarray(0))
            assert 0 <= int(state.ball_x) <= 9
            assert 0 <= int(state.ball_y) <= 9
            if bool(ts.done):
                break


class TestPixelObs:
    def test_pixel_shapes_dtype(self):
        env = make("BreakoutPixel")
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (84, 84, 4)
        assert obs.dtype == jnp.uint8
        state, ts = env.step(state, jnp.asarray(2))
        assert ts.obs.shape == (84, 84, 4)
        assert int(jnp.max(ts.obs)) == 255  # paddle plane renders at full white

    def test_frame_stack_rolls(self):
        env = make("BreakoutPixel")
        state, obs0 = env.reset(jax.random.PRNGKey(0))
        state, ts = env.step(state, jnp.asarray(0))
        np.testing.assert_array_equal(
            np.asarray(obs0[..., 1:]), np.asarray(ts.obs[..., :-1]))


class TestFactories:
    def test_yaml_names_resolve(self):
        assert make("CartPole-v0").spec.name == "CartPole-v0"
        assert make("CartPole-v1").spec.max_steps == 500
        from xingtian_tpu.envs import atari_env, gym_env
        assert gym_env(name="CartPole-v0").spec.obs_shape == (4,)
        e = atari_env(name="BreakoutNoFrameskip-v4")
        # AtariEnv contract: 84x84x4 uint8 frames (reference atari_env.py)
        assert e.spec.obs_shape == (84, 84, 4)
