"""Arcade-family game mechanics tests (Pong / SpaceInvaders / Freeway)."""

import jax
import jax.numpy as jnp
import numpy as np

from xingtian_tpu.envs import VecEnv, make
from xingtian_tpu.envs.arcade import Freeway, Pong, SpaceInvaders


def _random_play(env, steps=400, n=16, seed=0):
    venv = VecEnv(env, n=n)
    state, obs = venv.reset(jax.random.PRNGKey(seed))
    step = jax.jit(venv.step)
    key = jax.random.PRNGKey(seed + 1)
    n_actions = env.spec.action_spec.n
    total_r, total_d, neg_r = 0.0, 0.0, 0.0
    for _ in range(steps):
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (n,), 0, n_actions)
        state, ts = step(state, actions)
        total_r += float(jnp.sum(jnp.maximum(ts.reward, 0)))
        neg_r += float(jnp.sum(jnp.minimum(ts.reward, 0)))
        total_d += float(jnp.sum(ts.done))
    return total_r, neg_r, total_d, ts


class TestPong:
    def test_shapes_and_actions(self):
        env = Pong()
        assert env.spec.action_spec.n == 6
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (10, 10, 3)

    def test_opponent_scores_on_noop(self):
        """Idle player must eventually concede points (negative reward)."""
        env = Pong()
        state, _ = env.reset(jax.random.PRNGKey(0))
        neg = 0.0
        for _ in range(400):
            state, ts = env.step(state, jnp.asarray(0))
            neg += float(jnp.minimum(ts.reward, 0.0))
            if bool(ts.done):
                break
        assert neg <= -1.0

    def test_random_play_both_sides_score(self):
        pos, neg, dones, _ = _random_play(Pong(), steps=600)
        assert neg < 0  # enemy scores
        # random play rarely scores but the game must stay in bounds/finite

    def test_ball_in_bounds(self):
        env = Pong()
        state, _ = env.reset(jax.random.PRNGKey(1))
        for _ in range(300):
            state, ts = env.step(state, jnp.asarray(2))
            assert -0.01 <= float(state.ball_y) <= 9.01
            assert -0.01 <= float(state.ball_x) <= 9.01


class TestSpaceInvaders:
    def test_shapes(self):
        env = SpaceInvaders()
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (10, 10, 4)
        assert float(jnp.sum(obs[..., 1])) == 24.0  # 4x6 alien block

    def test_shooting_scores(self):
        """Constant FIRE from the start must hit at least one alien."""
        env = SpaceInvaders()
        state, _ = env.reset(jax.random.PRNGKey(0))
        total = 0.0
        for _ in range(100):
            state, ts = env.step(state, jnp.asarray(1))
            total += float(ts.reward)
            if bool(ts.done):
                break
        assert total >= 1.0

    def test_aliens_eventually_kill_idle_player(self):
        env = SpaceInvaders(max_steps=10_000)
        state, _ = env.reset(jax.random.PRNGKey(0))
        died = False
        for _ in range(2000):
            state, ts = env.step(state, jnp.asarray(0))
            if bool(ts.info["real_done"]):
                died = True
                break
        assert died, "idle cannon should be shot or overrun"


class TestFreeway:
    def test_reach_top_scores(self):
        """Persistent UP must eventually score (cars send you back, retry)."""
        env = Freeway()
        state, _ = env.reset(jax.random.PRNGKey(0))
        total = 0.0
        for _ in range(500):
            state, ts = env.step(state, jnp.asarray(1))
            total += float(ts.reward)
        assert total >= 1.0

    def test_idle_never_scores(self):
        env = Freeway()
        state, _ = env.reset(jax.random.PRNGKey(0))
        total = 0.0
        for _ in range(200):
            state, ts = env.step(state, jnp.asarray(0))
            total += float(ts.reward)
        assert total == 0.0


class TestPixelVariants:
    def test_all_pixel_games(self):
        for name in ["PongPixel", "SpaceInvadersPixel", "FreewayPixel"]:
            env = make(name)
            state, obs = env.reset(jax.random.PRNGKey(0))
            assert obs.shape == (84, 84, 4) and obs.dtype == jnp.uint8
            state, ts = env.step(state, jnp.asarray(0))
            assert ts.obs.shape == (84, 84, 4)

    def test_atari_name_resolution(self):
        from xingtian_tpu.envs import atari_env
        e = atari_env(name="PongNoFrameskip-v4")
        assert e.spec.name == "Pong-pixel"
        assert e.spec.obs_shape == (84, 84, 4)
