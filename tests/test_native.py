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
