"""Data-parallel sharding tests on the 8-virtual-device CPU mesh.

This is the rebuild's analog of the reference's localhost-patched
"distributed" runs (``get_xt_config.py:149-176``) — except it actually
validates the collective program: sharded rollouts + replicated params
must produce the same math as single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xingtian_tpu.algos.ppo import PPO
from xingtian_tpu.envs import VecEnv, make
from xingtian_tpu.parallel import make_dp_step, make_mesh
from xingtian_tpu.registry import Registers


def _make_alg(n_envs=16):
    env = VecEnv(make("CartPole-v0"), n=n_envs)
    model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
    return PPO(model, env, dict(rollout_steps=32, BATCH_SIZE=64, NUM_SGD_ITER=2))


class TestMesh:
    def test_mesh_shape(self):
        mesh = make_mesh()
        assert mesh.shape["dp"] == len(jax.devices())
        assert mesh.shape["mp"] == 1

    def test_mesh_subset(self):
        mesh = make_mesh(n_devices=4)
        assert mesh.shape["dp"] == 4


class TestDPStep:
    def test_dp_step_runs_sharded(self):
        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        alg = _make_alg(n_envs=16)
        state = alg.init_state(jax.random.PRNGKey(0))
        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state, donate=False)
        # per-env data really is sharded over 8 devices
        assert len(placed.obs.sharding.device_set) == 8
        new_state, metrics = step(placed)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.env_steps) == 32 * 16
        # params stay replicated
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_matches_single_device(self):
        """The sharded program must compute the same result as 1 device."""
        alg = _make_alg(n_envs=16)
        state0 = alg.init_state(jax.random.PRNGKey(3))

        single = jax.jit(alg.train_step)
        s1, m1 = single(state0)

        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state0, donate=False)
        s8, m8 = step(placed)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-4, atol=2e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l8 = jax.tree_util.tree_leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=2e-4, atol=2e-5)

    def test_indivisible_envs_rejected(self):
        alg = _make_alg(n_envs=10)
        state = alg.init_state(jax.random.PRNGKey(0))
        mesh = make_mesh()
        with pytest.raises(ValueError, match="divisible"):
            make_dp_step(alg, mesh, state)
