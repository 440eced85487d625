"""End-to-end: async host farm feeding the IMPALA learner (V-trace).

The reference's core deployment shape — external sims in explorer
processes, one learner training on behaviour-collected trajectories
(``xt/framework/learner.py:298-380``) — here: AsyncTrajectoryFarm workers
roll out a host CartPole under the actor's behaviour policy; segments are
batched to a Trajectory and consumed by ``IMPALA.train_step_from_batch``.
"""

import numpy as np

import jax
import jax.numpy as jnp

from xingtian_tpu.algos.impala import IMPALA
from xingtian_tpu.envs import VecEnv, make
from xingtian_tpu.envs.async_farm import AsyncTrajectoryFarm
from xingtian_tpu.envs.host import NumpyCartPole
from xingtian_tpu.registry import Registers
from xingtian_tpu.runtime.export import make_behaviour_policy


def _alg():
    env = VecEnv(make("CartPole-v0"), n=4)
    model = Registers.model.build("ImpalaMlp", state_dim=[4], action_dim=2)
    return IMPALA(model, env, dict(rollout_steps=16, sync_model_interval=2)), model


class TestFarmToLearner:
    def test_behaviour_policy_outputs(self):
        alg, model = _alg()
        state = alg.init_state(jax.random.PRNGKey(0))
        policy = make_behaviour_policy(model, state.actor_params)
        a, extras = policy(np.zeros((1, 4), np.float32))
        assert a.shape == (1,) and extras["logits"].shape == (1, 2)

    def test_farm_extras_carry_logits(self):
        alg, model = _alg()
        state = alg.init_state(jax.random.PRNGKey(0))
        farm = AsyncTrajectoryFarm(
            [NumpyCartPole for _ in range(2)], rollout_len=8,
            policy=make_behaviour_policy(model, state.actor_params))
        farm.start()
        try:
            batch = farm.drain_arrays(2, timeout=30.0)
        finally:
            farm.close()
        assert batch["extras"]["logits"].shape == (8, 2, 2)  # [T, B, A]

    def test_learner_trains_on_farm_batch(self):
        alg, model = _alg()
        state = alg.init_state(jax.random.PRNGKey(0))
        farm = AsyncTrajectoryFarm(
            [NumpyCartPole for _ in range(4)], rollout_len=16,
            policy=make_behaviour_policy(model, state.actor_params))
        farm.start()
        try:
            step = jax.jit(alg.train_step_from_batch)
            p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
            for i in range(3):
                traj = IMPALA.batch_to_trajectory(farm.drain_arrays(4, 30.0))
                state, metrics = step(state, traj)
                if i == 0:
                    # same params collected as trained → IS ratio ≈ 1
                    assert abs(float(metrics["mean_rho"]) - 1.0) < 1e-3
                # weight fan-out analog: refresh the farm's policy
                farm.set_policy(
                    make_behaviour_policy(model, state.actor_params))
            assert np.isfinite(float(metrics["loss"]))
            assert int(state.update_step) == 3
            assert int(state.env_steps) == 3 * 16 * 4
            p1 = jax.tree_util.tree_leaves(state.params)[0]
            assert float(jnp.abs(p1 - p0).max()) > 0.0
        finally:
            farm.close()
