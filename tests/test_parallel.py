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


def _make_dqn(n_envs=16):
    from xingtian_tpu.algos.dqn import DQN
    env = VecEnv(make("CartPole-v0"), n=n_envs)
    model = Registers.model.build("DqnMlp", state_dim=[4], action_dim=2)
    return DQN(model, env, dict(
        rollout_steps=8, BUFFER_SIZE=1024, BATCH_SIZE=32, UPDATE_FREQ=16,
        TARGET_UPDATE_FREQ=10, learning_starts=64, EPS_DECAY_STEPS=1000))


def _make_impala(n_envs=16):
    from xingtian_tpu.algos.impala import IMPALA
    env = VecEnv(make("CartPole-v0"), n=n_envs)
    model = Registers.model.build("ImpalaMlp", state_dim=[4], action_dim=2)
    return IMPALA(model, env, dict(rollout_steps=16, REWARD_CLIP=0))


def _make_qmix():
    from xingtian_tpu.algos.qmix import QMIX
    from xingtian_tpu.envs.multi_agent import CatchPigs
    env = CatchPigs(max_steps=16, pig_laziness=1.0)
    return QMIX(env, dict(
        episodes_per_collect=8, BUFFER_SIZE=64, BATCH_SIZE=8,
        train_per_collect=2, learning_starts=8))


class TestDPBeyondPPO:
    """VERDICT r1 item 4: multi-chip correctness for the non-PPO
    algorithms under ``make_dp_step`` — sharded program must match the
    single-device math, with the replay ring sharded over dp (not P×
    replicated)."""

    def test_dqn_dp_matches_single_device(self):
        alg = _make_dqn(n_envs=16)
        state0 = alg.init_state(jax.random.PRNGKey(5))
        s1, m1 = jax.jit(alg.train_step)(state0)

        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state0, donate=False)
        # packed ring genuinely sharded over the 8 devices (env axis)
        obs_buf = placed.replay.obs
        assert len(obs_buf.sharding.device_set) == 8
        assert not obs_buf.sharding.is_fully_replicated
        s8, m8 = step(placed)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-4, atol=2e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l8 = jax.tree_util.tree_leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=2e-4, atol=2e-5)
        # ring bookkeeping identical
        assert int(s1.replay.size) == int(s8.replay.size)
        assert int(s1.replay.insert_pos) == int(s8.replay.insert_pos)

    def test_dqn_dp_trains_multiple_steps(self):
        alg = _make_dqn(n_envs=16)
        state = alg.init_state(jax.random.PRNGKey(6))
        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state, donate=False)
        for _ in range(12):
            placed, metrics = step(placed)
        assert np.isfinite(float(metrics["loss"]))
        assert int(placed.env_steps) == 12 * 8 * 16
        assert float(metrics["buffer_size"]) > 0

    def test_impala_dp_matches_single_device(self):
        alg = _make_impala(n_envs=16)
        state0 = alg.init_state(jax.random.PRNGKey(7))
        s1, m1 = jax.jit(alg.train_step)(state0)

        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state0, donate=False)
        s8, m8 = step(placed)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-4, atol=2e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l8 = jax.tree_util.tree_leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=2e-4, atol=2e-5)
        # lagged actor params replicated and untouched by sharding
        a1 = jax.tree_util.tree_leaves(s1.actor_params)[0]
        a8 = jax.tree_util.tree_leaves(s8.actor_params)[0]
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a8),
                                   rtol=2e-4, atol=2e-5)

    def test_qmix_dp_matches_single_device(self):
        alg = _make_qmix()
        state0 = alg.init_state(jax.random.PRNGKey(8))
        s1, m1 = jax.jit(alg.train_step)(state0)

        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state0, donate=False)
        # episode ring sharded over dp (64 % 8 == 0)
        obs_buf = placed.buffer.data["obs"]
        assert not obs_buf.sharding.is_fully_replicated
        s8, m8 = step(placed)

        np.testing.assert_allclose(
            float(m1["episode_reward_mean"]), float(m8["episode_reward_mean"]),
            rtol=2e-4, atol=2e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l8 = jax.tree_util.tree_leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=2e-4, atol=2e-5)

    def test_muzero_dp_matches_single_device(self):
        """VERDICT r2 #5: MuZero joins the multi-chip matrix — sharded
        rollout+MCTS+prioritized replay must match single-device math."""
        from xingtian_tpu.algos.muzero import MuZero
        from xingtian_tpu.models.muzero import MuZeroModel
        env = VecEnv(make("CartPole-v0"), n=8)
        model = MuZeroModel(action_dim=2, obs_shape=(4,), hidden_dim=32,
                            fc_layers=(32,))
        alg = MuZero(model, env, dict(
            ROLLOUT_T=8, UNROLL_K=2, TD_STEPS=3, NUM_SIMULATIONS=4,
            BUFFER_SIZE=256, BATCH_SIZE=16, learning_starts=0,
            train_per_collect=1))
        state0 = alg.init_state(jax.random.PRNGKey(11))
        s1, m1 = jax.jit(alg.train_step)(state0)

        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state0, donate=False)
        assert len(placed.obs.sharding.device_set) == 8
        s8, m8 = step(placed)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-4, atol=2e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l8 = jax.tree_util.tree_leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=2e-4, atol=2e-5)

    def test_scc_dp_matches_single_device(self):
        """VERDICT r2 #5: SCC joins the multi-chip matrix (episodic state;
        critic + MC-Shapley credits under the sharded episode buffer)."""
        from xingtian_tpu.algos.scc import SCC
        from xingtian_tpu.envs.multi_agent import CatchPigs
        env = CatchPigs(max_steps=8, pig_laziness=1.0)
        alg = SCC(env, dict(episodes_per_collect=8, BUFFER_SIZE=64,
                            BATCH_SIZE=8, train_per_collect=1,
                            learning_starts=0))
        state0 = alg.init_state(jax.random.PRNGKey(12))
        s1, m1 = jax.jit(alg.train_step)(state0)

        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state0, donate=False)
        s8, m8 = step(placed)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-4, atol=2e-5)
        l1 = jax.tree_util.tree_leaves(s1.params["agent"])[0]
        l8 = jax.tree_util.tree_leaves(s8.params["agent"])[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=2e-4, atol=2e-5)


class TestPopulationSharding:
    """VERDICT r2 #5: PBT's promised population-axis sharding
    (``algos/pbt.py:19-21``) — members train on their own device groups,
    exploit/explore gathers cross shards."""

    def _pbt(self, pop_size=8):
        from xingtian_tpu.algos.pbt import PopulationPBT
        alg = _make_alg(n_envs=4)
        return PopulationPBT(alg, pop_size=pop_size, pbt_interval=2)

    def test_population_shards_and_matches_single_device(self):
        from xingtian_tpu.parallel.dp import make_population_step
        pbt = self._pbt(pop_size=8)
        pop0 = pbt.init_population(jax.random.PRNGKey(21))

        s1, m1 = jax.jit(pbt.train_step)(pop0)

        mesh = make_mesh()
        placed, step, _ = make_population_step(pbt, mesh, pop0, donate=False)
        leaf = jax.tree_util.tree_leaves(placed.params)[0]
        assert len(leaf.sharding.device_set) == 8
        assert not leaf.sharding.is_fully_replicated
        s8, m8 = step(placed)

        np.testing.assert_allclose(
            np.asarray(m1["loss"]), np.asarray(m8["loss"]),
            rtol=2e-4, atol=2e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l8 = jax.tree_util.tree_leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=2e-4, atol=2e-5)

    def test_pbt_step_gathers_across_shards(self):
        """Exploit must move (params, hypers) between members living on
        DIFFERENT devices — the cross-shard gather is the point."""
        from xingtian_tpu.parallel.dp import make_population_step
        pbt = self._pbt(pop_size=8)
        pop0 = pbt.init_population(jax.random.PRNGKey(22))
        mesh = make_mesh()
        placed, step, pbt_step = make_population_step(
            pbt, mesh, pop0, donate=False)
        placed, _ = step(placed)
        new_pop, aux = pbt_step(placed, jax.random.PRNGKey(23))
        exploited = np.asarray(aux["exploited"])
        donor_map = np.asarray(aux["donor_map"])
        assert exploited.sum() >= 1
        # every exploited member now holds its donor's params exactly
        p_new = np.asarray(jax.tree_util.tree_leaves(new_pop.params)[0])
        p_old = np.asarray(jax.tree_util.tree_leaves(placed.params)[0])
        for i in np.where(exploited)[0]:
            np.testing.assert_array_equal(p_new[i], p_old[donor_map[i]])

    def test_indivisible_population_rejected(self):
        from xingtian_tpu.parallel.dp import make_population_step
        pbt = self._pbt(pop_size=6)
        pop0 = pbt.init_population(jax.random.PRNGKey(24))
        with pytest.raises(ValueError, match="divisible"):
            make_population_step(pbt, make_mesh(), pop0)


class TestRingFallback:
    def test_indivisible_capacity_falls_back_to_replicated(self):
        # explicit-next ring (farm-style): capacity not divisible by dp
        # replicates instead of sharding
        from xingtian_tpu.algos.dqn import DQN
        env = VecEnv(make("CartPole-v0"), n=16)
        model = Registers.model.build("DqnMlp", state_dim=[4], action_dim=2)
        alg = DQN(model, env, dict(
            rollout_steps=8, BUFFER_SIZE=1023, BATCH_SIZE=32, UPDATE_FREQ=16,
            TARGET_UPDATE_FREQ=10, learning_starts=64, EPS_DECAY_STEPS=1000,
            PACKED_REPLAY=False))
        state = alg.init_state(jax.random.PRNGKey(9))
        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state, donate=False)
        assert placed.replay.data["obs"].sharding.is_fully_replicated
        _, metrics = step(placed)
        assert np.isfinite(float(metrics["loss"]))


class TestShardLocalMinibatch:
    """PPO's dp-friendly SGD path (SHARD_LOCAL_MINIBATCH): random TIME
    slices x all envs — the env axis stays sharded, so no per-minibatch
    all-gather of the rollout (the global-permutation gather's cost,
    measured 2x per-process at 2 jax.distributed processes)."""

    def test_dp_step_runs_and_keeps_sharding(self):
        import numpy as np
        from xingtian_tpu.parallel import make_dp_step, make_mesh
        env = VecEnv(make("CartPole-v0"), n=16)
        model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
        alg = PPO(model, env,
                  dict(rollout_steps=32, BATCH_SIZE=64, NUM_SGD_ITER=2,
                       SHARD_LOCAL_MINIBATCH=True))
        state0 = alg.init_state(jax.random.PRNGKey(3))
        mesh = make_mesh()
        placed, step = make_dp_step(alg, mesh, state0, donate=False)
        s8, m8 = step(placed)
        assert np.isfinite(float(m8["loss"]))
        assert len(s8.obs.sharding.device_set) == 8
        for leaf in jax.tree_util.tree_leaves(s8.params):
            assert leaf.sharding.is_fully_replicated

    def test_learns_cartpole_single_device(self):
        import numpy as np
        env = VecEnv(make("CartPole-v0"), n=10)
        model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
        alg = PPO(model, env,
                  dict(rollout_steps=128, BATCH_SIZE=320, NUM_SGD_ITER=4,
                       ENTROPY_LOSS=0.01, SHARD_LOCAL_MINIBATCH=True))
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step, donate_argnums=0)
        best = 0.0
        for _ in range(40):
            state, m = step(state)
            best = max(best, float(m["episode_reward_mean"]))
        assert best > 80.0, f"shard-local minibatching failed to learn: {best}"
