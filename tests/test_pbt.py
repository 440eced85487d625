"""PBT tests: vmapped population training + exploit/explore mechanics."""

import jax
import jax.numpy as jnp
import numpy as np

from xingtian_tpu.algos.pbt import PopulationPBT
from xingtian_tpu.algos.ppo import PPO
from xingtian_tpu.envs import VecEnv, make
from xingtian_tpu.registry import Registers


def _make_pbt(pop_size=4, n_envs=4):
    env = VecEnv(make("CartPole-v0"), n=n_envs)
    model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
    alg = PPO(model, env, dict(rollout_steps=64, BATCH_SIZE=128, NUM_SGD_ITER=2))
    return PopulationPBT(alg, pop_size=pop_size, pbt_interval=5)


class TestPopulation:
    def test_init_population_shapes(self):
        pbt = _make_pbt(pop_size=4, n_envs=4)
        pop = pbt.init_population(jax.random.PRNGKey(0))
        leaf = jax.tree_util.tree_leaves(pop.params)[0]
        assert leaf.shape[0] == 4
        assert pop.obs.shape == (4, 4, 4)   # [P, B, obs]
        assert pop.hypers["LR"].shape == (4,)
        # per-member hypers differ (sampled from the search space)
        assert len(np.unique(np.asarray(pop.hypers["LR"]))) == 4

    def test_vmapped_train_step(self):
        pbt = _make_pbt()
        pop = pbt.init_population(jax.random.PRNGKey(0))
        step = jax.jit(pbt.train_step)
        pop, metrics = step(pop)
        assert metrics["loss"].shape == (4,)
        assert np.all(np.isfinite(np.asarray(metrics["loss"])))
        assert int(pop.update_step[0]) == 1

    def test_exploit_copies_from_top(self):
        pbt = _make_pbt(pop_size=4)
        pop = pbt.init_population(jax.random.PRNGKey(0))
        # rig the performance: member 3 best, member 0 worst
        pop = pop.replace(ep_stats=pop.ep_stats.replace(
            recent_return=jnp.asarray([1.0, 50.0, 60.0, 100.0])))
        new_pop, info = jax.jit(pbt.pbt_step)(pop, jax.random.PRNGKey(1))
        exploited = np.asarray(info["exploited"])
        assert exploited[0] and not exploited[3]
        donor = int(np.asarray(info["donor_map"])[0])
        assert donor == 3  # with n_exploit=1, only the single top member donates
        p_new = jax.tree_util.tree_leaves(new_pop.params)[0][0]
        p_donor = jax.tree_util.tree_leaves(pop.params)[0][donor]
        np.testing.assert_array_equal(np.asarray(p_new), np.asarray(p_donor))
        # top member untouched
        p3_new = jax.tree_util.tree_leaves(new_pop.params)[0][3]
        p3_old = jax.tree_util.tree_leaves(pop.params)[0][3]
        np.testing.assert_array_equal(np.asarray(p3_new), np.asarray(p3_old))

    def test_explore_perturbs_exploited_hypers(self):
        pbt = _make_pbt(pop_size=4)
        pop = pbt.init_population(jax.random.PRNGKey(0))
        pop = pop.replace(ep_stats=pop.ep_stats.replace(
            recent_return=jnp.asarray([1.0, 50.0, 60.0, 100.0])))
        new_pop, info = jax.jit(pbt.pbt_step)(pop, jax.random.PRNGKey(2))
        donor = int(np.asarray(info["donor_map"])[0])
        lr_new = float(new_pop.hypers["LR"][0])
        lr_donor = float(pop.hypers["LR"][donor])
        assert lr_new != lr_donor  # perturbed or resampled
        # survivors keep their hypers exactly
        for i in [1, 2, 3]:
            assert float(new_pop.hypers["LR"][i]) == float(pop.hypers["LR"][i])

    def test_population_trains_and_improves(self):
        pbt = _make_pbt(pop_size=4, n_envs=8)
        pop = pbt.init_population(jax.random.PRNGKey(3))
        step = jax.jit(pbt.train_step)
        pbt_step = jax.jit(pbt.pbt_step)
        key = jax.random.PRNGKey(4)
        best = 0.0
        for i in range(1, 61):
            pop, metrics = step(pop)
            if i % pbt.pbt_interval == 0:
                key, sub = jax.random.split(key)
                pop, _ = pbt_step(pop, sub)
            best = max(best, float(jnp.max(pop.ep_stats.recent_return)))
        assert best >= 60.0, f"PBT population failed to improve: best={best}"
