"""On-policy PPO over the host farm (sync-epoch collection).

The reference's flagship deployment — PPO over explorer-driven native
simulators (``examples/breakout_ppo.yaml`` + ``xt/framework/explorer.py:
57-93``, ``async_flag=False`` at ``xt/algorithm/ppo/ppo.py:50``) — mapped
to the farm's sync-epoch mode: freeze behaviour params, collect one
segment per env, run the minibatch SGD epochs, refresh, release.
"""

import numpy as np
import pytest

import jax

from xingtian_tpu.config import parse_config
from xingtian_tpu.envs.async_farm import AsyncTrajectoryFarm
from xingtian_tpu.envs.host import NumpyCartPole
from xingtian_tpu.registry import Registers
from xingtian_tpu.runtime.export import make_behaviour_policy
from xingtian_tpu.runtime.farm_trainer import FarmTrainer


def _ppo_cfg(**alg_overrides):
    alg = dict(rollout_steps=16, BATCH_SIZE=32, NUM_SGD_ITER=2,
               LR=0.001)
    alg.update(alg_overrides)
    raw = {
        "alg_para": {"alg_name": "PPO", "alg_config": alg},
        "model_para": {"actor": {"model_name": "PpoMlp", "action_dim": 2}},
        "env_para": {"env_name": "HostFarm",
                     "env_info": {"name": "NumpyCartPole"}},
        "agent_para": {"agent_name": "PpoFarm",
                       "agent_config": {"complete_step": 100000}},
        "env_num": 4,
        "benchmark": {"id": "test_farm_ppo"},
    }
    return parse_config(raw)[0]


class TestPPOFarm:
    def test_ppo_accepted_by_farm_trainer(self):
        tr = FarmTrainer(_ppo_cfg(), with_workspace=False)
        assert tr._is_onpolicy
        assert tr.farm._sync_epoch
        assert tr.sync_interval == 1
        tr.farm.close()

    def test_ppo_farm_trains_single_version_batches(self):
        tr = FarmTrainer(_ppo_cfg(), with_workspace=False)
        result = tr.train(max_updates=5)
        assert result["update_step"] == 5
        # sync-epoch mode: exactly one segment per env per update, so the
        # farm produced exactly updates x env_num segments — nothing was
        # discarded and nothing ran ahead (zero waste, unlike
        # drain-and-discard approximations of on-policy collection)
        assert result["farm_stats"]["segments_produced"] == 5 * 4
        assert "loss" in result

    def test_ppo_farm_batch_is_on_policy(self):
        """Every drained batch carries ONE policy version, and the version
        advances between updates (behaviour params are the just-updated
        learner params)."""
        tr = FarmTrainer(_ppo_cfg(), with_workspace=False)
        cfg = tr.cfg
        warm = np.zeros((tr.farm._predictor.pad_batch, 4), np.float32)
        tr.farm._policy(warm)
        tr.farm.start()
        tr.farm.release_epoch()
        seen = []
        try:
            for _ in range(3):
                batch = tr.farm.drain_arrays(cfg.total_envs, timeout=60.0)
                versions = np.unique(batch["policy_version"])
                assert versions.size == 1
                seen.append(int(versions[0]))
                traj = tr.alg.batch_to_trajectory(batch)
                tr.state, _ = tr._step(tr.state, traj)
                tr.farm.set_policy(tr._behaviour_policy())
                tr.farm.release_epoch()
        finally:
            tr.farm.close()
        assert seen == sorted(set(seen)), "versions must strictly advance"

    def test_ppo_farm_learns_stub_cartpole(self):
        """Reward improves over sync-epoch PPO updates on the stub
        CartPole (fast CPU smoke for the real-gymnasium convergence run)."""
        tr = FarmTrainer(_ppo_cfg(rollout_steps=64, NUM_SGD_ITER=4),
                         with_workspace=False)
        result = tr.train(max_updates=30)
        assert result["train_reward_avg"] > 25.0, (
            "PPO should lift stub-CartPole reward above the random-policy "
            f"baseline (~20); got {result['train_reward_avg']}")


class TestBehaviourPolicyExtras:
    def test_behaviour_policy_ships_logp_and_value(self):
        model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
        from xingtian_tpu.algos.ppo import PPO
        alg = PPO(model, None, dict(rollout_steps=8))
        state = alg.init_state(jax.random.PRNGKey(0))
        policy = make_behaviour_policy(model, state.params, seed=1)
        a, extras = policy(np.zeros((3, 4), np.float32))
        assert a.shape == (3,)
        assert extras["logp"].shape == (3,)
        assert extras["value"].shape == (3,)
        assert np.all(extras["logp"] <= 0.0)

    def test_gumbel_sampling_matches_softmax(self):
        """Vectorized Gumbel-max must sample the softmax distribution
        (replaces the per-row rng.choice loop — ADVICE r3 weak #6)."""
        model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
        from xingtian_tpu.algos.ppo import PPO
        alg = PPO(model, None, dict(rollout_steps=8))
        state = alg.init_state(jax.random.PRNGKey(0))
        policy = make_behaviour_policy(model, state.params, seed=7)
        obs = np.random.RandomState(0).randn(2000, 4).astype(np.float32)
        a, extras = policy(obs)
        lg = extras["logits"]
        p = np.exp(lg - lg.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        # empirical action-0 rate over the batch ≈ mean softmax prob
        assert abs((a == 0).mean() - p[:, 0].mean()) < 0.05

    def test_logp_consistent_with_logits(self):
        model = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
        from xingtian_tpu.algos.ppo import PPO
        alg = PPO(model, None, dict(rollout_steps=8))
        state = alg.init_state(jax.random.PRNGKey(0))
        policy = make_behaviour_policy(model, state.params, seed=3)
        obs = np.random.RandomState(1).randn(16, 4).astype(np.float32)
        a, extras = policy(obs)
        lg = extras["logits"]
        ref = lg - np.log(np.exp(lg - lg.max(-1, keepdims=True)).sum(
            -1, keepdims=True)) - lg.max(-1, keepdims=True)
        np.testing.assert_allclose(
            extras["logp"], np.take_along_axis(
                ref, a[:, None].astype(int), axis=-1)[:, 0], rtol=1e-4)


class TestSlimFramesKnob:
    def test_slim_frames_not_forwarded_to_env_ctor(self):
        """``env_info.slim_frames`` is a farm-level knob; it must be
        popped before the env factory closes over env_info, or envs
        without **kwargs (NumpyCartPole) TypeError at startup
        (ADVICE r4 medium #1)."""
        cfg = _ppo_cfg()
        cfg.env_info["slim_frames"] = False
        tr = FarmTrainer(cfg, with_workspace=False)   # must not raise
        assert tr.farm._slim is False
        tr.farm.close()


class TestSyncEpochFarm:
    def test_workers_block_until_release(self):
        """Sync-epoch workers must not produce before release_epoch."""
        import time
        farm = AsyncTrajectoryFarm(
            [NumpyCartPole for _ in range(2)], rollout_len=4,
            policy=lambda obs: np.zeros((obs.shape[0],), np.int32),
            batched_inference=False, sync_epoch=True)
        farm.start()
        try:
            time.sleep(0.3)
            assert farm.queue_depth == 0
            farm.release_epoch()
            segs = farm.drain(2, timeout=10.0)
            assert len(segs) == 2
            time.sleep(0.3)
            assert farm.queue_depth == 0   # gated again after one epoch
        finally:
            farm.close()


class TestHostFarmEvaluate:
    def test_evaluate_farm_checkpoints(self, tmp_path):
        """-t evaluate works for HostFarm-trained checkpoints: greedy
        episodes on the host simulator (the reference's Evaluator
        process drives the same env class the explorers used)."""
        from xingtian_tpu.runtime.evaluate import evaluate_from_archive

        cfg = _ppo_cfg()
        cfg.alg_config["save_model"] = True
        cfg.alg_config["save_interval"] = 2
        from xingtian_tpu.runtime.farm_trainer import FarmTrainer
        tr = FarmTrainer(cfg, seed=0, archive_root=str(tmp_path))
        tr.train(max_updates=4)

        cfg.benchmark["eval"] = {"gap": 1, "episodes_per_eval": 2}
        rows = evaluate_from_archive(cfg, archive_root=str(tmp_path))
        assert len(rows) >= 1
        assert all(r["episodes"] == 2 for r in rows)
        assert all(np.isfinite(r["eval_reward"]) for r in rows)
