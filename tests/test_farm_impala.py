"""End-to-end: async host farm feeding the IMPALA learner (V-trace).

The reference's core deployment shape — external sims in explorer
processes, one learner training on behaviour-collected trajectories
(``xt/framework/learner.py:298-380``) — here: AsyncTrajectoryFarm workers
roll out a host CartPole under the actor's behaviour policy; segments are
batched to a Trajectory and consumed by ``IMPALA.train_step_from_batch``.
"""

import numpy as np
import pytest

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


class TestFarmTrainerYaml:
    def test_cli_hostfarm_example(self, tmp_path):
        """The HostFarm YAML trains through the CLI and checkpoints."""
        import os
        from xingtian_tpu.main import main
        examples = os.path.join(os.path.dirname(__file__), "..", "examples")
        rc = main(["-f", os.path.join(examples, "hostfarm_cartpole_impala.yaml"),
                   "-t", "train", "--max_updates", "3",
                   "--archive_root", str(tmp_path)])
        assert rc == 0
        runs = os.listdir(tmp_path)
        assert len(runs) == 1
        assert os.path.exists(os.path.join(
            tmp_path, runs[0], "benchmark", "train_config.yaml"))

    def test_farm_trainer_records_host_stats(self, tmp_path):
        import os
        from xingtian_tpu.config import load_config
        from xingtian_tpu.runtime.farm_trainer import FarmTrainer
        examples = os.path.join(os.path.dirname(__file__), "..", "examples")
        cfg = load_config(
            os.path.join(examples, "hostfarm_cartpole_impala.yaml"))[0]
        cfg.alg_config["save_interval"] = 2
        tr = FarmTrainer(cfg, seed=0, archive_root=str(tmp_path))
        result = tr.train(max_updates=4)
        assert result["update_step"] == 4
        assert result["farm_stats"]["segments_produced"] >= 4 * cfg.env_num
        assert abs(result["mean_rho"] - 1.0) < 0.5   # staleness corrected
        models = os.listdir(tr.workspace.model_dir)
        assert any(m.startswith("actor_") for m in models)

    def test_unknown_host_env_raises(self):
        from xingtian_tpu.config import parse_config
        from xingtian_tpu.runtime.farm_trainer import FarmTrainer
        raw = {
            "alg_para": {"alg_name": "IMPALA"},
            "model_para": {"actor": {"model_name": "ImpalaMlp",
                                     "action_dim": 2}},
            "env_para": {"env_name": "HostFarm", "env_info": {"name": "Nope"}},
            "agent_para": {"agent_name": "x"},
            "env_num": 2,
        }
        cfg = parse_config(raw)[0]
        with pytest.raises(KeyError):
            FarmTrainer(cfg, with_workspace=False)


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
