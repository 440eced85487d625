"""End-to-end runtime tests: YAML → Trainer → workspace artifacts → eval.

This is the rebuild's version of the reference's CI "guard"
(``scripts/guard_with_train.py``): every example config must train a few
updates, produce a model checkpoint, and be evaluable from the archive.
"""

import csv
import json
import os

import numpy as np
import pytest

from xingtian_tpu.config import load_config, parse_config
from xingtian_tpu.runtime.evaluate import evaluate_from_archive, select_models
from xingtian_tpu.runtime.trainer import Trainer
from xingtian_tpu.runtime.workspace import Workspace

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _shrink_for_guard(cfg) -> None:
    """Rewrite a config to smoke scale (the reference guard's
    save_interval/prepare-times rewrite, ``scripts/guard_with_train.py``):
    2 envs, short rollouts, small nets/buffers/batches, no warmup gates."""
    cfg.env_num = 2
    ac = cfg.agent_config
    ac["max_steps"] = min(int(ac.get("max_steps", 128)), 8)
    ac.pop("vector_env_size", None)
    al = cfg.alg_config
    for k, cap in (("BATCH_SIZE", 16), ("BUFFER_SIZE", 512),
                   ("NUM_SGD_ITER", 2), ("NUM_SIMULATIONS", 4),
                   ("UNROLL_K", 2), ("TD_STEPS", 2),
                   ("train_per_collect", 1), ("episodes_per_eval", 1)):
        if k in al:
            al[k] = min(int(al[k]), cap)
    al["learning_starts"] = 0
    if cfg.alg_name in ("MuZero", "Muzero"):
        # default K=5/n=10 exceed the shrunk 8-step rollout window
        al["UNROLL_K"] = 2
        al["TD_STEPS"] = 2
        al["BUFFER_SIZE"] = 512
        al.setdefault("NUM_SIMULATIONS", 4)
        al["NUM_SIMULATIONS"] = min(int(al["NUM_SIMULATIONS"]), 4)
    mc = cfg.model_info.get("model_config") or {}
    if "hidden_sizes" in mc:
        mc["hidden_sizes"] = [min(int(h), 64) for h in mc["hidden_sizes"]]
    if "hidden_dim" in mc:
        mc["hidden_dim"] = min(int(mc["hidden_dim"]), 32)


class TestConfig:
    def test_load_cartpole_ppo(self):
        cfgs = load_config(os.path.join(EXAMPLES, "cartpole_ppo.yaml"))
        assert len(cfgs) == 1
        cfg = cfgs[0]
        assert cfg.alg_name == "PPO" and cfg.env_num == 10
        assert cfg.rollout_steps == 200
        merged = cfg.merged_alg_config()
        assert merged["BATCH_SIZE"] == 200 and merged["NUM_SGD_ITER"] == 8

    def test_grid_expansion(self):
        raw = {
            "alg_para": {"alg_name": "PPO",
                         "alg_config": {"save_interval": [50, 100]}},
            "model_para": {"actor": {"model_name": "PpoMlp",
                                     "model_config": {"LR": [1e-3, 3e-4, 1e-4],
                                                      "hidden_sizes": [64, 64]}}},
            "env_para": {"env_name": "GymEnv", "env_info": {"name": "CartPole-v0"}},
            "agent_para": {"agent_name": "PPO"},
            "env_num": 2,
        }
        cfgs = parse_config(raw)
        assert len(cfgs) == 6  # 2 save_intervals × 3 LRs
        # structural list NOT expanded
        assert all(c.model_info["model_config"]["hidden_sizes"] == [64, 64]
                   for c in cfgs)

    def test_vector_env_size(self):
        cfgs = load_config(os.path.join(EXAMPLES, "breakout_impala_speedup.yaml"))
        assert cfgs[0].total_envs == 250


class TestTrainerEndToEnd:
    def test_user_modules_import(self, tmp_path):
        """YAML ``user_modules:`` imports user extension code so its
        registrations resolve (reference CWD auto-import,
        ``zeus/common/util/register.py:168-200``)."""
        ext = tmp_path / "my_ext.py"
        ext.write_text(
            "from xingtian_tpu.registry import Registers\n"
            "from xingtian_tpu.envs.classic import CartPole\n"
            "@Registers.env.register(name='MyCartPole')\n"
            "class MyCartPole(CartPole):\n"
            "    pass\n")
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(
            "user_modules: [my_ext.py]\n"
            "alg_para: {alg_name: PPO}\n"
            "env_para: {env_name: MyCartPole}\n"
            "model_para:\n"
            "  actor: {model_name: PpoMlp, state_dim: [4], action_dim: 2}\n")
        cfgs = load_config(str(cfg_path))
        from xingtian_tpu.registry import Registers
        assert "MyCartPole" in Registers.env
        assert cfgs[0].env_name == "MyCartPole"

    def test_custom_agent_from_yaml(self, tmp_path):
        """4th Lego block (VERDICT r1 item 6): a user module registers an
        Agent subclass overriding action selection + trajectory
        post-processing (the ``cartpole_ppo`` custom-GAE style hook,
        ``xt/agent/ppo/cartpole_ppo.py:88-117``), selected via
        ``agent_para.agent_name``."""
        ext = tmp_path / "my_agent.py"
        ext.write_text(
            "import jax.numpy as jnp\n"
            "from xingtian_tpu.agents import Agent\n"
            "from xingtian_tpu.registry import Registers\n"
            "@Registers.agent.register(name='AlwaysLeft')\n"
            "class AlwaysLeft(Agent):\n"
            "    def infer_action(self, params, obs, key):\n"
            "        a, extras = self.alg.policy_fn(params, obs, key)\n"
            "        return jnp.zeros_like(a), extras\n"
            "    def transform_trajectory(self, traj):\n"
            "        return traj.replace(reward=traj.reward * 2.0)\n")
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(
            "user_modules: [my_agent.py]\n"
            "alg_para: {alg_name: PPO, alg_config: {save_model: False}}\n"
            "env_para: {env_name: GymEnv, env_info: {name: CartPole-v0}}\n"
            "agent_para:\n"
            "  agent_name: AlwaysLeft\n"
            "  agent_config: {max_steps: 16}\n"
            "model_para:\n"
            "  actor: {model_name: PpoMlp, state_dim: [4], action_dim: 2}\n"
            "env_num: 4\n")
        cfg = load_config(str(cfg_path))[0]
        trainer = Trainer(cfg, seed=0, with_workspace=False)
        from xingtian_tpu.registry import Registers
        assert type(trainer.alg.agent).__name__ == "AlwaysLeft"

        # the hook really drives the rollout: all actions are 0
        import jax
        state, metrics = jax.jit(trainer.alg.train_step)(trainer.state)
        env_state, last_obs, ep_stats, traj = __import__(
            "xingtian_tpu.agents.rollout", fromlist=["rollout"]).rollout(
            trainer.alg.env, trainer.alg._policy, trainer.state.params,
            trainer.state.env_state, trainer.state.obs,
            trainer.state.ep_stats, jax.random.PRNGKey(0), 8)
        assert np.all(np.asarray(traj.action) == 0)

        # unknown names fall back to the default hooks, not an error
        cfg2 = load_config(str(cfg_path))[0]
        cfg2.agent_name = "SomeUnregisteredName"
        t2 = Trainer(cfg2, seed=0, with_workspace=False)
        from xingtian_tpu.agents import DefaultAgent
        assert type(t2.alg.agent) is DefaultAgent

    # guard cases on CartPole-scale envs stay in the quick gate; pixel-CNN
    # and episodic-MARL cases are minutes-scale on CPU → marked slow (they
    # all still run in the full suite)
    @pytest.mark.parametrize("example", [
        (ex if any(k in ex for k in
                   ("cartpole", "pendulum", "catchpigs", "hostfarm"))
         else pytest.param(ex, marks=pytest.mark.slow))
        for ex in sorted(
            os.path.relpath(os.path.join(root, f), EXAMPLES)
            for root, _, files in os.walk(EXAMPLES)
            for f in files if f.endswith(".yaml"))
    ])
    def test_guard_examples_reach_first_checkpoint(self, example, tmp_path):
        """EVERY example config trains a few updates end-to-end (the
        reference's guard rewrites configs to tiny values the same way,
        ``scripts/guard_with_train.py``) and, on the Trainer path,
        checkpoints."""
        cfg = load_config(os.path.join(EXAMPLES, example))[0]
        _shrink_for_guard(cfg)

        if cfg.use_pbt:
            from xingtian_tpu.runtime.pbt_runner import PBTTrainer
            cfg.pbt_config["pbt_size"] = 2
            cfg.pbt_config["pbt_interval"] = 2
            trainer = PBTTrainer(cfg, seed=0, archive_root=str(tmp_path))
            result = trainer.train(max_updates=2)
            assert result["update_step"] == 2
            return
        if cfg.env_name == "HostFarm":
            if cfg.env_info.get("name") == "ALE":
                pytest.importorskip("ale_py")   # real backend only
            if cfg.alg_name in ("QMIX", "SCC"):
                # real-SMAC episodic path; backend 'real' needs smac+SC2
                if cfg.env_info.get("backend", "real") != "fake":
                    pytest.importorskip("smac")
                from xingtian_tpu.runtime.farm_trainer import (
                    EpisodicFarmTrainer)
                trainer = EpisodicFarmTrainer(
                    cfg, seed=0, archive_root=str(tmp_path))
            else:
                from xingtian_tpu.runtime.farm_trainer import FarmTrainer
                trainer = FarmTrainer(cfg, seed=0, archive_root=str(tmp_path))
            result = trainer.train(max_updates=2)
            assert result["update_step"] == 2
            return

        cfg.alg_config["save_interval"] = 2
        cfg.alg_config["save_model"] = True
        trainer = Trainer(cfg, seed=0, archive_root=str(tmp_path))
        result = trainer.train(max_updates=3)
        assert result["update_step"] == 3
        models = select_models(trainer.workspace.model_dir)
        assert models, "no checkpoint written"
        # workspace artifacts exist
        assert os.path.exists(os.path.join(
            trainer.workspace.bench_dir, "train_config.yaml"))

    def test_hostfarm_smac_qmix_cli_path_on_fake_backend(self, tmp_path):
        """The real-SC2 YAML's exact pipeline (EpisodicFarmTrainer:
        collect_episodes → train_step_from_episodes) runs end-to-end on
        the deterministic FakeSMAC backend, records battle_won_rate, and
        checkpoints — VERDICT r2 #9."""
        cfg = load_config(os.path.join(
            EXAMPLES, "ma_cases", "hostfarm_smac_qmix.yaml"))[0]
        _shrink_for_guard(cfg)
        cfg.env_num = 4
        cfg.env_info["backend"] = "fake"
        cfg.env_info.pop("map_name", None)
        cfg.alg_config["save_interval"] = 2
        cfg.benchmark["log_interval_to_train"] = 1
        from xingtian_tpu.runtime.farm_trainer import EpisodicFarmTrainer
        trainer = EpisodicFarmTrainer(cfg, seed=0, archive_root=str(tmp_path))
        result = trainer.train(max_updates=3)
        assert result["update_step"] == 3
        assert result["env_steps"] > 0
        assert np.isfinite(result["loss"])
        models = select_models(trainer.workspace.model_dir)
        assert models, "no checkpoint written"
        with open(os.path.join(trainer.workspace.bench_dir,
                               "records.csv")) as f:
            rows = list(csv.DictReader(f))
        assert any("battle_won_rate" in r and r["battle_won_rate"] != ""
                   for r in rows)

    def test_async_evaluator(self, tmp_path):
        """Evaluator parallelism (VERDICT r1 §2.5): eval rollouts are
        enqueued on the device stream and fetched at the NEXT gap, so
        training never blocks on evaluation (the reference's Evaluator
        processes, evaluate_adapter.py:50-59)."""
        cfg = load_config(os.path.join(EXAMPLES, "cartpole_ppo.yaml"))[0]
        cfg.benchmark["eval"] = {"gap": 2, "episodes_per_eval": 1}
        cfg.benchmark["log_interval_to_train"] = 1
        trainer = Trainer(cfg, seed=0, archive_root=str(tmp_path))
        trainer.train(max_updates=6)
        with open(os.path.join(trainer.workspace.bench_dir,
                               "records.csv")) as f:
            rows = list(csv.DictReader(f))
        evals = [r for r in rows if r.get("eval_reward")]
        assert len(evals) >= 2                       # gaps 2 and 4 fetched
        assert all(np.isfinite(float(r["eval_reward"])) for r in evals)
        # eval rows are out-of-band: they never carry throughput numbers
        assert all(not r.get("step_per_second") for r in evals)

    def test_concurrent_multi_case(self, tmp_path):
        """Multi-case parallelism (VERDICT r1 §2.5): a grid config with
        --workers runs cases as concurrent subprocesses, each with its
        own workspace (reference runs up to 10, train.py:196-229)."""
        import glob
        import subprocess
        import sys
        cfg_path = tmp_path / "grid.yaml"
        cfg_path.write_text(
            "alg_para:\n"
            "  alg_name: PPO\n"
            "  alg_config: {LR: [0.001, 0.0003], BATCH_SIZE: 64,\n"
            "               NUM_SGD_ITER: 1}\n"
            "env_para: {env_name: GymEnv, env_info: {name: CartPole-v0}}\n"
            "agent_para:\n"
            "  agent_name: PPO\n"
            "  agent_config: {max_steps: 16, complete_step: 100000}\n"
            "model_para:\n"
            "  actor: {model_name: PpoMlp, state_dim: [4], action_dim: 2}\n"
            "env_num: 2\n"
            "benchmark: {id: grid_cc, log_interval_to_train: 1}\n")
        out = subprocess.run(
            [sys.executable, "-m", "xingtian_tpu.main", "-f", str(cfg_path),
             "-t", "train", "--workers", "2", "--max_updates", "2",
             "--archive_root", str(tmp_path)],
            capture_output=True, text=True, timeout=300,
            env=dict(os.environ, XT_PLATFORM="cpu"),
            cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert out.returncode == 0, out.stdout[-500:] + out.stderr[-500:]
        ws = glob.glob(os.path.join(str(tmp_path), "grid_cc+*Ttrain"))
        assert len(ws) == 2     # one workspace per case, no collisions

    def test_records_csv_and_history(self, tmp_path):
        cfg = load_config(os.path.join(EXAMPLES, "cartpole_ppo.yaml"))[0]
        cfg.benchmark["log_interval_to_train"] = 1
        trainer = Trainer(cfg, seed=0, archive_root=str(tmp_path))
        trainer.train(max_updates=3)
        with open(os.path.join(trainer.workspace.bench_dir, "records.csv")) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 3
        assert "step_per_second" in rows[0] and "episode_reward_mean" in rows[0]
        with open(os.path.join(trainer.workspace.dir, "train_records.json")) as f:
            hist = json.load(f)
        assert len(hist["train_count"]) == 3

    def test_evaluate_from_archive(self, tmp_path):
        cfg = load_config(os.path.join(EXAMPLES, "cartpole_ppo.yaml"))[0]
        cfg.alg_config["save_interval"] = 1
        cfg.alg_config["save_model"] = True
        cfg.benchmark["eval"] = {"gap": 1, "episodes_per_eval": 1}
        trainer = Trainer(cfg, seed=0, archive_root=str(tmp_path))
        trainer.train(max_updates=2)
        rows = evaluate_from_archive(cfg, archive_root=str(tmp_path))
        assert len(rows) == 2
        assert all(np.isfinite(r["eval_reward"]) for r in rows)

    def test_trainer_eval_greedy(self, tmp_path):
        cfg = load_config(os.path.join(EXAMPLES, "cartpole_ppo.yaml"))[0]
        trainer = Trainer(cfg, seed=0, with_workspace=False)
        r = trainer.evaluate(episodes=2)
        assert 5.0 <= r <= 200.0  # untrained policy still scores some steps


class TestCLI:
    def test_cli_smoke(self, tmp_path, capsys):
        from xingtian_tpu.main import main
        rc = main(["-f", os.path.join(EXAMPLES, "cartpole_ppo.yaml"),
                   "-t", "train", "--max_updates", "2",
                   "--archive_root", str(tmp_path)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "done" in out

    def test_cli_train_with_evaluate(self, tmp_path, capsys):
        """-t train_with_evaluate runs an eval cadence (TesterManager
        gap semantics) and records eval_reward rows."""
        import yaml
        from xingtian_tpu.main import main
        with open(os.path.join(EXAMPLES, "cartpole_ppo.yaml")) as f:
            raw = yaml.safe_load(f)
        raw["benchmark"]["log_interval_to_train"] = 1
        raw["benchmark"]["eval"] = {"gap": 2, "episodes_per_eval": 1}
        cfg_path = tmp_path / "twe.yaml"
        cfg_path.write_text(yaml.safe_dump(raw))
        archive = tmp_path / "archive"
        rc = main(["-f", str(cfg_path), "-t", "train_with_evaluate",
                   "--max_updates", "2", "--archive_root", str(archive)])
        assert rc == 0
        run = os.listdir(archive)[0]
        with open(os.path.join(archive, run, "benchmark",
                               "records.csv")) as f:
            rows = list(csv.DictReader(f))
        assert any(r.get("eval_reward") not in (None, "")
                   for r in rows)


class TestExport:
    def test_export_serve_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from xingtian_tpu.registry import Registers
        from xingtian_tpu.runtime.export import (
            export_policy, load_policy, make_policy_fn)
        m = Registers.model.build("PpoMlp", state_dim=[4], action_dim=2)
        params = m.init_params(jax.random.PRNGKey(0))
        path = str(tmp_path / "policy.stablehlo")
        export_policy(m, params, path, batch_size=8)
        fn = load_policy(path)
        obs = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
        np.testing.assert_array_equal(
            np.asarray(fn(obs)), np.asarray(make_policy_fn(m)(params, obs)))


class TestWrappers:
    def test_action_repeat(self):
        import jax
        import jax.numpy as jnp
        from xingtian_tpu.envs import make
        from xingtian_tpu.envs.core import ActionRepeat
        env = ActionRepeat(make("CartPole-v0"), repeat=4)
        state, obs = env.reset(jax.random.PRNGKey(0))
        state, ts = env.step(state, jnp.asarray(0))
        assert float(ts.reward) == 4.0  # 4 x +1 while alive
        assert int(state.time) == 4

    def test_reward_clip(self):
        import jax
        import jax.numpy as jnp
        from xingtian_tpu.envs import make
        from xingtian_tpu.envs.core import RewardClip
        env = RewardClip(make("Pendulum-v0"), bound=1.0)
        state, _ = env.reset(jax.random.PRNGKey(0))
        state, ts = env.step(state, jnp.asarray([2.0]))
        assert -1.0 <= float(ts.reward) <= 1.0

    def test_random_starts_desync(self):
        import jax
        from xingtian_tpu.envs import make
        from xingtian_tpu.envs.core import RandomStarts
        env = RandomStarts(make("CartPole-v0"), max_noops=20)
        times = []
        for seed in range(6):
            state, _ = env.reset(jax.random.PRNGKey(seed))
            times.append(int(state.time))
        assert len(set(times)) > 1  # different noop counts


class TestFullStateResume:
    def test_exact_midrun_resume(self, tmp_path):
        """Save full state mid-run, restore into a fresh Trainer, continue:
        the continued run must match an uninterrupted run bit-for-bit."""
        import jax
        import numpy as np
        cfg = load_config(os.path.join(EXAMPLES, "cartpole_ppo.yaml"))[0]

        t1 = Trainer(cfg, seed=7, with_workspace=False)
        t1.train(max_updates=2)
        ckpt = str(tmp_path / "full_state")
        t1.save_full_state(ckpt)
        t1.train(max_updates=4)   # continue to 4 uninterrupted
        ref_leaf = np.asarray(jax.tree_util.tree_leaves(t1.state.params)[0])

        t2 = Trainer(cfg, seed=999, with_workspace=False)  # different seed
        t2.resume_from(ckpt)
        assert int(t2.state.update_step) == 2
        t2.train(max_updates=4)
        new_leaf = np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0])
        np.testing.assert_array_equal(ref_leaf, new_leaf)
