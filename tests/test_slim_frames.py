"""Slim pixel transport: newest-frame wire format + device restack.

Frame-stacked observations are 4× redundant on the wire (consecutive
stacks share 3 frames); on a bandwidth-limited host→device link the
learner upload is the farm's throughput ceiling, so the farm ships one
frame per step and ``Algorithm.restack_pixels`` reconstructs stacks
inside the jitted learner step.  These tests prove the reconstruction is
EXACT against the host preprocessor's own stacks, including episode
boundaries (stack-clear semantics, ``envs/ale.py`` AtariPreprocessor).
"""

import numpy as np

import jax

from xingtian_tpu.algos.base import Algorithm
from xingtian_tpu.envs.ale import FakeALE
from xingtian_tpu.envs.async_farm import AsyncTrajectoryFarm, Segment, \
    stack_segments


def _collect(T=40, seed=3):
    """Roll a FakeALE and build BOTH representations of the same episode
    chunk: full stacks (reference) and slim frames (wire format)."""
    env = FakeALE(seed=seed)
    obs = env.reset(seed)
    full_obs = np.empty((T, *obs.shape), np.uint8)
    rew = np.empty((T,), np.float32)
    done = np.empty((T,), bool)
    act = np.zeros((T,), np.int32)
    rng = np.random.RandomState(seed)
    for t in range(T):
        full_obs[t] = obs
        a = rng.randint(0, env.ACTION_DIM)
        act[t] = a
        obs, rew[t], done[t] = env.step(a)
    seg_full = Segment(obs=full_obs, action=act, reward=rew, done=done,
                       last_obs=obs.copy(), policy_version=0, worker_id=0)
    seg_slim = Segment(
        obs=np.ascontiguousarray(full_obs[..., -1:]), action=act,
        reward=rew, done=done,
        last_obs=np.ascontiguousarray(obs[..., -1:]),
        policy_version=0, worker_id=0,
        frame_prefix=np.ascontiguousarray(full_obs[0, ..., :-1]))
    return seg_full, seg_slim


class TestRestackExactness:
    def test_restack_matches_host_stacks(self):
        seg_full, seg_slim = _collect(T=40)
        assert seg_full.done.any(), "need an episode boundary in the chunk"
        traj = Algorithm.batch_to_trajectory(stack_segments([seg_slim]))
        out = Algorithm.restack_pixels(traj)
        np.testing.assert_array_equal(
            np.asarray(out.obs[:, 0]), seg_full.obs)
        np.testing.assert_array_equal(
            np.asarray(out.last_obs[0]), seg_full.last_obs)
        assert "frame_prefix" not in out.extras

    def test_restack_multi_env_batch(self):
        pairs = [_collect(T=24, seed=s) for s in (1, 2, 5)]
        traj = Algorithm.batch_to_trajectory(
            stack_segments([slim for _, slim in pairs]))
        out = Algorithm.restack_pixels(traj)
        for b, (full, _) in enumerate(pairs):
            np.testing.assert_array_equal(np.asarray(out.obs[:, b]), full.obs)
            np.testing.assert_array_equal(
                np.asarray(out.last_obs[b]), full.last_obs)

    def test_noop_without_prefix(self):
        seg_full, _ = _collect(T=8)
        traj = Algorithm.batch_to_trajectory(stack_segments([seg_full]))
        out = Algorithm.restack_pixels(traj)
        assert out is traj

    def test_restack_jit_compatible(self):
        """Reconstruction must trace under jit (it runs inside the
        learner's compiled step)."""
        _, seg_slim = _collect(T=16)
        traj = Algorithm.batch_to_trajectory(stack_segments([seg_slim]))
        out = jax.jit(Algorithm.restack_pixels)(traj)
        assert out.obs.shape[-1] == 4


class TestFarmSlimTransport:
    def test_farm_emits_slim_segments(self):
        farm = AsyncTrajectoryFarm(
            [FakeALE for _ in range(2)], rollout_len=8,
            policy=lambda o: np.zeros((o.shape[0],), np.int32),
            batched_inference=False, slim_pixel_frames=True)
        farm.start()
        try:
            segs = farm.drain(2, timeout=30.0)
            for s in segs:
                assert s.obs.shape == (8, 84, 84, 1)
                assert s.frame_prefix.shape == (84, 84, 3)
                assert s.last_obs.shape == (84, 84, 1)
            batch = stack_segments(segs)
            assert batch["frame_prefix"].shape == (2, 84, 84, 3)
        finally:
            farm.close()

    def test_impala_trains_on_slim_batch(self):
        from xingtian_tpu.algos.impala import IMPALA
        from xingtian_tpu.registry import Registers
        from xingtian_tpu.runtime.export import make_behaviour_policy

        model = Registers.model.build(
            "ImpalaCnnOpt", state_dim=[84, 84, 4], action_dim=6,
            input_dtype="uint8", model_config={"hidden_sizes": [32]})
        alg = IMPALA(model, None, dict(rollout_steps=8,
                                       sync_model_interval=1))
        state = alg.init_state(jax.random.PRNGKey(0))
        farm = AsyncTrajectoryFarm(
            [FakeALE for _ in range(2)], rollout_len=8,
            policy=make_behaviour_policy(model, state.actor_params),
            batched_inference=False, slim_pixel_frames=True)
        farm.start()
        try:
            batch = farm.drain_arrays(2, timeout=60.0)
            state, metrics = jax.jit(alg.train_step_from_batch)(
                state, alg.batch_to_trajectory(batch))
            assert np.isfinite(float(metrics["loss"]))
        finally:
            farm.close()

    def test_farm_trainer_auto_enables_slim_for_ale(self):
        from xingtian_tpu.config import parse_config
        from xingtian_tpu.runtime.farm_trainer import FarmTrainer
        raw = {
            "alg_para": {"alg_name": "IMPALA",
                         "alg_config": {"rollout_steps": 8}},
            "model_para": {"actor": {
                "model_name": "ImpalaCnnOpt", "action_dim": 6,
                "input_dtype": "uint8",
                "model_config": {"hidden_sizes": [32]}}},
            "env_para": {"env_name": "HostFarm",
                         "env_info": {"name": "FakeALE"}},
            "agent_para": {"agent_name": "x",
                           "agent_config": {"complete_step": 1000}},
            "env_num": 2,
            "benchmark": {"id": "t"},
        }
        tr = FarmTrainer(parse_config(raw)[0], with_workspace=False)
        assert tr.farm._slim
        tr.farm.close()
