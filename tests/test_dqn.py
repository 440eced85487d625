"""DQN tests: replay mechanics, TD math, target-net sync, CartPole learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xingtian_tpu.algos.dqn import DQN
from xingtian_tpu.envs import VecEnv, make
from xingtian_tpu.ops.replay import (
    PackedReplayState, SumTree, packed_add, packed_init, packed_sample,
    replay_add_batch, replay_init, replay_sample)
from xingtian_tpu.registry import Registers


class TestReplay:
    def test_ring_insert_wrap(self):
        ex = {"x": jnp.zeros((2,)), "a": jnp.zeros((), jnp.int32)}
        st = replay_init(ex, capacity=8)
        batch = {"x": jnp.arange(12.0).reshape(6, 2), "a": jnp.arange(6, dtype=jnp.int32)}
        st = replay_add_batch(st, batch)
        assert int(st.size) == 6 and int(st.insert_pos) == 6
        st = replay_add_batch(st, batch)  # wraps: positions 6,7,0,1,2,3
        assert int(st.size) == 8 and int(st.insert_pos) == 4
        np.testing.assert_array_equal(np.asarray(st.data["a"][6:8]), [0, 1])
        np.testing.assert_array_equal(np.asarray(st.data["a"][0:4]), [2, 3, 4, 5])

    def test_sample_respects_size(self):
        ex = {"a": jnp.zeros((), jnp.int32)}
        st = replay_init(ex, capacity=100)
        st = replay_add_batch(st, {"a": jnp.arange(5, dtype=jnp.int32) + 10})
        s = replay_sample(st, jax.random.PRNGKey(0), 64)
        assert np.all(np.asarray(s["a"]) >= 10)  # never samples empty slots


class TestPackedReplay:
    """Single-copy ring: next_obs reconstructed from the successor slot."""

    @staticmethod
    def _chunk(t0, T, B):
        # obs value encodes (env, global time): 100*env + t
        t = jnp.arange(t0, t0 + T, dtype=jnp.float32)
        obs = 100.0 * jnp.arange(B, dtype=jnp.float32)[None, :] + t[:, None]
        return (obs[..., None],                        # [T, B, 1]
                jnp.zeros((T, B), jnp.int32),
                obs,                                   # reward mirrors obs id
                jnp.zeros((T, B), jnp.float32))

    def test_successor_invariant(self):
        st = packed_init(jnp.zeros((1,)), n_envs=2, capacity_per_env=16)
        st = packed_add(st, *self._chunk(0, 5, 2))
        st = packed_add(st, *self._chunk(5, 5, 2))
        assert int(st.size) == 10 and int(st.insert_pos) == 10
        s = packed_sample(st, jax.random.PRNGKey(0), 256)
        obs = np.asarray(s["obs"])[:, 0]
        nxt = np.asarray(s["next_obs"])[:, 0]
        np.testing.assert_allclose(nxt, obs + 1.0)     # true successors
        # reward gathered from the same slot as obs
        np.testing.assert_allclose(np.asarray(s["reward"]), obs)

    def test_successor_invariant_across_wrap(self):
        st = packed_init(jnp.zeros((1,)), n_envs=2, capacity_per_env=4)
        st = packed_add(st, *self._chunk(0, 3, 2))
        st = packed_add(st, *self._chunk(3, 3, 2))     # wraps: holds t=2..5
        assert int(st.size) == 4 and int(st.insert_pos) == 2
        s = packed_sample(st, jax.random.PRNGKey(1), 256)
        obs = np.asarray(s["obs"])[:, 0] % 100         # global t per sample
        nxt = np.asarray(s["next_obs"])[:, 0] % 100
        np.testing.assert_allclose(nxt, obs + 1.0)
        # newest entry (t=5) excluded: its successor isn't written yet
        assert obs.max() <= 4.0 and obs.min() >= 2.0

    def test_dqn_state_uses_packed_ring(self):
        alg = _make_dqn()
        assert alg.packed
        state = alg.init_state(jax.random.PRNGKey(0))
        assert isinstance(state.replay, PackedReplayState)
        # single copy: obs leaf is [B, C, 4] with B*C == BUFFER_SIZE
        B, C = state.replay.obs.shape[:2]
        assert B == 8 and B * C == 50000 // 8 * 8

    def test_dqn_packed_learns_signal(self):
        """TD loss must be computed from true successors: train a few
        steps and check targets stay finite and the ring fills."""
        alg = _make_dqn(learning_starts=0, rollout_steps=8)
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step)
        for _ in range(3):
            state, m = step(state)
        assert np.isfinite(float(m["loss"]))
        assert float(m["buffer_size"]) == 3 * 8 * 8    # size*B transitions


class TestFrameRing:
    """Single-frame storage: stacks rebuilt at sample time must equal the
    env-produced stacked observations exactly, including across resets."""

    @staticmethod
    def _simulate(T, B, S, dones):
        """Frame-stacked trajectory like PixelObs+AutoReset produce:
        frame f_t = 100*env + t; reset repeats the new frame S times."""
        import numpy as onp
        obs = onp.zeros((T, B, 1, 1, S), onp.float32)
        stack = onp.zeros((B, S), onp.float32)
        for b in range(B):
            stack[b] = 100 * b          # reset: repeat f_0 (t=0)
        for t in range(T):
            for b in range(B):
                obs[t, b, 0, 0] = stack[b]
                f_next = 100 * b + t + 1
                if dones[t, b]:
                    stack[b] = f_next   # auto-reset repeats the new frame
                else:
                    stack[b] = onp.concatenate([stack[b][1:], [f_next]])
        return obs

    def _check(self, T, B, S, C, dones, n_samples=512):
        from xingtian_tpu.ops.replay import (
            frame_ring_add, frame_ring_init, frame_ring_sample)
        obs = self._simulate(T, B, S, dones)
        st = frame_ring_init((1, 1), B, C, dtype=jnp.float32)
        action = jnp.tile(jnp.arange(T, dtype=jnp.int32)[:, None], (1, B))
        reward = jnp.asarray(
            obs[..., 0, 0, -1])                     # mirrors newest frame
        st = frame_ring_add(st, jnp.asarray(obs), action, reward,
                            jnp.asarray(dones, jnp.float32))
        s = frame_ring_sample(st, jax.random.PRNGKey(0), n_samples, S)
        got_obs = np.asarray(s["obs"])[:, 0, 0, :]          # [N, S]
        got_next = np.asarray(s["next_obs"])[:, 0, 0, :]
        b_idx = (got_obs[:, -1] // 100).astype(int)
        t_idx = (got_obs[:, -1] % 100).astype(int)
        for i in range(n_samples):
            b, t = b_idx[i], t_idx[i]
            np.testing.assert_array_equal(
                got_obs[i], obs[t, b, 0, 0],
                err_msg=f"stack mismatch at env {b} t {t}")
            if not dones[t, b] and t + 1 < T:
                np.testing.assert_array_equal(
                    got_next[i], obs[t + 1, b, 0, 0],
                    err_msg=f"next_obs mismatch at env {b} t {t}")
            assert float(s["reward"][i]) == float(obs[t, b, 0, 0, -1])

    def test_stacks_match_env_no_resets(self):
        import numpy as onp
        self._check(T=20, B=2, S=4, C=32, dones=onp.zeros((20, 2), bool))

    def test_stacks_match_env_with_resets(self):
        import numpy as onp
        rng = onp.random.RandomState(0)
        dones = rng.uniform(size=(24, 3)) < 0.2
        self._check(T=24, B=3, S=4, C=32, dones=dones)

    def test_stacks_match_env_after_wrap(self):
        import numpy as onp
        rng = onp.random.RandomState(1)
        dones = rng.uniform(size=(40, 2)) < 0.15
        self._check(T=40, B=2, S=4, C=16, dones=dones)  # ring wraps 2.5×

    def test_pixel_dqn_selects_frame_ring(self):
        from xingtian_tpu.envs import VecEnv, make
        from xingtian_tpu.ops.replay import FrameRingState
        env = VecEnv(make("BreakoutPixel"), n=2)
        model = Registers.model.build(
            "DqnCnn", state_dim=[84, 84, 4], action_dim=4,
            input_dtype="uint8")
        alg = DQN(model, env, dict(
            rollout_steps=4, BUFFER_SIZE=256, BATCH_SIZE=8, UPDATE_FREQ=8,
            learning_starts=0))
        assert alg.frame_stack == 4
        state = alg.init_state(jax.random.PRNGKey(0))
        assert isinstance(state.replay, FrameRingState)
        assert state.replay.frames.shape == (2, 128, 84, 84)  # one frame/slot
        state, m = jax.jit(alg.train_step)(state)
        assert np.isfinite(float(m["loss"]))


class TestSumTree:
    def test_total_and_sample_bias(self):
        tree = SumTree.init(8)
        tree = tree.update(jnp.arange(8), jnp.asarray(
            [0.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(float(tree.total), 10.0)
        idx, pri = tree.sample(jax.random.PRNGKey(0), 32)
        assert np.all(np.asarray(idx) == 3)
        np.testing.assert_allclose(np.asarray(pri), 10.0)

    def test_proportional_sampling(self):
        tree = SumTree.init(4)
        tree = tree.update(jnp.arange(4), jnp.asarray([1.0, 1.0, 1.0, 5.0]))
        idx, _ = tree.sample(jax.random.PRNGKey(1), 4000)
        frac3 = float(np.mean(np.asarray(idx) == 3))
        assert 0.55 < frac3 < 0.70  # expect 5/8 = 0.625

    def test_partial_update(self):
        tree = SumTree.init(8)
        tree = tree.update(jnp.asarray([0, 7]), jnp.asarray([2.0, 3.0]))
        np.testing.assert_allclose(float(tree.total), 5.0)
        tree = tree.update(jnp.asarray([0]), jnp.asarray([1.0]))
        np.testing.assert_allclose(float(tree.total), 4.0)


def _make_dqn(**overrides):
    env = VecEnv(make("CartPole-v0"), n=8)
    model = Registers.model.build(
        "DqnMlp", state_dim=[4], action_dim=2,
        model_config={"hidden_sizes": [128, 128], "activation": "relu"})
    cfg = dict(BUFFER_SIZE=50000, learning_starts=1000, EPS_DECAY_STEPS=20000,
               TARGET_UPDATE_FREQ=250, UPDATE_FREQ=8, BATCH_SIZE=64,
               LRC=5e-4, rollout_steps=16)
    cfg.update(overrides)
    return DQN(model, env, cfg)


class TestDQN:
    def test_learning_starts_gate(self):
        alg = _make_dqn(learning_starts=10**6)
        state = alg.init_state(jax.random.PRNGKey(0))
        p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
        state, m = jax.jit(alg.train_step)(state)
        p1 = jax.tree_util.tree_leaves(state.params)[0]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        assert float(m["loss"]) == 0.0
        assert int(state.train_count) == 0

    def test_epsilon_schedule(self):
        alg = _make_dqn()
        assert float(alg.epsilon(jnp.asarray(0))) == pytest.approx(1.0)
        assert float(alg.epsilon(jnp.asarray(20000))) == pytest.approx(0.01)
        assert float(alg.epsilon(jnp.asarray(10**7))) == pytest.approx(0.01)

    def test_target_sync_cadence(self):
        alg = _make_dqn(TARGET_UPDATE_FREQ=16, learning_starts=0)
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step)
        state, _ = step(state)  # 16*8/8 = 16 updates → exactly one sync
        assert int(state.train_count) == 16
        t = jax.tree_util.tree_leaves(state.target_params)[0]
        p = jax.tree_util.tree_leaves(state.params)[0]
        np.testing.assert_array_equal(np.asarray(t), np.asarray(p))

    def test_double_dqn_runs(self):
        alg = _make_dqn(double_dqn=True, learning_starts=0)
        state = alg.init_state(jax.random.PRNGKey(0))
        state, m = jax.jit(alg.train_step)(state)
        assert np.isfinite(float(m["loss"]))

    @pytest.mark.slow
    def test_learns_cartpole(self):
        """ε-greedy DQN must reach ≥150 reward within 64k env steps."""
        alg = _make_dqn()
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step, donate_argnums=0)
        best = 0.0
        for i in range(500):
            state, m = step(state)
            if i % 10 == 0:
                best = max(best, float(m["episode_reward_recent"]))
        assert best >= 150.0, f"DQN failed to learn CartPole: best={best}"
