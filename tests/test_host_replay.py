"""Host-RAM C++ replay store: ring semantics, pair reconstruction, jit path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xingtian_tpu.ops.host_replay import HostReplay, build_native


@pytest.fixture(scope="module", autouse=True)
def _built():
    build_native()


def _fill(rb, n, start=0):
    obs = (np.arange(start, start + n, dtype=np.int64)[:, None]
           % 256).astype(np.uint8) * np.ones((1, 8), np.uint8)
    rb.add(obs, np.arange(start, start + n) % 4,
           np.arange(start, start + n, dtype=np.float32),
           np.zeros(n, bool))
    return obs


class TestStore:
    def test_size_and_ring_overwrite(self):
        rb = HostReplay(capacity=16, obs_shape=(8,))
        _fill(rb, 10)
        assert rb.size == 10
        _fill(rb, 10, start=10)
        assert rb.size == 16            # capped at capacity
        assert rb.total_added == 20

    def test_next_obs_is_successor(self):
        rb = HostReplay(capacity=64, obs_shape=(8,))
        _fill(rb, 40)
        out = rb.sample(256, seed=7)
        # obs rows are the id broadcast; next id = id + 1 (no dones)
        ids = out["obs"][:, 0].astype(np.int64)
        next_ids = out["next_obs"][:, 0].astype(np.int64)
        np.testing.assert_array_equal((ids + 1) % 256, next_ids)
        np.testing.assert_array_equal(out["action"], ids % 4)
        np.testing.assert_array_equal(out["reward"], ids.astype(np.float32))

    def test_terminal_next_obs_zeroed(self):
        rb = HostReplay(capacity=32, obs_shape=(4,))
        obs = np.full((5, 4), 9, np.uint8)
        rb.add(obs, np.zeros(5), np.zeros(5), np.array([0, 1, 0, 1, 0]))
        out = rb.sample(200, seed=3)
        term = out["done"] > 0.5
        assert term.any() and (~term).any()
        np.testing.assert_array_equal(out["next_obs"][term], 0)
        np.testing.assert_array_equal(out["next_obs"][~term], 9)

    def test_sample_excludes_write_head(self):
        rb = HostReplay(capacity=8, obs_shape=(2,))
        _fill_obs = np.array([[1, 1], [2, 2]], np.uint8)
        rb.add(_fill_obs, np.zeros(2), np.zeros(2), np.zeros(2, bool))
        out = rb.sample(64, seed=0)
        # only slot 0 is sampleable (slot 1's next_obs not written yet)
        np.testing.assert_array_equal(out["obs"][:, 0], 1)

    def test_too_few_transitions_raises(self):
        rb = HostReplay(capacity=8, obs_shape=(2,))
        rb.add(np.zeros((1, 2), np.uint8), [0], [0.0], [False])
        with pytest.raises(RuntimeError):
            rb.sample(4, seed=0)

    def test_seed_determinism(self):
        rb = HostReplay(capacity=64, obs_shape=(8,))
        _fill(rb, 50)
        a = rb.sample(32, seed=42)
        b = rb.sample(32, seed=42)
        c = rb.sample(32, seed=43)
        np.testing.assert_array_equal(a["obs"], b["obs"])
        assert not np.array_equal(a["obs"], c["obs"])


class TestExplicitNextMode:
    def test_interleaved_batches_pair_correctly(self):
        """[T, B]-flattened feeds break the successor trick; explicit mode
        must return the true next_obs regardless of feed order."""
        rb = HostReplay(capacity=64, obs_shape=(4,), explicit_next=True)
        ids = np.arange(20, dtype=np.uint8)
        rng = np.random.RandomState(0)
        order = rng.permutation(20)              # deliberately shuffled feed
        obs = np.repeat(ids[order, None], 4, axis=1)
        next_obs = np.repeat((ids[order] + 100)[:, None], 4, axis=1)
        rb.add(obs, np.zeros(20), np.zeros(20), np.zeros(20, bool),
               next_obs=next_obs)
        out = rb.sample(128, seed=5)
        np.testing.assert_array_equal(
            out["obs"][:, 0] + 100, out["next_obs"][:, 0])

    def test_requires_next_obs(self):
        rb = HostReplay(capacity=8, obs_shape=(2,), explicit_next=True)
        with pytest.raises(ValueError):
            rb.add(np.zeros((2, 2), np.uint8), [0, 0], [0, 0], [0, 0])


class TestJitIntegration:
    def test_add_and_sample_inside_jit(self):
        rb = HostReplay(capacity=128, obs_shape=(4,))

        @jax.jit
        def producer(obs, action, reward, done):
            return rb.add_callback(obs, action, reward, done)

        @jax.jit
        def consumer(seed):
            batch = rb.sample_callback(16, seed)
            # a DQN-style target computed on device from host-RAM samples
            return batch["reward"] + 0.99 * (1.0 - batch["done"]) * 0.0, batch

        obs = jnp.ones((32, 4), jnp.uint8) * 7
        size = producer(obs, jnp.zeros(32, jnp.int32),
                        jnp.ones(32), jnp.zeros(32, bool))
        assert int(size) == 32
        y, batch = consumer(jnp.uint32(5))
        assert y.shape == (16,)
        np.testing.assert_array_equal(np.asarray(batch["obs"]), 7)

    def test_dqn_host_replay_mode(self):
        """DQN with HOST_REPLAY trains through io_callback end to end."""
        from xingtian_tpu.algos.dqn import DQN
        from xingtian_tpu.envs import VecEnv, make
        from xingtian_tpu.registry import Registers

        env = VecEnv(make("BreakoutPixel"), n=2)
        model = Registers.model.build(
            "DqnCnn", state_dim=[84, 84, 4], action_dim=4,
            input_dtype="uint8",
            model_config={"hidden_sizes": [32], "use_bf16": False})
        alg = DQN(model, env, dict(
            BUFFER_SIZE=1024, learning_starts=32, UPDATE_FREQ=16,
            rollout_steps=8, BATCH_SIZE=8, HOST_REPLAY=True))
        state = alg.init_state(jax.random.PRNGKey(0))
        step = jax.jit(alg.train_step)
        for _ in range(3):
            state, m = step(state)
        jax.block_until_ready(m)
        assert alg.host_replay.size == 3 * 8 * 2
        assert np.isfinite(float(m["loss"]))
        # the device ring stayed a 1-slot placeholder
        assert int(jax.tree_util.tree_leaves(
            state.replay.data)[0].shape[0]) == 1

    def test_dqn_host_replay_rejects_float_obs(self):
        from xingtian_tpu.algos.dqn import DQN
        from xingtian_tpu.envs import VecEnv, make
        from xingtian_tpu.registry import Registers
        env = VecEnv(make("CartPole-v0"), n=2)
        model = Registers.model.build("DqnMlp", state_dim=[4], action_dim=2)
        with pytest.raises(ValueError):
            DQN(model, env, dict(HOST_REPLAY=True))

    def test_atari_scale_geometry(self):
        # 84x84x4 uint8 rows — the shape that motivates host RAM
        rb = HostReplay(capacity=256, obs_shape=(84, 84, 4))
        obs = np.random.randint(0, 255, (64, 84, 84, 4), dtype=np.uint8)
        rb.add(obs, np.zeros(64), np.zeros(64), np.zeros(64, bool))
        out = rb.sample(32, seed=1)
        assert out["obs"].shape == (32, 84, 84, 4)
        assert out["next_obs"].shape == (32, 84, 84, 4)
