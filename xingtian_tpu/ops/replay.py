"""On-device replay buffers.

The reference's DQN replay is a Python deque of pickled transitions living
in the learner process (``xt/algorithm/dqn/replay_buffer.py:24-42``),
sampled with ``random.sample``.  On TPU the buffer is a fixed-capacity
ring of device arrays in HBM: insertion is a dynamic-slice write, sampling
is a PRNG gather — both fuse into the jitted train step, so off-policy
training never touches the host.

Observations can stay uint8 (Atari) — the reference does the same to fit
host RAM (``xt/agent/dqn/atari_dqn.py:39-44``); here it fits HBM.

Also provides the prioritized (sum-tree) variant used by MuZero
(reference ``segment_tree.py`` / ``prioritized_replay_buffer_muzero.py``)
as a dense heap array — O(log n) update/sample with static shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class ReplayState:
    """Uniform ring buffer over an arbitrary transition pytree."""

    data: Any            # pytree with leading axis = capacity
    insert_pos: Array    # [] int32 next write position
    size: Array          # [] int32 number of valid entries

    @property
    def capacity(self) -> int:
        return jax.tree_util.tree_leaves(self.data)[0].shape[0]


def replay_init(example: Any, capacity: int) -> ReplayState:
    """Allocate a buffer holding ``capacity`` transitions shaped like
    ``example`` (a single transition pytree, no batch axis)."""
    data = jax.tree_util.tree_map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        example,
    )
    return ReplayState(
        data=data,
        insert_pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def replay_add_batch(state: ReplayState, batch: Any) -> ReplayState:
    """Insert ``n`` transitions (pytree with leading batch axis), wrapping.

    Writes use modular scatter indices, so a batch larger than the space
    to the end of the ring wraps correctly in one operation.
    """
    n = jax.tree_util.tree_leaves(batch)[0].shape[0]
    cap = state.capacity
    idx = (state.insert_pos + jnp.arange(n, dtype=jnp.int32)) % cap

    def write(buf, vals):
        return buf.at[idx].set(vals)

    data = jax.tree_util.tree_map(write, state.data, batch)
    return ReplayState(
        data=data,
        insert_pos=(state.insert_pos + n) % cap,
        size=jnp.minimum(state.size + n, cap),
    )


def replay_sample(state: ReplayState, key: Array, batch_size: int) -> Any:
    """Uniform sample with replacement over the valid region.

    (The reference's ``random.sample`` is without replacement; with
    buffers ≫ batch the difference is negligible and with-replacement
    keeps the gather shape static.)
    """
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
    return jax.tree_util.tree_map(lambda buf: buf[idx], state.data)


# ---------------------------------------------------------------------------
# Packed (single-copy) per-env ring — pixel-scale DQN replay
# ---------------------------------------------------------------------------

@struct.dataclass
class PackedReplayState:
    """Single-copy transition ring: ``next_obs`` is never stored.

    Layout is **per-env sub-rings** ``[B, C, ...]`` (B = env batch,
    C = capacity per env).  Each rollout chunk appends its T observations
    time-contiguously per env lane, so slot ``(b, i+1 mod C)`` always holds
    the true successor observation of slot ``(b, i)`` — the one exception
    is the newest slot per env (its successor arrives with the *next*
    chunk), which sampling excludes.  This matches the reference's
    single-copy uint8 host replay (``xt/agent/dqn/atari_dqn.py:39-44``)
    and halves HBM vs the explicit-next :class:`ReplayState` — the
    difference between a 100k×84×84×4 Atari ring fitting on a v5e chip or
    not.

    Correctness requires consecutive ``packed_add`` calls per lane to be
    time-contiguous, which the on-device rollout guarantees (env_state and
    obs carry across train steps).  Host-farm segments arrive in arbitrary
    worker order and must keep the explicit-next ring instead.
    """

    obs: Any             # pytree, leaves [B, C, *obs_shape]
    action: Array        # [B, C] int32
    reward: Array        # [B, C] float32
    done: Array          # [B, C] float32
    insert_pos: Array    # [] int32 — per-env write position (lockstep)
    size: Array          # [] int32 — per-env valid entries

    @property
    def capacity(self) -> int:
        """Per-env capacity C."""
        return jax.tree_util.tree_leaves(self.obs)[0].shape[1]

    @property
    def n_envs(self) -> int:
        return jax.tree_util.tree_leaves(self.obs)[0].shape[0]


def packed_init(obs_example: Any, n_envs: int, capacity_per_env: int
                ) -> PackedReplayState:
    """Allocate a ``[B, C]`` packed ring; ``obs_example`` is one
    observation pytree (no batch axis)."""
    B, C = int(n_envs), int(capacity_per_env)
    obs = jax.tree_util.tree_map(
        lambda x: jnp.zeros((B, C) + jnp.shape(x), jnp.asarray(x).dtype),
        obs_example)
    return PackedReplayState(
        obs=obs,
        action=jnp.zeros((B, C), jnp.int32),
        reward=jnp.zeros((B, C), jnp.float32),
        done=jnp.zeros((B, C), jnp.float32),
        insert_pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def packed_add(state: PackedReplayState, obs: Any, action: Array,
               reward: Array, done: Array) -> PackedReplayState:
    """Append a time-major rollout chunk (``[T, B, ...]``), wrapping.

    Only the pre-step observations are stored — ``last_obs`` of this chunk
    becomes ``obs[0]`` of the next chunk, completing the successor chain.
    """
    T = action.shape[0]
    C = state.capacity
    idx = (state.insert_pos + jnp.arange(T, dtype=jnp.int32)) % C

    def write(buf, vals):
        # vals [T, B, ...] → [B, T, ...] scatter along the ring axis
        return buf.at[:, idx].set(jnp.swapaxes(vals, 0, 1))

    return PackedReplayState(
        obs=jax.tree_util.tree_map(write, state.obs, obs),
        action=write(state.action, action.astype(jnp.int32)),
        reward=write(state.reward, reward.astype(jnp.float32)),
        done=write(state.done, done.astype(jnp.float32)),
        insert_pos=(state.insert_pos + T) % C,
        size=jnp.minimum(state.size + T, C),
    )


def packed_sample(state: PackedReplayState, key: Array, batch_size: int
                  ) -> Dict[str, Any]:
    """Uniform sample of transitions with reconstructed ``next_obs``.

    Valid slots per env are the ``size - 1`` oldest entries — the newest
    entry's successor has not been written yet (at a ``done`` the stored
    successor is the auto-reset obs; the ``(1-done)`` TD mask makes the
    bootstrap value unused, same as the explicit-next ring).
    """
    kb, ki = jax.random.split(key)
    B, C = state.n_envs, state.capacity
    b = jax.random.randint(kb, (batch_size,), 0, B)
    n_valid = jnp.maximum(state.size - 1, 1)
    i = jax.random.randint(ki, (batch_size,), 0, n_valid)
    # oldest live slot: 0 until the ring wraps, then insert_pos
    oldest = jnp.where(state.size == C, state.insert_pos, 0)
    slot = (oldest + i) % C
    nxt = (slot + 1) % C
    return {
        "obs": jax.tree_util.tree_map(lambda o: o[b, slot], state.obs),
        "next_obs": jax.tree_util.tree_map(lambda o: o[b, nxt], state.obs),
        "action": state.action[b, slot],
        "reward": state.reward[b, slot],
        "done": state.done[b, slot],
    }


# ---------------------------------------------------------------------------
# Frame ring — single-FRAME storage for frame-stacked pixel observations
# ---------------------------------------------------------------------------

@struct.dataclass
class FrameRingState:
    """Per-env ring storing ONE frame per transition.

    For frame-stacked pixel observations (:class:`~xingtian_tpu.envs.
    arcade.PixelObs`: ``obs_t = concat(obs_{t-1}[..., 1:], frame_t)``),
    consecutive transitions share S-1 of their S frames — so storing the
    whole stack wastes 4× HBM (and the explicit-next ring 8×).  This ring
    stores only each step's newest frame and reconstructs the stack at
    sample time from S consecutive slots, with episode boundaries handled
    by repeating the episode-start frame (exactly what the env's reset
    produces).  A 100k-transition 84×84×4 uint8 replay costs 705 MB
    instead of 2.8 GB (packed) or 5.6 GB (explicit) — the dopamine-style
    frame replay, expressed as static-shape gathers.
    """

    frames: Array        # [B, C, H, W] uint8 — newest frame per transition
    action: Array        # [B, C] int32
    reward: Array        # [B, C] float32
    done: Array          # [B, C] float32
    insert_pos: Array    # [] int32
    size: Array          # [] int32

    @property
    def capacity(self) -> int:
        return self.frames.shape[1]

    @property
    def n_envs(self) -> int:
        return self.frames.shape[0]


def frame_ring_init(frame_shape, n_envs: int, capacity_per_env: int,
                    dtype=jnp.uint8) -> FrameRingState:
    B, C = int(n_envs), int(capacity_per_env)
    return FrameRingState(
        frames=jnp.zeros((B, C) + tuple(frame_shape), dtype),
        action=jnp.zeros((B, C), jnp.int32),
        reward=jnp.zeros((B, C), jnp.float32),
        done=jnp.zeros((B, C), jnp.float32),
        insert_pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def frame_ring_add(state: FrameRingState, obs: Array, action: Array,
                   reward: Array, done: Array) -> FrameRingState:
    """Append a time-major chunk; only ``obs[..., -1]`` (the newest frame
    of each stacked observation) is stored."""
    T = action.shape[0]
    C = state.capacity
    idx = (state.insert_pos + jnp.arange(T, dtype=jnp.int32)) % C

    def write(buf, vals):
        return buf.at[:, idx].set(jnp.swapaxes(vals, 0, 1))

    return FrameRingState(
        frames=write(state.frames, obs[..., -1]),
        action=write(state.action, action.astype(jnp.int32)),
        reward=write(state.reward, reward.astype(jnp.float32)),
        done=write(state.done, done.astype(jnp.float32)),
        insert_pos=(state.insert_pos + T) % C,
        size=jnp.minimum(state.size + T, C),
    )


def frame_ring_sample(state: FrameRingState, key: Array, batch_size: int,
                      n_stack: int) -> Dict[str, Array]:
    """Uniform transition sample with stacks rebuilt from the ring.

    Valid slots leave ``n_stack - 1`` history slots behind them and one
    successor ahead.  Walking k slots back, the first ``done`` marks the
    episode boundary: every older stack position repeats the last
    in-episode frame (the auto-reset obs is exactly that repetition, so
    the rebuilt stack matches what the env produced).  ``next_obs``
    shares S-1 frames with ``obs`` — 5 frame gathers per sample total.
    """
    S = int(n_stack)
    kb, ki = jax.random.split(key)
    B, C = state.n_envs, state.capacity
    b = jax.random.randint(kb, (batch_size,), 0, B)
    n_valid = jnp.maximum(state.size - S, 1)
    oldest = jnp.where(state.size == C, state.insert_pos, 0)
    slot = (oldest + (S - 1)
            + jax.random.randint(ki, (batch_size,), 0, n_valid)) % C

    newest = state.frames[b, slot]                     # [N, H, W]
    outs = [newest]
    fill = newest
    blocked = jnp.zeros((batch_size,), bool)
    for k in range(1, S):
        sk = (slot - k) % C
        blocked = blocked | (state.done[b, sk] > 0)
        cand = state.frames[b, sk]
        mask = blocked.reshape((-1,) + (1,) * (cand.ndim - 1))
        f = jnp.where(mask, fill, cand)
        outs.append(f)
        fill = f
    obs = jnp.stack(outs[::-1], axis=-1)               # [N, H, W, S]

    nxt = (slot + 1) % C
    next_obs = jnp.concatenate(
        [obs[..., 1:], state.frames[b, nxt][..., None]], axis=-1)
    return {
        "obs": obs,
        "next_obs": next_obs,
        "action": state.action[b, slot],
        "reward": state.reward[b, slot],
        "done": state.done[b, slot],
    }


# ---------------------------------------------------------------------------
# Prioritized buffer (dense sum tree, static shapes)
# ---------------------------------------------------------------------------

@struct.dataclass
class SumTree:
    """Dense binary sum tree over ``capacity`` leaves (capacity = 2^k).

    Heap layout: node i has children 2i+1, 2i+2; leaves start at
    ``capacity-1``.  Equivalent capability to the reference's
    ``segment_tree.py`` (157 LoC of Python lists) with O(log n) jittable
    update & stratified sampling.
    """

    nodes: Array         # [2*capacity - 1] float32

    @property
    def capacity(self) -> int:
        return (self.nodes.shape[0] + 1) // 2

    @classmethod
    def init(cls, capacity: int) -> "SumTree":
        assert capacity & (capacity - 1) == 0, "capacity must be a power of 2"
        return cls(nodes=jnp.zeros((2 * capacity - 1,), jnp.float32))

    @property
    def total(self) -> Array:
        return self.nodes[0]

    def update(self, leaf_idx: Array, priorities: Array) -> "SumTree":
        """Set priorities at ``leaf_idx`` (batched) and repair ancestors."""
        cap = self.capacity
        depth = cap.bit_length() - 1  # levels above the leaves (cap = 2^depth)
        nodes = self.nodes.at[leaf_idx + cap - 1].set(priorities)

        # repair bottom-up: recompute each touched ancestor from children
        idx = leaf_idx + cap - 1
        def body(nodes_idx, _):
            nodes, idx = nodes_idx
            parent = (idx - 1) // 2
            left = nodes[2 * parent + 1]
            right = nodes[2 * parent + 2]
            nodes = nodes.at[parent].set(left + right)
            return (nodes, parent), None
        (nodes, _), _ = jax.lax.scan(body, (nodes, idx), None, length=depth)
        return SumTree(nodes=nodes)

    def sample(self, key: Array, batch_size: int) -> Tuple[Array, Array]:
        """Stratified sampling: returns (leaf indices, their priorities)."""
        cap = self.capacity
        depth = cap.bit_length() - 1
        bounds = jnp.linspace(0.0, 1.0, batch_size + 1)
        u = jax.random.uniform(key, (batch_size,))
        targets = (bounds[:-1] + u * (bounds[1:] - bounds[:-1])) * self.total

        def descend(carry, _):
            node, tgt = carry
            left = 2 * node + 1
            left_sum = self.nodes[left]
            go_right = tgt > left_sum
            node = jnp.where(go_right, left + 1, left)
            tgt = jnp.where(go_right, tgt - left_sum, tgt)
            return (node, tgt), None

        nodes0 = jnp.zeros((batch_size,), jnp.int32)
        (nodes, _), _ = jax.lax.scan(
            descend, (nodes0, targets), None, length=depth)
        leaf_idx = nodes - (cap - 1)
        leaf_idx = jnp.clip(leaf_idx, 0, cap - 1)
        return leaf_idx, self.nodes[leaf_idx + cap - 1]
