"""Data-parallel execution of an algorithm's fused train step.

The reference's data parallelism is N gradient-worker subprocesses
averaging grads through a 100M-element ``RawArray``
(``xt/framework/trainer.py:32-144``); its actor parallelism is env_num
explorer processes per node.  Here both are one GSPMD program: per-env
state (env pytree, obs, running episode stats) is sharded over the ``dp``
mesh axis, params/optimizer state are replicated, and XLA inserts the
gradient all-reduce automatically from the sharding constraints — the
``psum`` rides ICI, replacing RawArray + plasma + ZMQ in one annotation.

Replay sharding decision (VERDICT r1): ring buffers (DQN transitions,
QMIX episodes, MuZero positions) are **sharded over dp along the capacity
axis** rather than replicated — a P-device mesh holds one buffer of the
configured size, not P copies.  Inserts/samples on the sharded ring cost
collectives proportional to the *batch*, never the buffer: a scatter of
[n]-updates into the local shard and a gather of [batch] samples, both
tiny next to the conv fwd/bwd they feed.  Capacities not divisible by
the dp size fall back to replicated (e.g. the 1-slot placeholder ring
that HOST_REPLAY mode keeps for pytree stability).

Usage::

    mesh = make_mesh()
    state = alg.init_state(key)               # host/single-device pytree
    state, step = make_dp_step(alg, mesh, state)
    state, metrics = step(state)              # jitted, sharded, donated

Works for any algorithm state dataclass (AlgoState subclasses and the
episodic QMIX/SCC states): fields are classified by name/type, so
subclass extras get the right placement instead of silently replicating.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xingtian_tpu.agents.rollout import EpisodeStats
from xingtian_tpu.algos.base import AlgoState, Algorithm
from xingtian_tpu.ops.replay import (
    FrameRingState, PackedReplayState, ReplayState)
from xingtian_tpu.parallel.mesh import DP_AXIS, set_active_mesh

# state fields whose leaves carry a leading per-env axis
_PER_ENV_FIELDS = ("env_state", "obs")


def algo_state_shardings(state, mesh: Mesh):
    """Build the NamedSharding pytree for an algorithm train state.

    Classification:

    * ``env_state``/``obs`` leaves (leading axis = n_envs) → shard over dp;
    * ``ep_stats`` → per-env running fields shard, aggregates replicate;
    * :class:`ReplayState` fields (any name) → data shards over capacity
      when divisible by the dp size, bookkeeping scalars replicate;
    * everything else (params, opt state, target/actor params, hypers,
      PRNG key, counters) → replicated.
    """
    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P(DP_AXIS))
    dp = mesh.shape[DP_AXIS]

    def all_repl(tree):
        return jax.tree_util.tree_map(lambda _: repl, tree)

    def all_shard0(tree):
        return jax.tree_util.tree_map(lambda _: shard0, tree)

    def ring_shardings(rs: ReplayState) -> ReplayState:
        def leaf_sharding(leaf):
            return shard0 if leaf.shape[0] % dp == 0 else repl
        return ReplayState(
            data=jax.tree_util.tree_map(leaf_sharding, rs.data),
            insert_pos=repl, size=repl)

    def packed_shardings(rs: PackedReplayState) -> PackedReplayState:
        # the leading axis is the env batch — shard it over dp exactly
        # like the live env state the lanes mirror
        def leaf_sharding(leaf):
            return shard0 if leaf.shape[0] % dp == 0 else repl
        return PackedReplayState(
            obs=jax.tree_util.tree_map(leaf_sharding, rs.obs),
            action=leaf_sharding(rs.action),
            reward=leaf_sharding(rs.reward),
            done=leaf_sharding(rs.done),
            insert_pos=repl, size=repl)

    def frame_ring_shardings(rs: FrameRingState) -> FrameRingState:
        def leaf_sharding(leaf):
            return shard0 if leaf.shape[0] % dp == 0 else repl
        return FrameRingState(
            frames=leaf_sharding(rs.frames),
            action=leaf_sharding(rs.action),
            reward=leaf_sharding(rs.reward),
            done=leaf_sharding(rs.done),
            insert_pos=repl, size=repl)

    ep_shardings = EpisodeStats(
        running_return=shard0,
        running_len=shard0,
        completed_return=repl,
        completed_len=repl,
        completed_count=repl,
        recent_return=repl,
        recent_len=repl,
        episodes_total=repl,
    )

    fields = {}
    for f in state.__dataclass_fields__:
        v = getattr(state, f)
        if f in _PER_ENV_FIELDS:
            fields[f] = all_shard0(v)
        elif isinstance(v, EpisodeStats):
            fields[f] = ep_shardings
        elif isinstance(v, ReplayState):
            fields[f] = ring_shardings(v)
        elif isinstance(v, PackedReplayState):
            fields[f] = packed_shardings(v)
        elif isinstance(v, FrameRingState):
            fields[f] = frame_ring_shardings(v)
        else:
            fields[f] = all_repl(v)
    return type(state)(**fields)


def make_population_step(pbt, mesh: Mesh, pop_state, donate: bool = True):
    """Shard a PBT population over the mesh (``algos/pbt.py``'s promised
    population parallelism — reference analog: ``pbt_size`` learner
    processes, ``xt/train.py:57-105``).

    Every leaf of the vmapped population state carries a leading ``[P]``
    member axis; sharding it over ``dp`` trains each member slice on its
    own device group with ZERO collectives in ``train_step`` (members are
    independent), while ``pbt_step``'s cross-member rank/gather becomes a
    small XLA collective over scalars + param gathers once per
    ``pbt_interval``.

    Returns ``(placed_pop_state, step, pbt_step)``.
    """
    dp = mesh.shape[DP_AXIS]
    pop_size = jax.tree_util.tree_leaves(pop_state.update_step)[0].shape[0]
    if pop_size % dp != 0:
        raise ValueError(f"population size {pop_size} must be divisible "
                         f"by dp axis size {dp}")
    shard0 = NamedSharding(mesh, P(DP_AXIS))
    repl = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: shard0, pop_state)
    placed = jax.device_put(pop_state, shardings)
    step = jax.jit(
        pbt.train_step,
        in_shardings=(shardings,),
        out_shardings=(shardings, shard0),     # metrics are [P]-leading too
        donate_argnums=(0,) if donate else (),
    )
    pbt_step = jax.jit(
        pbt.pbt_step,
        in_shardings=(shardings, repl),
        out_shardings=(shardings, shard0),
        donate_argnums=(0,) if donate else (),
    )
    return placed, step, pbt_step


def make_dp_step(alg: Algorithm, mesh: Mesh, state,
                 donate: bool = True) -> Tuple[AlgoState, callable]:
    """Place ``state`` on the mesh and return (placed_state, jitted step).

    For states that carry a persistent env batch, the batch must be
    divisible by the ``dp`` axis size; episodic trainers (QMIX/SCC) have
    no persistent env leaves and skip the check.
    """
    dp = mesh.shape[DP_AXIS]
    if getattr(state, "obs", None) is not None:
        n_envs = jax.tree_util.tree_leaves(state.obs)[0].shape[0]
        if n_envs % dp != 0:
            raise ValueError(
                f"n_envs={n_envs} must be divisible by dp axis size {dp}")
    shardings = algo_state_shardings(state, mesh)
    placed = jax.device_put(state, shardings)
    step = jax.jit(
        alg.train_step,
        in_shardings=(shardings,),
        out_shardings=(shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )

    def stepped(s):
        # expose the mesh to trace-time op dispatch (the Pallas shard_map
        # wrappers) only WHILE this step runs — a leaked global would make
        # unrelated single-replica traces in the same process shard_map
        # over a mesh their caller never asked for
        set_active_mesh(mesh)
        try:
            return step(s)
        finally:
            set_active_mesh(None)

    return placed, stepped
