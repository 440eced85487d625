"""Data-parallel execution of an algorithm's fused train step.

The reference's data parallelism is N gradient-worker subprocesses
averaging grads through a 100M-element ``RawArray``
(``xt/framework/trainer.py:32-144``); its actor parallelism is env_num
explorer processes per node.  Here both are one GSPMD program: per-env
state (env pytree, obs, running episode stats) is sharded over the ``dp``
mesh axis, params/optimizer state are replicated, and XLA inserts the
gradient all-reduce automatically from the sharding constraints — the
``psum`` rides ICI, replacing RawArray + plasma + ZMQ in one annotation.

Usage::

    mesh = make_mesh()
    state = alg.init_state(key)               # host/single-device pytree
    state, step = make_dp_step(alg, mesh, state)
    state, metrics = step(state)              # jitted, sharded, donated
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xingtian_tpu.agents.rollout import EpisodeStats
from xingtian_tpu.algos.base import AlgoState, Algorithm
from xingtian_tpu.parallel.mesh import DP_AXIS


def algo_state_shardings(state: AlgoState, mesh: Mesh) -> AlgoState:
    """Build the NamedSharding pytree for an AlgoState.

    Per-env leaves (leading axis = n_envs) shard over ``dp``; everything
    else (params, opt state, PRNG key, counters, scalar aggregates)
    replicates.  Works for subclassed states too: extra leaves are
    replicated unless they live under ``env_state``/``obs``/``ep_stats``
    running fields.
    """
    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P(DP_AXIS))

    def all_repl(tree):
        return jax.tree_util.tree_map(lambda _: repl, tree)

    def all_shard0(tree):
        return jax.tree_util.tree_map(lambda _: shard0, tree)

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
    updates = dict(
        params=all_repl(state.params),
        opt_state=all_repl(state.opt_state),
        env_state=all_shard0(state.env_state),
        obs=shard0,
        ep_stats=ep_shardings,
        key=repl,
        update_step=repl,
        env_steps=repl,
    )
    # subclass extras (e.g. replay buffer, target params) default to replicated
    extra = {
        f: all_repl(getattr(state, f))
        for f in state.__dataclass_fields__
        if f not in updates
    }
    updates.update(extra)
    return type(state)(**updates)


def make_dp_step(alg: Algorithm, mesh: Mesh, state: AlgoState,
                 donate: bool = True) -> Tuple[AlgoState, callable]:
    """Place ``state`` on the mesh and return (placed_state, jitted step).

    The env batch must be divisible by the ``dp`` axis size.
    """
    n_envs = state.obs.shape[0]
    dp = mesh.shape[DP_AXIS]
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
    return placed, step
