"""Pallas TPU kernels for the temporal-scan hot ops (GAE, V-trace).

Why a kernel at all: ``jax.lax.scan`` over T steps lowers to a sequential
XLA while-loop whose per-step body round-trips [B]-vectors through HBM;
``associative_scan`` is log-depth but materialises O(log T) intermediate
[T, B] arrays.  Both recurrences are tiny-FLOP / bandwidth-bound, so the
speed-of-light implementation reads each [T, B] operand from HBM exactly
once, runs the whole backward recurrence in VMEM, and writes each output
exactly once.  That is what these kernels do: grid over 128-lane batch
tiles, full time axis resident in VMEM (T×B_tile×4B ≪ 16MB for every RL
geometry in the framework), ``fori_loop`` over time inside the kernel.

Reference parity: the V-trace recursion is the reference's
``tf.scan(reverse=True)`` fixed point (``xt/model/impala/vtrace.py:94-106``)
and GAE is the agent-side numpy loop (``xt/agent/ppo/ppo.py:88-107``).
Numerics are verified against the ``lax.scan`` forms in
``tests/test_pallas.py`` (interpret mode on CPU, compiled on TPU).

Both ops are used under ``stop_gradient`` by every caller (advantages and
value targets are constants of the loss — ``xt/model/ppo/__init__.py:4-25``,
``impala_cnn_opt.py:321-351``), so no custom VJP is needed; the wrappers
stop gradients explicitly at the call boundary.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Lane width of the VPU; batch tiles are multiples of this.
_LANES = 128
# Widest batch tile processed by one grid step (4 vector registers wide).
_MAX_TILE = 512


def _interpret() -> bool:
    """Compile for real on TPU; interpret everywhere else (CPU tests)."""
    if os.environ.get("XT_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def pallas_enabled() -> bool:
    """Auto-dispatch policy: kernels on by default on TPU.

    Single-device processes call the kernels directly.  Multi-device
    processes dispatch through :func:`sharded` — a ``shard_map`` over the
    active training mesh (set by ``parallel.dp.make_dp_step``) that runs
    the kernel per-shard on its local ``[T, B/dp]`` tile; the temporal
    recurrence never crosses the batch axis, so the per-shard result is
    exact with zero collectives.  When no mesh has been declared the
    multi-device caller falls back to ``lax.scan`` (a bare ``pallas_call``
    inside a GSPMD program over a sharded batch would not be partitioned
    with the surrounding program).  ``XT_PALLAS=1`` forces the kernels on
    (CPU interpret mode included); ``XT_NO_PALLAS`` forces them off.
    """
    if os.environ.get("XT_NO_PALLAS"):
        return False
    if os.environ.get("XT_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def dispatch(rewards) -> object:
    """Auto-dispatch decision for a [T, B] temporal-scan op.

    Returns ``'direct'`` (single-device kernel), ``('sharded', mesh)``
    (shard_map over the active dp mesh), or ``None`` (callers fall back
    to their ``lax.scan`` form).  Shared by ``ops/gae.py`` and
    ``ops/vtrace.py``.
    """
    if not (getattr(rewards, "ndim", 0) == 2 and pallas_enabled()):
        return None
    B = rewards.shape[1]
    if B % _LANES != 0:
        _warn_once(
            f"pallas scan kernel falling back to lax.scan: batch {B} is "
            f"not a multiple of {_LANES} lanes (pad the env batch for the "
            "fused kernel)")
        return None
    if jax.device_count() == 1:
        return "direct"
    mesh = sharded_dispatch_mesh(B)
    if mesh is None:
        _warn_once(
            f"pallas scan kernel falling back to lax.scan on a "
            f"{jax.device_count()}-device process: no active dp mesh or "
            f"per-shard batch of B={B} not {_LANES}-lane aligned")
        return None
    return ("sharded", mesh)


def sharded_dispatch_mesh(B: int):
    """The mesh to shard_map a [T, B]-batch kernel over, or None.

    Requires: >1 device, an active training mesh, and a per-shard batch
    that is still lane-aligned (``(B / dp) % 128 == 0``).
    """
    if jax.device_count() == 1:
        return None
    from xingtian_tpu.parallel.mesh import DP_AXIS, active_mesh
    mesh = active_mesh()
    if mesh is None:
        return None
    dp = mesh.shape.get(DP_AXIS, 1)
    if dp <= 1 or B % dp != 0 or (B // dp) % _LANES != 0:
        return None
    return mesh


def _shard_map_tb(fn, mesh, n_scalar_args: int):
    """shard_map a ``(*[T,B] arrays, boot [B], *scalars) -> ([T,B], [T,B])``
    kernel over the batch axis of ``mesh``."""
    from jax.sharding import PartitionSpec as P
    from xingtian_tpu.parallel.mesh import DP_AXIS
    tb = P(None, DP_AXIS)

    def wrapper(*args):
        arrays, scalars = args[:-n_scalar_args], args[-n_scalar_args:]
        in_specs = tuple(
            tb if a.ndim == 2 else P(DP_AXIS) for a in arrays
        ) + (P(),) * n_scalar_args
        # check_vma=False: pallas_call out_shapes carry no varying-axis
        # metadata; the kernel is elementwise in the batch shard so the
        # per-shard semantics are trivially correct
        f = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=(tb, tb), check_vma=False)
        return f(*args)

    return wrapper


def _batch_tile(B: int) -> int:
    if B % _LANES != 0:
        return 0  # fall back: ragged lanes would compute on padding garbage
    for t in (_MAX_TILE, 384, 256, _LANES):  # must divide B exactly
        if t <= B and B % t == 0:
            return t
    return _LANES


# ---------------------------------------------------------------------------
# GAE:  adv[t] = δ[t] + γλ·(1−done[t])·adv[t+1],
#       δ[t]  = r[t] + γ·(1−done[t])·V[t+1] − V[t]
# ---------------------------------------------------------------------------

def _gae_kernel(hyper_ref, rewards_ref, values_ext_ref, dones_ref,
                adv_ref, target_ref):
    # Mosaic cannot dynamic-slice *values* with a traced index — all
    # per-step reads/writes go through the refs (which it can).
    T = rewards_ref.shape[0]
    gamma = hyper_ref[0, 0]
    lam = hyper_ref[0, 1]

    def body(i, acc):
        t = T - 1 - i
        v_t = values_ext_ref[t, :]
        cont = (1.0 - dones_ref[t, :]) * gamma        # γ·(1−done[t])
        delta = rewards_ref[t, :] + cont * values_ext_ref[t + 1, :] - v_t
        acc = delta + lam * cont * acc
        adv_ref[t, :] = acc
        target_ref[t, :] = acc + v_t
        return acc

    jax.lax.fori_loop(
        0, T, body, jnp.zeros(rewards_ref.shape[1:], rewards_ref.dtype))


def gae_pallas(rewards: Array, values: Array, bootstrap_value: Array,
               dones: Array, gamma, lam):
    """Fused-GAE entry; same contract as :func:`xingtian_tpu.ops.gae.gae`.

    Returns ``(advantages, target_values)``, both ``stop_gradient``-ed.
    Raises ``ValueError`` when the batch is not lane-aligned (callers
    auto-dispatch handle the fallback).
    """
    T, B = rewards.shape
    Bt = _batch_tile(B)
    if Bt == 0:
        raise ValueError(f"gae_pallas needs B % {_LANES} == 0, got B={B}")

    f32 = jnp.float32
    rewards = jax.lax.stop_gradient(rewards).astype(f32)
    values = jax.lax.stop_gradient(values).astype(f32)
    boot = jax.lax.stop_gradient(bootstrap_value).astype(f32)
    dones = jax.lax.stop_gradient(dones).astype(f32)
    values_ext = jnp.concatenate([values, boot[None]], axis=0)   # [T+1, B]
    hyper = jnp.asarray([gamma, lam], f32).reshape(1, 2)

    grid = (B // Bt,)
    tile = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, Bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    adv, target = pl.pallas_call(
        _gae_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            tile(T), tile(T + 1), tile(T),
        ],
        out_specs=(tile(T), tile(T)),
        out_shape=(jax.ShapeDtypeStruct((T, B), f32),
                   jax.ShapeDtypeStruct((T, B), f32)),
        interpret=_interpret(),
    )(hyper, rewards, values_ext, dones)
    return adv, target


# ---------------------------------------------------------------------------
# V-trace:  A[t] = δ[t] + γ[t]·c[t]·A[t+1];  vs = A + V;
#           pg_adv[t] = ρ̂_pg[t]·(r[t] + γ[t]·vs[t+1] − V[t])
# ---------------------------------------------------------------------------

def _vtrace_kernel(clip_ref, log_rhos_ref, discounts_ref, rewards_ref,
                   values_ext_ref, vs_ref, pg_adv_ref):
    # All per-step dynamic indexing goes through refs (Mosaic constraint).
    T = rewards_ref.shape[0]
    clip_rho = clip_ref[0, 0]
    clip_pg = clip_ref[0, 1]

    def body(i, carry):
        acc, prev_vs = carry                      # A[t+1], vs[t+1]
        t = T - 1 - i
        rho_t = jnp.exp(log_rhos_ref[t, :])
        disc_t = discounts_ref[t, :]
        r_t = rewards_ref[t, :]
        v_t = values_ext_ref[t, :]
        pg_adv_ref[t, :] = jnp.minimum(clip_pg, rho_t) * (
            r_t + disc_t * prev_vs - v_t)
        delta = jnp.minimum(clip_rho, rho_t) * (
            r_t + disc_t * values_ext_ref[t + 1, :] - v_t)
        acc = delta + disc_t * jnp.minimum(1.0, rho_t) * acc
        vs_t = acc + v_t
        vs_ref[t, :] = vs_t
        return acc, vs_t

    zero = jnp.zeros(rewards_ref.shape[1:], rewards_ref.dtype)
    boot = values_ext_ref[T, :]
    jax.lax.fori_loop(0, T, body, (zero, boot))


def vtrace_pallas(log_rhos: Array, discounts: Array, rewards: Array,
                  values: Array, bootstrap_value: Array,
                  clip_rho_threshold: float = 1.0,
                  clip_pg_rho_threshold: float = 1.0):
    """Fused V-trace; returns ``(vs, pg_advantages)`` (stop_gradient-ed)."""
    T, B = rewards.shape
    Bt = _batch_tile(B)
    if Bt == 0:
        raise ValueError(f"vtrace_pallas needs B % {_LANES} == 0, got B={B}")

    f32 = jnp.float32
    sg = jax.lax.stop_gradient
    log_rhos = sg(log_rhos).astype(f32)
    discounts = sg(discounts).astype(f32)
    rewards = sg(rewards).astype(f32)
    values_ext = jnp.concatenate(
        [sg(values).astype(f32), sg(bootstrap_value).astype(f32)[None]], axis=0)
    clips = jnp.asarray(
        [clip_rho_threshold, clip_pg_rho_threshold], f32).reshape(1, 2)

    grid = (B // Bt,)
    tile = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, Bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    vs, pg_adv = pl.pallas_call(
        _vtrace_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            tile(T), tile(T), tile(T), tile(T + 1),
        ],
        out_specs=(tile(T), tile(T)),
        out_shape=(jax.ShapeDtypeStruct((T, B), f32),
                   jax.ShapeDtypeStruct((T, B), f32)),
        interpret=_interpret(),
    )(clips, log_rhos, discounts, rewards, values_ext)
    return vs, pg_adv


def gae_pallas_sharded(rewards, values, bootstrap_value, dones, gamma, lam,
                       mesh):
    """GAE kernel per-shard over the mesh's dp axis (exact: the backward
    recurrence runs along T, which is unsharded)."""
    gamma = jnp.asarray(gamma, jnp.float32)
    lam = jnp.asarray(lam, jnp.float32)
    fn = _shard_map_tb(gae_pallas, mesh, n_scalar_args=2)
    return fn(rewards, values, bootstrap_value, dones, gamma, lam)


def vtrace_pallas_sharded(log_rhos, discounts, rewards, values,
                          bootstrap_value, clip_rho_threshold,
                          clip_pg_rho_threshold, mesh):
    """V-trace kernel per-shard over the mesh's dp axis."""
    clip_rho = jnp.asarray(clip_rho_threshold, jnp.float32)
    clip_pg = jnp.asarray(clip_pg_rho_threshold, jnp.float32)
    fn = _shard_map_tb(vtrace_pallas, mesh, n_scalar_args=2)
    return fn(log_rhos, discounts, rewards, values, bootstrap_value,
              clip_rho, clip_pg)


@functools.lru_cache(maxsize=None)
def _warn_once(msg: str) -> None:
    import logging
    logging.getLogger("xingtian_tpu").info(msg)
