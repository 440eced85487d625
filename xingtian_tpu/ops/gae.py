"""Generalized Advantage Estimation on device.

The reference computes GAE in a Python loop over numpy inside the agent
(``xt/agent/ppo/ppo.py:88-107``): ``adv[j] += adv[j+1]*discount[j]*LAM``
with ``discount = ~done * GAMMA``.  Here the same recurrence runs on
device, two ways:

* :func:`gae` — ``lax.scan`` reversed, the straightforward form;
* :func:`gae_associative` — ``lax.associative_scan`` over the linear
  recurrence ``A[t] = b[t] + a[t]·A[t+1]``, O(log T) depth instead of
  O(T), which XLA maps onto the VPU far better for long rollouts.

Both operate time-major ``[T, B]`` and are verified equal in tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pallas_dispatch(rewards: Array):
    from xingtian_tpu.ops import pallas_scan
    return pallas_scan.dispatch(rewards)


def gae(
    rewards: Array,        # [T, B] float32
    values: Array,         # [T, B] value(s_t)
    bootstrap_value: Array,  # [B]  value(s_T)
    dones: Array,          # [T, B] bool/float — episode ended at step t
    gamma: float = 0.99,
    lam: float = 0.95,
    backend: str = "auto",
) -> Tuple[Array, Array]:
    """Return ``(advantages, target_values)`` with ``target = adv + value``.

    Matches the reference recurrence exactly (``xt/agent/ppo/ppo.py:88-107``):
    ``delta_t = r + γ·(1-done)·V(s') − V(s)``;
    ``adv[t] = delta[t] + γλ·(1-done[t])·adv[t+1]``.

    ``backend="auto"`` uses the fused Pallas kernel on TPU when the batch
    is lane-aligned (``ops/pallas_scan.py``), the ``lax.scan`` form
    otherwise; "scan" / "pallas" force one.
    """
    dispatch = _pallas_dispatch(rewards) if backend == "auto" else (
        "direct" if backend == "pallas" else None)
    if dispatch == "direct":
        from xingtian_tpu.ops.pallas_scan import gae_pallas
        return gae_pallas(rewards, values, bootstrap_value, dones, gamma, lam)
    if dispatch is not None:       # ('sharded', mesh)
        from xingtian_tpu.ops.pallas_scan import gae_pallas_sharded
        return gae_pallas_sharded(
            rewards, values, bootstrap_value, dones, gamma, lam, dispatch[1])
    cont = 1.0 - dones.astype(values.dtype)
    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = rewards + gamma * cont * next_values - values
    decay = gamma * lam * cont

    def body(carry, xs):
        delta_t, decay_t = xs
        adv_t = delta_t + decay_t * carry
        return adv_t, adv_t

    _, adv = jax.lax.scan(body, jnp.zeros_like(bootstrap_value),
                          (deltas, decay), reverse=True)
    return adv, adv + values


def gae_associative(
    rewards: Array,
    values: Array,
    bootstrap_value: Array,
    dones: Array,
    gamma: float = 0.99,
    lam: float = 0.95,
) -> Tuple[Array, Array]:
    """Same recurrence via ``associative_scan`` (log-depth).

    ``A[t] = b[t] + a[t]·A[t+1]`` composes as
    ``(a1,b1)∘(a2,b2) = (a1·a2, b1 + a1·b2)`` scanned from the tail.
    """
    cont = 1.0 - dones.astype(values.dtype)
    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = rewards + gamma * cont * next_values - values
    decay = gamma * lam * cont

    def combine(earlier, later):
        # affine composition: applying `later` after `earlier` in scan order
        a_e, b_e = earlier
        a_l, b_l = later
        return a_e * a_l, b_l + a_l * b_e

    a_rev = jnp.flip(decay, axis=0)
    b_rev = jnp.flip(deltas, axis=0)
    _, adv_rev = jax.lax.associative_scan(combine, (a_rev, b_rev), axis=0)
    adv = jnp.flip(adv_rev, axis=0)
    return adv, adv + values


def discounted_returns(
    rewards: Array, dones: Array, bootstrap_value: Array, gamma: float = 0.99
) -> Array:
    """N-step discounted return ``G[t] = r[t] + γ·(1-done[t])·G[t+1]``."""
    cont = 1.0 - dones.astype(rewards.dtype)

    def body(carry, xs):
        r_t, c_t = xs
        g_t = r_t + gamma * c_t * carry
        return g_t, g_t

    _, returns = jax.lax.scan(body, bootstrap_value, (rewards, cont), reverse=True)
    return returns
