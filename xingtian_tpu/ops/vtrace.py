"""V-trace off-policy correction (IMPALA) on device.

Functional parity with the reference's TF port of deepmind/scalable_agent
(``xt/model/impala/vtrace.py:39-115``): same IS-weight clipping (ρ̄ = c̄ = 1
by default), same reversed-scan fixed point, same pg-advantage formula.
The TF ``tf.scan(reverse=True, parallel_iterations=1)`` becomes a
``lax.scan``; a log-depth ``associative_scan`` form is provided for long
sequences.  All inputs are time-major ``[T, B, ...]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pallas_dispatch(rewards: Array):
    from xingtian_tpu.ops import pallas_scan
    return pallas_scan.dispatch(rewards)


class VTraceReturns(NamedTuple):
    vs: Array                # [T, B] corrected value targets
    pg_advantages: Array     # [T, B] policy-gradient advantages


def vtrace_from_log_rhos(
    log_rhos: Array,         # [T, B] log(π_target/π_behaviour) of taken actions
    discounts: Array,        # [T, B] γ·(1-done)
    rewards: Array,          # [T, B]
    values: Array,           # [T, B] V(s_t) under target params
    bootstrap_value: Array,  # [B]    V(s_T)
    clip_rho_threshold: float = 1.0,
    clip_pg_rho_threshold: float = 1.0,
    use_associative_scan: bool = False,
    backend: str = "auto",
) -> VTraceReturns:
    dispatch = _pallas_dispatch(rewards) if backend == "auto" else (
        "direct" if backend == "pallas" else None)
    if dispatch == "direct":
        from xingtian_tpu.ops.pallas_scan import vtrace_pallas
        vs, pg_adv = vtrace_pallas(
            log_rhos, discounts, rewards, values, bootstrap_value,
            clip_rho_threshold, clip_pg_rho_threshold)
        return VTraceReturns(vs=vs, pg_advantages=pg_adv)
    if dispatch is not None:       # ('sharded', mesh)
        from xingtian_tpu.ops.pallas_scan import vtrace_pallas_sharded
        vs, pg_adv = vtrace_pallas_sharded(
            log_rhos, discounts, rewards, values, bootstrap_value,
            clip_rho_threshold, clip_pg_rho_threshold, dispatch[1])
        return VTraceReturns(vs=vs, pg_advantages=pg_adv)

    rhos = jnp.exp(log_rhos)
    clipped_rhos = jnp.minimum(clip_rho_threshold, rhos)
    clipped_pg_rhos = jnp.minimum(clip_pg_rho_threshold, rhos)
    cs = jnp.minimum(1.0, rhos)  # "trace cutting" coefficient

    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = clipped_rhos * (rewards + discounts * next_values - values)

    # vs − V(s) satisfies A[t] = δ[t] + γ[t]·c[t]·A[t+1]
    decay = discounts * cs
    if use_associative_scan:
        def combine(earlier, later):
            a_e, b_e = earlier
            a_l, b_l = later
            return a_e * a_l, b_l + a_l * b_e
        _, acc_rev = jax.lax.associative_scan(
            combine, (jnp.flip(decay, 0), jnp.flip(deltas, 0)), axis=0)
        vs_minus_v = jnp.flip(acc_rev, 0)
    else:
        def body(carry, xs):
            delta_t, decay_t = xs
            acc = delta_t + decay_t * carry
            return acc, acc
        _, vs_minus_v = jax.lax.scan(
            body, jnp.zeros_like(bootstrap_value), (deltas, decay), reverse=True)

    vs = vs_minus_v + values
    next_vs = jnp.concatenate([vs[1:], bootstrap_value[None]], axis=0)
    pg_advantages = clipped_pg_rhos * (rewards + discounts * next_vs - values)
    return VTraceReturns(
        vs=jax.lax.stop_gradient(vs),
        pg_advantages=jax.lax.stop_gradient(pg_advantages),
    )


def vtrace_from_logits(
    behaviour_logits: Array,  # [T, B, A]
    target_logits: Array,     # [T, B, A]
    actions: Array,           # [T, B] int
    discounts: Array,
    rewards: Array,
    values: Array,
    bootstrap_value: Array,
    clip_rho_threshold: float = 1.0,
    clip_pg_rho_threshold: float = 1.0,
    use_associative_scan: bool = False,
    backend: str = "auto",
) -> VTraceReturns:
    """``from_logic_outputs`` parity (``vtrace.py:39-115``): log-probs via
    softmax cross-entropy of the taken action under both policies."""
    target_logp = _action_log_prob(target_logits, actions)
    behaviour_logp = _action_log_prob(behaviour_logits, actions)
    return vtrace_from_log_rhos(
        target_logp - behaviour_logp,
        discounts, rewards, values, bootstrap_value,
        clip_rho_threshold, clip_pg_rho_threshold,
        use_associative_scan=use_associative_scan,
        backend=backend,
    )


def _action_log_prob(logits: Array, actions: Array) -> Array:
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(
        logp_all, actions[..., None].astype(jnp.int32), axis=-1)[..., 0]
