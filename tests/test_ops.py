"""Deterministic numeric tests for GAE and V-trace against straight-line
numpy re-implementations of the reference recurrences
(``xt/agent/ppo/ppo.py:88-107``, ``xt/model/impala/vtrace.py:39-115``)."""

import jax
import jax.numpy as jnp
import numpy as np

from xingtian_tpu.ops.gae import discounted_returns, gae, gae_associative
from xingtian_tpu.ops.vtrace import vtrace_from_log_rhos, vtrace_from_logits


def _np_gae(rewards, values, bootstrap, dones, gamma, lam):
    """Literal transcription of the reference's numpy loop."""
    T, B = rewards.shape
    next_values = np.concatenate([values[1:], bootstrap[None]], 0)
    discount = (1.0 - dones) * gamma
    delta = rewards + discount * next_values - values
    adv = delta.copy()
    for j in range(T - 2, -1, -1):
        adv[j] += adv[j + 1] * discount[j] * lam
    return adv, adv + values


def _np_vtrace(log_rhos, discounts, rewards, values, bootstrap,
               rho_clip=1.0, pg_rho_clip=1.0):
    rhos = np.exp(log_rhos)
    clipped_rhos = np.minimum(rho_clip, rhos)
    cs = np.minimum(1.0, rhos)
    next_values = np.concatenate([values[1:], bootstrap[None]], 0)
    deltas = clipped_rhos * (rewards + discounts * next_values - values)
    T = len(rewards)
    acc = np.zeros_like(bootstrap)
    out = np.zeros_like(values)
    for t in range(T - 1, -1, -1):
        acc = deltas[t] + discounts[t] * cs[t] * acc
        out[t] = acc
    vs = out + values
    next_vs = np.concatenate([vs[1:], bootstrap[None]], 0)
    pg_adv = np.minimum(pg_rho_clip, rhos) * (rewards + discounts * next_vs - values)
    return vs, pg_adv


def _random_batch(seed, T=17, B=5):
    rng = np.random.RandomState(seed)
    rewards = rng.randn(T, B).astype(np.float32)
    values = rng.randn(T, B).astype(np.float32)
    bootstrap = rng.randn(B).astype(np.float32)
    dones = (rng.rand(T, B) < 0.15).astype(np.float32)
    return rewards, values, bootstrap, dones


class TestGAE:
    def test_matches_reference_recurrence(self):
        rewards, values, bootstrap, dones = _random_batch(0)
        adv, tv = gae(jnp.asarray(rewards), jnp.asarray(values),
                      jnp.asarray(bootstrap), jnp.asarray(dones), 0.99, 0.95)
        adv_np, tv_np = _np_gae(rewards, values, bootstrap, dones, 0.99, 0.95)
        np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tv), tv_np, rtol=1e-5, atol=1e-5)

    def test_associative_scan_equals_sequential(self):
        rewards, values, bootstrap, dones = _random_batch(1, T=64, B=3)
        a1, t1 = gae(jnp.asarray(rewards), jnp.asarray(values),
                     jnp.asarray(bootstrap), jnp.asarray(dones))
        a2, t2 = gae_associative(jnp.asarray(rewards), jnp.asarray(values),
                                 jnp.asarray(bootstrap), jnp.asarray(dones))
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=2e-5, atol=2e-5)

    def test_done_cuts_bootstrap(self):
        # single transition with done=1: adv = r - v exactly (no bootstrap)
        adv, _ = gae(jnp.ones((1, 1)), jnp.zeros((1, 1)),
                     jnp.full((1,), 100.0), jnp.ones((1, 1)))
        assert float(adv[0, 0]) == 1.0

    def test_discounted_returns(self):
        r = jnp.asarray([[1.0], [1.0], [1.0]])
        d = jnp.zeros((3, 1))
        g = discounted_returns(r, d, jnp.zeros((1,)), gamma=0.5)
        np.testing.assert_allclose(np.asarray(g[:, 0]), [1.75, 1.5, 1.0])


class TestVTrace:
    def test_matches_numpy(self):
        rng = np.random.RandomState(2)
        T, B = 13, 4
        log_rhos = (rng.randn(T, B) * 0.4).astype(np.float32)
        rewards, values, bootstrap, dones = _random_batch(3, T, B)
        discounts = ((1.0 - dones) * 0.99).astype(np.float32)
        out = vtrace_from_log_rhos(
            jnp.asarray(log_rhos), jnp.asarray(discounts), jnp.asarray(rewards),
            jnp.asarray(values), jnp.asarray(bootstrap))
        vs_np, pg_np = _np_vtrace(log_rhos, discounts, rewards, values, bootstrap)
        np.testing.assert_allclose(np.asarray(out.vs), vs_np, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.pg_advantages), pg_np, rtol=1e-5, atol=1e-5)

    def test_associative_equals_sequential(self):
        rng = np.random.RandomState(4)
        T, B = 50, 3
        log_rhos = (rng.randn(T, B) * 0.3).astype(np.float32)
        rewards, values, bootstrap, dones = _random_batch(5, T, B)
        discounts = ((1.0 - dones) * 0.99).astype(np.float32)
        args = (jnp.asarray(log_rhos), jnp.asarray(discounts), jnp.asarray(rewards),
                jnp.asarray(values), jnp.asarray(bootstrap))
        o1 = vtrace_from_log_rhos(*args, use_associative_scan=False)
        o2 = vtrace_from_log_rhos(*args, use_associative_scan=True)
        np.testing.assert_allclose(np.asarray(o1.vs), np.asarray(o2.vs),
                                   rtol=2e-5, atol=2e-5)

    def test_on_policy_reduces_to_nstep_return(self):
        # log_rhos = 0 (on-policy): vs must equal discounted n-step returns
        T, B = 10, 2
        rewards, values, bootstrap, dones = _random_batch(6, T, B)
        dones[:] = 0.0
        discounts = np.full((T, B), 0.99, np.float32)
        out = vtrace_from_log_rhos(
            jnp.zeros((T, B)), jnp.asarray(discounts), jnp.asarray(rewards),
            jnp.asarray(values), jnp.asarray(bootstrap))
        g = discounted_returns(jnp.asarray(rewards), jnp.asarray(dones),
                               jnp.asarray(bootstrap), gamma=0.99)
        np.testing.assert_allclose(np.asarray(out.vs), np.asarray(g), rtol=1e-4, atol=1e-4)

    def test_from_logits_matches_log_rhos(self):
        rng = np.random.RandomState(7)
        T, B, A = 6, 3, 5
        bl = rng.randn(T, B, A).astype(np.float32)
        tl = rng.randn(T, B, A).astype(np.float32)
        actions = rng.randint(0, A, (T, B))
        rewards, values, bootstrap, dones = _random_batch(8, T, B)
        discounts = ((1.0 - dones) * 0.99).astype(np.float32)

        def logp(logits, acts):
            x = logits - logits.max(-1, keepdims=True)
            lse = np.log(np.exp(x).sum(-1)) + logits.max(-1)
            return np.take_along_axis(logits, acts[..., None], -1)[..., 0] - lse

        log_rhos = logp(tl, actions) - logp(bl, actions)
        o1 = vtrace_from_logits(
            jnp.asarray(bl), jnp.asarray(tl), jnp.asarray(actions),
            jnp.asarray(discounts), jnp.asarray(rewards), jnp.asarray(values),
            jnp.asarray(bootstrap))
        o2 = vtrace_from_log_rhos(
            jnp.asarray(log_rhos), jnp.asarray(discounts), jnp.asarray(rewards),
            jnp.asarray(values), jnp.asarray(bootstrap))
        np.testing.assert_allclose(np.asarray(o1.vs), np.asarray(o2.vs), rtol=1e-5, atol=1e-5)
