"""Pallas scan kernels vs. the lax.scan reference forms.

Runs the kernels in interpret mode on the CPU test mesh (they compile for
real on TPU); numerics must match the ``lax.scan`` implementations that
are themselves tested against hand-rolled numpy recurrences in
``tests/test_ops.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xingtian_tpu.ops.gae import gae
from xingtian_tpu.ops.pallas_scan import gae_pallas, vtrace_pallas
from xingtian_tpu.ops.vtrace import vtrace_from_log_rhos


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("T,B", [(7, 128), (50, 256), (128, 640)])
def test_gae_pallas_matches_scan(T, B):
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    rewards = _rand(k[0], T, B)
    values = _rand(k[1], T, B)
    boot = _rand(k[2], B)
    dones = (jax.random.uniform(k[3], (T, B)) < 0.1).astype(jnp.float32)

    adv_ref, tgt_ref = gae(rewards, values, boot, dones,
                           gamma=0.99, lam=0.95, backend="scan")
    adv_pl, tgt_pl = gae_pallas(rewards, values, boot, dones, 0.99, 0.95)
    np.testing.assert_allclose(adv_pl, adv_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(tgt_pl, tgt_ref, rtol=1e-5, atol=1e-5)


def test_gae_pallas_traced_hypers():
    """γ/λ ride through SMEM, so PBT-perturbed (traced) hypers work."""
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    T, B = 9, 128
    rewards = _rand(k[0], T, B)
    values = _rand(k[1], T, B)
    boot = _rand(k[2], B)
    dones = jnp.zeros((T, B))

    @jax.jit
    def run(gamma, lam):
        return gae_pallas(rewards, values, boot, dones, gamma, lam)[0]

    a1 = run(jnp.float32(0.99), jnp.float32(0.95))
    a2, _ = gae(rewards, values, boot, dones, 0.99, 0.95, backend="scan")
    np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,B", [(5, 128), (80, 256)])
def test_vtrace_pallas_matches_scan(T, B):
    k = jax.random.split(jax.random.PRNGKey(2), 5)
    log_rhos = 0.3 * _rand(k[0], T, B)
    rewards = _rand(k[1], T, B)
    values = _rand(k[2], T, B)
    boot = _rand(k[3], B)
    dones = (jax.random.uniform(k[4], (T, B)) < 0.08).astype(jnp.float32)
    discounts = 0.99 * (1.0 - dones)

    ref = vtrace_from_log_rhos(log_rhos, discounts, rewards, values, boot,
                               backend="scan")
    vs, pg = vtrace_pallas(log_rhos, discounts, rewards, values, boot)
    np.testing.assert_allclose(vs, ref.vs, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pg, ref.pg_advantages, rtol=1e-5, atol=1e-5)


def test_vtrace_pallas_clip_thresholds():
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    T, B = 12, 128
    log_rhos = 1.5 * _rand(k[0], T, B)  # big IS ratios → clipping active
    rewards = _rand(k[1], T, B)
    values = _rand(k[2], T, B)
    boot = _rand(k[3], B)
    discounts = jnp.full((T, B), 0.97)

    ref = vtrace_from_log_rhos(
        log_rhos, discounts, rewards, values, boot,
        clip_rho_threshold=2.0, clip_pg_rho_threshold=0.5, backend="scan")
    vs, pg = vtrace_pallas(log_rhos, discounts, rewards, values, boot,
                           clip_rho_threshold=2.0, clip_pg_rho_threshold=0.5)
    np.testing.assert_allclose(vs, ref.vs, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pg, ref.pg_advantages, rtol=1e-5, atol=1e-5)


def test_pallas_under_grad_is_constant():
    """Kernels sit on stop_gradient'ed subgraphs — grads must not flow."""
    k = jax.random.split(jax.random.PRNGKey(4), 3)
    T, B = 6, 128
    rewards = _rand(k[0], T, B)
    boot = _rand(k[1], B)
    dones = jnp.zeros((T, B))

    def loss(values):
        adv, tgt = gae_pallas(rewards, values, boot, dones, 0.99, 0.95)
        # advantages are constants; only the direct value path carries grad
        return jnp.sum(jnp.square(values - tgt))

    values = _rand(k[2], T, B)
    g = jax.grad(loss)(values)
    expected = 2.0 * (values - gae_pallas(
        rewards, values, boot, dones, 0.99, 0.95)[1])
    np.testing.assert_allclose(g, expected, rtol=1e-5, atol=1e-5)


def test_auto_backend_dispatch_off_tpu():
    """On CPU the auto path must take the lax.scan branch (not pallas)."""
    from xingtian_tpu.ops import pallas_scan
    assert not pallas_scan.pallas_enabled()
    T, B = 4, 130  # ragged B — pallas would reject; auto must still work
    rewards = jnp.ones((T, B))
    values = jnp.zeros((T, B))
    adv, tgt = gae(rewards, values, jnp.zeros(B), jnp.zeros((T, B)),
                   backend="auto")
    assert adv.shape == (T, B)
