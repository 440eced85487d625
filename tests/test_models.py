"""Distribution + model zoo tests (parity targets: ``xt/model/tf_dist.py``
closed forms, ``model_utils.py`` default filter stacks)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from xingtian_tpu.models.distributions import Categorical, DiagGaussian, make_dist
from xingtian_tpu.models.torso import get_default_filters
from xingtian_tpu.registry import Registers


class TestCategorical:
    def test_log_prob_matches_softmax(self):
        logits = jnp.asarray([[1.0, 2.0, 0.5]])
        d = Categorical(logits)
        probs = np.exp(np.asarray(logits[0]))
        probs /= probs.sum()
        for a in range(3):
            lp = float(d.log_prob(jnp.asarray([a]))[0])
            np.testing.assert_allclose(lp, math.log(probs[a]), rtol=1e-5)

    def test_entropy_uniform(self):
        d = Categorical(jnp.zeros((1, 4)))
        np.testing.assert_allclose(float(d.entropy()[0]), math.log(4.0), rtol=1e-6)

    def test_kl_self_zero(self):
        logits = jnp.asarray([[0.3, -1.2, 2.0]])
        d = Categorical(logits)
        np.testing.assert_allclose(float(d.kl(d)[0]), 0.0, atol=1e-6)

    def test_sample_distribution(self):
        d = Categorical(jnp.asarray([0.0, 0.0]))
        keys = jax.random.split(jax.random.PRNGKey(0), 2000)
        samples = jax.vmap(d.sample)(keys)
        frac = float(jnp.mean(samples))
        assert 0.4 < frac < 0.6


class TestDiagGaussian:
    def test_log_prob_standard_normal(self):
        d = DiagGaussian(mean=jnp.zeros((1, 2)), log_std=jnp.zeros((1, 2)))
        lp = float(d.log_prob(jnp.zeros((1, 2)))[0])
        np.testing.assert_allclose(lp, -math.log(2 * math.pi), rtol=1e-6)

    def test_entropy_closed_form(self):
        # reference: sum(log_std + 0.5*(log(2π)+1)) (tf_dist.py:108-110)
        log_std = jnp.asarray([[0.5, -0.2]])
        d = DiagGaussian(mean=jnp.zeros((1, 2)), log_std=log_std)
        expected = float(jnp.sum(log_std + 0.5 * (math.log(2 * math.pi) + 1.0)))
        np.testing.assert_allclose(float(d.entropy()[0]), expected, rtol=1e-6)

    def test_kl_zero_and_positive(self):
        d1 = DiagGaussian(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
        d2 = DiagGaussian(jnp.ones((1, 3)), jnp.zeros((1, 3)))
        assert abs(float(d1.kl(d1)[0])) < 1e-6
        assert float(d1.kl(d2)[0]) > 0

    def test_make_dist_split(self):
        params = jnp.asarray([[1.0, 2.0, 0.1, 0.2]])
        d = make_dist("DiagGaussian", params, 2)
        np.testing.assert_allclose(np.asarray(d.mean), [[1.0, 2.0]])
        np.testing.assert_allclose(np.asarray(d.log_std), [[0.1, 0.2]])


class TestFilters:
    def test_default_stacks(self):
        assert get_default_filters([84, 84, 4])[0] == (32, (8, 8), (4, 4))
        assert get_default_filters([42, 42, 4])[0] == (32, (4, 4), (2, 2))
        assert len(get_default_filters([15, 15, 4])) == 3

    def test_fallback_inference_terminates(self):
        filters = get_default_filters([100, 60, 3])
        assert len(filters) >= 2


class TestModelZoo:
    def test_ppo_mlp_forward(self):
        m = Registers.model.build(
            "PpoMlp", state_dim=[4], action_dim=2,
            model_config={"hidden_sizes": [64, 64], "activation": "tanh"})
        params = m.init_params(jax.random.PRNGKey(0))
        pi, v = m.apply(params, jnp.zeros((7, 4)))
        assert pi.shape == (7, 2) and v.shape == (7,)

    def test_ppo_mlp_gaussian(self):
        m = Registers.model.build(
            "PpoMlp", state_dim=[3], action_dim=1, action_type="DiagGaussian")
        params = m.init_params(jax.random.PRNGKey(0))
        pi, v = m.apply(params, jnp.zeros((5, 3)))
        assert pi.shape == (5, 2)  # [mean, log_std]

    def test_ppo_cnn_forward_uint8(self):
        m = Registers.model.build(
            "PpoCnn", state_dim=[84, 84, 4], action_dim=4, input_dtype="uint8")
        params = m.init_params(jax.random.PRNGKey(0))
        obs = jnp.zeros((2, 84, 84, 4), jnp.uint8)
        pi, v = m.apply(params, obs)
        assert pi.shape == (2, 4) and v.shape == (2,)
        assert pi.dtype == jnp.float32

    def test_dqn_models(self):
        m = Registers.model.build("DqnMlp", state_dim=[4], action_dim=2)
        params = m.init_params(jax.random.PRNGKey(0))
        q = m.apply(params, jnp.zeros((3, 4)))
        assert q.shape == (3, 2)

    def test_registry_names(self):
        for name in ["PpoMlp", "PpoCnn", "DqnMlp", "DqnCnn", "DqnCnnPong",
                     "ImpalaMlp", "ImpalaCnn", "ImpalaCnnOpt"]:
            assert name in Registers.model
