"""Action distributions — functional parity with the reference's
``tf_dist.py`` (``xt/model/tf_dist.py:6-139``: DiagGaussianDist /
CategoricalDist / make_dist), re-expressed as stateless pytree-friendly
objects over raw parameter arrays so they trace cleanly under jit/vmap.

Semantics match the reference exactly where it matters for loss parity:

* ``Categorical.log_prob`` = −softmax-cross-entropy of the one-hot action;
* ``DiagGaussian`` uses a *state-independent* learned log-std appended to
  the mean (reference ``xt/model/ppo/ppo.py:75-79``), entropy/kl closed
  forms identical to ``tf_dist.py:108-121``.

Shapes: methods reduce over the event axis and return ``[...]`` (batch)
arrays — the reference keeps a trailing ``[...,1]`` axis; callers here take
care of any keepdims they need.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

Array = jax.Array
_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class Categorical:
    """Categorical over ``logits[..., n]``."""

    logits: Array

    def sample(self, key: jax.Array) -> Array:
        return jax.random.categorical(key, self.logits, axis=-1)

    def mode(self) -> Array:
        return jnp.argmax(self.logits, axis=-1)

    def log_prob(self, actions: Array) -> Array:
        logp_all = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(
            logp_all, actions[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    def entropy(self) -> Array:
        logp_all = jax.nn.log_softmax(self.logits, axis=-1)
        return -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)

    def kl(self, other: "Categorical") -> Array:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        logq = jax.nn.log_softmax(other.logits, axis=-1)
        return jnp.sum(jnp.exp(logp) * (logp - logq), axis=-1)


@dataclasses.dataclass(frozen=True)
class DiagGaussian:
    """Diagonal Gaussian with event shape ``mean.shape[-1:]``."""

    mean: Array
    log_std: Array

    @property
    def std(self) -> Array:
        return jnp.exp(self.log_std)

    def sample(self, key: jax.Array) -> Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> Array:
        return self.mean

    def log_prob(self, actions: Array) -> Array:
        dim = actions.shape[-1]
        z = (actions - self.mean) / self.std
        return -(
            _HALF_LOG_2PI * dim
            + 0.5 * jnp.sum(jnp.square(z), axis=-1)
            + jnp.sum(jnp.broadcast_to(self.log_std, actions.shape), axis=-1)
        )

    def entropy(self) -> Array:
        return jnp.sum(self.log_std + 0.5 * (math.log(2.0 * math.pi) + 1.0), axis=-1)

    def kl(self, other: "DiagGaussian") -> Array:
        return jnp.sum(
            (jnp.square(self.std) + jnp.square(self.mean - other.mean))
            / (2.0 * jnp.square(other.std))
            + other.log_std
            - self.log_std
            - 0.5,
            axis=-1,
        )


def make_dist(action_type: str, params: Array, action_dim: int):
    """``make_dist`` parity (``tf_dist.py:134-139``).

    For DiagGaussian, ``params`` is the concatenation [mean, log_std] along
    the last axis (the reference's ``dist_param`` layout,
    ``xt/model/ppo/ppo.py:79``).
    """
    if action_type == "Categorical":
        return Categorical(logits=params)
    if action_type == "DiagGaussian":
        mean, log_std = jnp.split(params, 2, axis=-1)
        return DiagGaussian(mean=mean, log_std=log_std)
    raise NotImplementedError(f"action type {action_type!r}")
