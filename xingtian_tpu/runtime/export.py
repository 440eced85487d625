"""Policy export for serving — AOT-compiled StableHLO artifacts.

Parity with the reference's frozen-graph export (``xt/model/pb_format.py``:
TF1 ``convert_variables_to_constants`` → ``.pb`` for serving): here the
greedy policy function is serialized with ``jax.export`` (StableHLO +
weights baked in), giving a single portable artifact that any XLA runtime
(TPU serving, CPU, IFRT) can load and execute without Python model code.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def make_policy_fn(model, deterministic: bool = True) -> Callable:
    """Greedy/sampling action function closed over the model definition."""
    from xingtian_tpu.models.distributions import make_dist

    if getattr(model, "kind", None) == "q":
        def policy(params, obs):
            return jnp.argmax(model.apply(params, obs), axis=-1)
        return policy

    def policy(params, obs):
        pi_params, _ = model.apply(params, obs)
        dist = make_dist(model.action_type, pi_params, model.action_dim)
        return dist.mode()
    return policy


def make_behaviour_policy(model, params, seed: int = 0,
                          apply_fn: Optional[Callable] = None) -> Callable:
    """Host-callable behaviour policy for the async trajectory farm.

    Returns ``policy(obs) -> (action, {"logits": logits})`` operating on
    numpy — the sampled action plus the behaviour logits V-trace needs
    (the reference's explorers ship logits inside trajectories the same
    way, ``xt/agent/impala/atari_impala_opt.py:60-88``).  Refresh after a
    learner sync by calling again with new params + ``farm.set_policy``;
    pass the same jitted ``apply_fn`` across refreshes to avoid
    re-tracing on every weight sync.
    """
    import numpy as np

    apply = apply_fn if apply_fn is not None else jax.jit(model.apply)

    rng = np.random.RandomState(seed)

    def policy(obs):
        logits, _v = apply(params, jnp.asarray(obs))
        lg = np.asarray(logits, np.float32)
        z = lg - lg.max(axis=-1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=-1, keepdims=True)
        flat = p.reshape(-1, p.shape[-1])
        a = np.asarray(
            [rng.choice(flat.shape[-1], p=row) for row in flat], np.int32)
        return a.reshape(lg.shape[:-1]), {"logits": lg}

    return policy


def make_q_behaviour_policy(model, params, epsilon: float = 0.05,
                            seed: int = 0,
                            apply_fn: Optional[Callable] = None) -> Callable:
    """ε-greedy host behaviour policy over a Q model (DQN farm path).

    ``policy(obs) -> (action, {})`` — no extras: off-policy Q-learning
    needs no behaviour statistics (the reference's DQN explorers ship
    plain transitions, ``xt/agent/dqn/atari_dqn.py``).  Refresh with the
    learner's params + current ε after each sync.
    """
    import numpy as np

    apply = apply_fn if apply_fn is not None else jax.jit(model.apply)
    rng = np.random.RandomState(seed)

    def policy(obs):
        q = np.asarray(apply(params, jnp.asarray(obs)), np.float32)
        greedy = np.argmax(q, axis=-1)
        rand = rng.randint(0, q.shape[-1], size=greedy.shape)
        explore = rng.uniform(size=greedy.shape) < epsilon
        return np.where(explore, rand, greedy).astype(np.int32), {}

    return policy


def export_policy(model, params, path: str, batch_size: int = 1,
                  platforms: Optional[Tuple[str, ...]] = None) -> str:
    """Serialize the jitted greedy policy (weights baked in) to ``path``.

    The artifact is callable on any listed platform; defaults to the
    current backend.
    """
    policy = make_policy_fn(model)
    obs_sds = jax.ShapeDtypeStruct(
        (batch_size, *model.obs_shape), model.obs_dtype)

    def serve(obs):
        return policy(params, obs)

    exported = jax.export.export(
        jax.jit(serve),
        platforms=list(platforms) if platforms else None,
    )(obs_sds)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_policy(path: str) -> Callable:
    """Load an exported policy; returns ``fn(obs) -> actions``."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(blob)
    return lambda obs: exported.call(obs)
