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


def _policy_device(backend: Optional[str]):
    """Resolve the inference device for a host behaviour policy.

    ``backend="cpu"`` pins the apply to the host CPU XLA backend — the
    reference's explorers do exactly this (CUDA disabled in-process,
    ``xt/framework/explorer.py:60``): for small policy nets the device
    round trip (65 ms through the axon tunnel on this box) dwarfs the
    matmul, so running the apply on the host deletes the RTT from the
    farm's hot loop entirely.  ``None`` keeps the default device.
    """
    if backend is None:
        return None
    return jax.local_devices(backend=backend)[0]


def make_behaviour_policy(model, params, seed: int = 0,
                          apply_fn: Optional[Callable] = None,
                          backend: Optional[str] = None) -> Callable:
    """Host-callable behaviour policy for the async trajectory farm.

    Returns ``policy(obs) -> (action, extras)`` operating on numpy, with
    ``extras = {"logits", "logp", "value"}``: the behaviour logits V-trace
    needs (the reference's explorers ship logits inside trajectories the
    same way, ``xt/agent/impala/atari_impala_opt.py:60-88``) plus the
    sampled action's log-prob and the value estimate the PPO farm path
    needs for GAE (≈ agent-side trajectory fields,
    ``xt/agent/ppo/ppo.py:77-107``).  Refresh after a learner sync by
    calling again with new params + ``farm.set_policy``; pass the same
    jitted ``apply_fn`` across refreshes to avoid re-tracing on every
    weight sync.
    """
    import numpy as np

    apply = apply_fn if apply_fn is not None else jax.jit(model.apply)
    dev = _policy_device(backend)
    if dev is not None:
        params = jax.device_put(params, dev)

    rng = np.random.RandomState(seed)

    def policy(obs):
        x = jnp.asarray(obs) if dev is None else jax.device_put(obs, dev)
        logits, value = apply(params, x)
        lg = np.asarray(logits, np.float32)
        # vectorized categorical sampling via Gumbel-max — one numpy pass
        # over the whole batch (a per-row ``rng.choice`` loop is O(B)
        # Python work inside the farm's hot inference tick)
        u = rng.uniform(low=1e-12, high=1.0, size=lg.shape)
        a = np.argmax(lg - np.log(-np.log(u)), axis=-1).astype(np.int32)
        # log-prob of the sampled action under the behaviour policy
        z = lg - lg.max(axis=-1, keepdims=True)
        logz = np.log(np.exp(z).sum(axis=-1))
        logp = (np.take_along_axis(z, a[..., None], axis=-1)[..., 0]
                - logz).astype(np.float32)
        return a, {"logits": lg, "logp": logp,
                   "value": np.asarray(value, np.float32)}

    return policy


def make_q_behaviour_policy(model, params, epsilon: float = 0.05,
                            seed: int = 0,
                            apply_fn: Optional[Callable] = None,
                            backend: Optional[str] = None) -> Callable:
    """ε-greedy host behaviour policy over a Q model (DQN farm path).

    ``policy(obs) -> (action, {})`` — no extras: off-policy Q-learning
    needs no behaviour statistics (the reference's DQN explorers ship
    plain transitions, ``xt/agent/dqn/atari_dqn.py``).  Refresh with the
    learner's params + current ε after each sync.
    """
    import numpy as np

    apply = apply_fn if apply_fn is not None else jax.jit(model.apply)
    dev = _policy_device(backend)
    if dev is not None:
        params = jax.device_put(params, dev)
    rng = np.random.RandomState(seed)

    def policy(obs):
        x = jnp.asarray(obs) if dev is None else jax.device_put(obs, dev)
        q = np.asarray(apply(params, x), np.float32)
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
