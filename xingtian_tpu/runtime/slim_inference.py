"""Device-resident frame-stack cache for slim behaviour inference.

The host-farm's pixel path is bandwidth-bound on the host→device link
(measured ~50 MB/s through the axon tunnel — `docs/perf_notes_r4.md`):
shipping a full 84×84×4 stack costs 28 KB per env per step.  This engine
keeps the rolling frame stacks IN DEVICE HBM: workers ship only each
env's newest 7 KB frame plus a clear flag, and one jitted step
functionally updates the cached stacks, applies the behaviour net, and
returns actions — 4× less inference upload, and the host CPU never
touches the stack at all.

This is the device twin of the learner-side slim transport
(`AsyncTrajectoryFarm(slim_pixel_frames=True)` +
`Algorithm.restack_pixels`): same wire format, opposite endpoint.

Reference parity: the Predictor process serving remote inference
(``xt/framework/predictor.py:31-98``); the stack semantics mirror the
host preprocessor exactly (clear-on-boundary, ``envs/ale.py``
AtariPreprocessor) — proven equal in ``tests/test_slim_inference.py``.

Concurrency: the cache is a serialized read-modify-write, so the engine
is SINGLE-STREAM (`stateful = True` makes the farm clamp its predictor
to one serving stream).  Rows are global env indices; one scratch row
(index ``n_envs``) absorbs the predictor's batch padding.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SlimFrameInference:
    """Stateful behaviour policy over slim frame requests.

    Callable as ``engine(req) -> (action, extras)`` where ``req`` is the
    dict ``{"frame": [k, H, W, 1], "row": [k] int32, "clear": [k] bool}``
    (the farm's workers build it; the BatchedPredictor coalesces and
    pads it via :meth:`pad_request`).  Extras carry behaviour
    logits/logp/value for V-trace/PPO, exactly like
    :func:`~xingtian_tpu.runtime.export.make_behaviour_policy`.

    Refresh weights across learner syncs with :meth:`set_params` — the
    frame cache SURVIVES refreshes (it is env state, not policy state).
    """

    stateful = True   # farm: serialize serving onto one stream

    def __init__(self, model, params, n_envs: int, seed: int = 0,
                 epsilon: Optional[float] = None):
        H, W, S = model.obs_shape
        self.n_envs = int(n_envs)
        self._is_q = getattr(model, "kind", None) == "q"
        self.epsilon = epsilon if epsilon is not None else 0.0
        self._stack = jnp.zeros((self.n_envs + 1, H, W, S), model.obs_dtype)
        self._params = params
        self._rng = np.random.RandomState(seed)
        self._S = S

        def _step(params, stack, frames, rows, clear):
            cur = stack[rows]                                  # [k,H,W,S]
            shifted = jnp.concatenate([cur[..., 1:], frames], axis=-1)
            # boundary: cleared stack holds only the newest frame — the
            # host preprocessor's _clear_stack-then-push semantics
            fresh = shifted.at[..., : S - 1].set(0)
            new = jnp.where(clear[:, None, None, None], fresh, shifted)
            stack = stack.at[rows].set(new)
            return stack, model.apply(params, new)

        self._step = jax.jit(_step)

    # -- learner side ------------------------------------------------------
    def set_params(self, params) -> None:
        """Weight refresh (the ShareBuf fan-out analog); cache untouched."""
        self._params = params

    def reset_cache(self) -> None:
        self._stack = jnp.zeros_like(self._stack)

    # -- predictor protocol ------------------------------------------------
    def pad_request(self, k: int) -> Dict[str, np.ndarray]:
        """Padding rows route to the scratch slot and never corrupt a
        real env's cached stack."""
        H, W, _ = self._stack.shape[1:]
        return {
            "frame": np.zeros((k, H, W, 1), np.asarray(self._stack).dtype),
            "row": np.full((k,), self.n_envs, np.int32),
            "clear": np.ones((k,), bool),
        }

    def __call__(self, req: Dict[str, np.ndarray]):
        self._stack, out = self._step(
            self._params, self._stack,
            jnp.asarray(req["frame"]), jnp.asarray(req["row"], jnp.int32),
            jnp.asarray(req["clear"], bool))
        if self._is_q:
            q = np.asarray(out, np.float32)
            greedy = np.argmax(q, axis=-1)
            rand = self._rng.randint(0, q.shape[-1], size=greedy.shape)
            explore = self._rng.uniform(size=greedy.shape) < self.epsilon
            return np.where(explore, rand, greedy).astype(np.int32), {}
        logits, value = out
        lg = np.asarray(logits, np.float32)
        u = self._rng.uniform(low=1e-12, high=1.0, size=lg.shape)
        a = np.argmax(lg - np.log(-np.log(u)), axis=-1).astype(np.int32)
        z = lg - lg.max(axis=-1, keepdims=True)
        logz = np.log(np.exp(z).sum(axis=-1))
        logp = (np.take_along_axis(z, a[..., None], axis=-1)[..., 0]
                - logz).astype(np.float32)
        return a, {"logits": lg, "logp": logp,
                   "value": np.asarray(value, np.float32)}
