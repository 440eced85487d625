"""Host-RAM replay store — ctypes bridge to ``native/hostreplay.cpp``.

The on-device ring (:mod:`xingtian_tpu.ops.replay`) is the fast path;
this store is its host-RAM twin for buffers that exceed HBM (the
reference keeps Atari replay in learner-process host RAM as uint8,
``xt/agent/dqn/atari_dqn.py:39-44``, and shares bulk data through the
Arrow plasma C++ server, ``zeus/common/ipc/share_by_plasma.py`` — this
C++ ring is the plasma-equivalent native component).  Each observation
is stored once; ``(obs, next_obs)`` pairs are reconstructed at sample
time with multi-threaded row gather.

Two surfaces:

* numpy API (``add`` / ``sample``) for host-side training loops;
* jittable API (:meth:`HostReplay.sample_callback` /
  :meth:`add_callback`) via ``io_callback`` so a device train step can
  source minibatches from host RAM — one ordered host call per step,
  batched, exactly the double-buffered boundary SURVEY §7.5 prescribes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostreplay.so")


def build_native(force: bool = False) -> str:
    src = os.path.join(_NATIVE_DIR, "hostreplay.cpp")
    if (not force and os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
        return _LIB_PATH
    subprocess.run(["make", "-s", "libhostreplay.so"],
                   cwd=_NATIVE_DIR, check=True)
    return _LIB_PATH


_lib = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_native())
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.replay_create.restype = ctypes.c_void_p
    lib.replay_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    lib.replay_destroy.argtypes = [ctypes.c_void_p]
    lib.replay_size.restype = ctypes.c_int64
    lib.replay_size.argtypes = [ctypes.c_void_p]
    lib.replay_total_added.restype = ctypes.c_int64
    lib.replay_total_added.argtypes = [ctypes.c_void_p]
    lib.replay_add.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, u8p, u8p, i32p, f32p, u8p]
    lib.replay_sample.restype = ctypes.c_int
    lib.replay_sample.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
        u8p, u8p, i32p, f32p, f32p]
    _lib = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class HostReplay:
    """Uniform transition replay in host RAM (uint8 observations).

    ``explicit_next=False`` (default) stores each observation once and
    reconstructs ``next_obs`` from the successor slot — valid ONLY when
    transitions arrive as one time-contiguous stream (e.g. a single env,
    or one store per farm worker).  ``explicit_next=True`` stores
    ``next_obs`` per slot (2× RAM) and accepts arbitrary interleaved
    batches — the mode the DQN ``[T, B]`` rollout feed needs.
    """

    def __init__(self, capacity: int, obs_shape: Sequence[int],
                 explicit_next: bool = False):
        self._lib = _load_lib()
        self.capacity = int(capacity)
        self.obs_shape = tuple(int(d) for d in obs_shape)
        self.obs_bytes = int(np.prod(self.obs_shape))
        self.explicit_next = bool(explicit_next)
        self._h = self._lib.replay_create(
            self.capacity, self.obs_bytes, int(self.explicit_next))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.replay_destroy(self._h)
            self._h = None

    # -- numpy surface ------------------------------------------------------
    @property
    def size(self) -> int:
        return int(self._lib.replay_size(self._h))

    @property
    def total_added(self) -> int:
        return int(self._lib.replay_total_added(self._h))

    def add(self, obs: np.ndarray, action: np.ndarray,
            reward: np.ndarray, done: np.ndarray,
            next_obs: np.ndarray = None) -> None:
        obs = np.ascontiguousarray(obs, np.uint8)
        n = obs.shape[0]
        action = np.ascontiguousarray(action, np.int32).reshape(n)
        reward = np.ascontiguousarray(reward, np.float32).reshape(n)
        done = np.ascontiguousarray(done).astype(np.uint8).reshape(n)
        assert obs.reshape(n, -1).shape[1] == self.obs_bytes
        if self.explicit_next:
            if next_obs is None:
                raise ValueError("explicit_next store requires next_obs")
            next_obs = np.ascontiguousarray(next_obs, np.uint8)
            nptr = _ptr(next_obs, ctypes.c_uint8)
        else:
            nptr = None
        self._lib.replay_add(
            self._h, n, _ptr(obs, ctypes.c_uint8), nptr,
            _ptr(action, ctypes.c_int32), _ptr(reward, ctypes.c_float),
            _ptr(done, ctypes.c_uint8))

    def sample(self, batch: int, seed: int) -> Dict[str, np.ndarray]:
        obs = np.empty((batch, *self.obs_shape), np.uint8)
        next_obs = np.empty((batch, *self.obs_shape), np.uint8)
        action = np.empty((batch,), np.int32)
        reward = np.empty((batch,), np.float32)
        done = np.empty((batch,), np.float32)
        rc = self._lib.replay_sample(
            self._h, batch, ctypes.c_uint64(seed & (2 ** 64 - 1)),
            _ptr(obs, ctypes.c_uint8), _ptr(next_obs, ctypes.c_uint8),
            _ptr(action, ctypes.c_int32), _ptr(reward, ctypes.c_float),
            _ptr(done, ctypes.c_float))
        if rc != 0:
            raise RuntimeError("host replay: fewer than 2 transitions stored")
        return {"obs": obs, "next_obs": next_obs, "action": action,
                "reward": reward, "done": done}

    # -- jittable surface ----------------------------------------------------
    def add_callback(self, obs, action, reward, done, next_obs=None):
        """Device → host append inside a jitted step (ordered)."""
        import jax
        import jax.numpy as jnp

        if self.explicit_next:
            def _host(obs, action, reward, done, next_obs):
                self.add(np.asarray(obs), np.asarray(action),
                         np.asarray(reward), np.asarray(done),
                         next_obs=np.asarray(next_obs))
                return np.int32(self.size)

            return jax.experimental.io_callback(
                _host, jax.ShapeDtypeStruct((), jnp.int32),
                obs, action, reward, done, next_obs, ordered=True)

        def _host(obs, action, reward, done):
            self.add(np.asarray(obs), np.asarray(action),
                     np.asarray(reward), np.asarray(done))
            return np.int32(self.size)

        return jax.experimental.io_callback(
            _host, jax.ShapeDtypeStruct((), jnp.int32),
            obs, action, reward, done, ordered=True)

    def sample_callback(self, batch: int, seed):
        """Host → device minibatch inside a jitted step.

        ``seed`` is a traced int32/uint32 scalar (e.g. derived from the
        train-state PRNG) so resampling differs per step under jit.
        """
        import jax
        import jax.numpy as jnp

        def _host(seed):
            return tuple(self.sample(batch, int(np.uint32(seed)))[k]
                         for k in ("obs", "next_obs", "action",
                                   "reward", "done"))

        sds = (
            jax.ShapeDtypeStruct((batch, *self.obs_shape), jnp.uint8),
            jax.ShapeDtypeStruct((batch, *self.obs_shape), jnp.uint8),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
            jax.ShapeDtypeStruct((batch,), jnp.float32),
            jax.ShapeDtypeStruct((batch,), jnp.float32),
        )
        obs, next_obs, action, reward, done = jax.experimental.io_callback(
            _host, sds, seed, ordered=True)
        return {"obs": obs, "next_obs": next_obs, "action": action,
                "reward": reward, "done": done}
