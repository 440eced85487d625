"""ctypes bridge to the C++ host env farm (``native/envfarm.cpp``).

Two surfaces over the same native pool:

* :class:`NativeFarmEnv` — the jittable ``io_callback`` vector env
  (drop-in for :class:`~xingtian_tpu.envs.host.HostVecEnv`);
* :class:`NativeVecHostEnv` — a *batched* host-protocol env for the
  async trajectory farm: one ctypes call steps all ``n`` C++ envs on a
  native pthread pool.  ctypes releases the GIL for the duration of the
  foreign call, so env stepping (dynamics + the full Atari preprocessing,
  all in C++) runs on every core *underneath* the Python inference
  thread — the GIL-free equivalent of the reference's explorer processes
  with CPU pinning (``xt/framework/broker.py:478-505``), and the escape
  from the measured 3.6k steps/s Python-thread ceiling
  (docs/perf_notes_r4.md §2).

The shared library is built on first use with the repo's Makefile
(g++ -O3); rebuilds are skipped when the .so is newer than the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from xingtian_tpu.registry import Registers
from xingtian_tpu.envs.core import Discrete, EnvSpec, JaxEnv, TimeStep

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libenvfarm.so")
_BUILD_LOCK = threading.Lock()


def build_native(force: bool = False) -> str:
    """Compile the farm library if missing/stale; returns the .so path."""
    src = os.path.join(_NATIVE_DIR, "envfarm.cpp")
    with _BUILD_LOCK:
        if (not force and os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
            return _LIB_PATH
        subprocess.run(["make", "-s", "libenvfarm.so"], cwd=_NATIVE_DIR,
                       check=True)
    return _LIB_PATH


_LIB: Optional[ctypes.CDLL] = None


def _load_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    lib = ctypes.CDLL(build_native())
    lib.farm_create2.restype = ctypes.c_void_p
    lib.farm_create2.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int]
    lib.farm_obs_rank.restype = ctypes.c_int
    lib.farm_obs_rank.argtypes = [ctypes.c_void_p]
    lib.farm_obs_dims.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.farm_obs_dtype.restype = ctypes.c_int
    lib.farm_obs_dtype.argtypes = [ctypes.c_void_p]
    lib.farm_n_actions.restype = ctypes.c_int
    lib.farm_n_actions.argtypes = [ctypes.c_void_p]
    lib.farm_reset_seeded.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.farm_step.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8)]
    lib.farm_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class _NativePool:
    """Owns one C++ Farm handle + persistent zero-copy batch buffers."""

    def __init__(self, env_name: str, n: int, n_threads: int, seed: int,
                 max_noops: int = 30):
        self._lib = _load_lib()
        n_threads = n_threads or min(8, os.cpu_count() or 1)
        self._farm = self._lib.farm_create2(
            env_name.encode(), n, n_threads, seed, max_noops)
        if not self._farm:
            raise ValueError(f"native farm has no env named {env_name!r}")
        self.n = n
        rank = self._lib.farm_obs_rank(self._farm)
        dims = (ctypes.c_int32 * 3)()
        self._lib.farm_obs_dims(self._farm, dims)
        self.obs_shape: Tuple[int, ...] = tuple(int(dims[i])
                                                for i in range(rank))
        self.obs_dtype = np.uint8 if self._lib.farm_obs_dtype(self._farm) \
            else np.float32
        self.n_actions = int(self._lib.farm_n_actions(self._farm))
        self.obs = np.zeros((n, *self.obs_shape), self.obs_dtype)
        self.rew = np.zeros((n,), np.float32)
        self.done = np.zeros((n,), np.uint8)

    def reset(self, seed_base: int) -> np.ndarray:
        self._lib.farm_reset_seeded(
            self._farm, seed_base, self.obs.ctypes.data_as(ctypes.c_void_p))
        return self.obs

    def step(self, actions: np.ndarray) -> None:
        acts = np.ascontiguousarray(actions, np.int32)
        # the ctypes call releases the GIL: the C++ pool steps all n envs
        # across cores while Python threads (inference) keep running
        self._lib.farm_step(
            self._farm,
            acts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.obs.ctypes.data_as(ctypes.c_void_p),
            self.rew.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))

    def close(self) -> None:
        farm, self._farm = self._farm, None
        if farm:
            self._lib.farm_destroy(farm)

    def __del__(self):
        try:
            self.close()
        except Exception:   # noqa: BLE001 — interpreter teardown
            pass


# ---------------------------------------------------------------------------
# Batched host-protocol surface (async farm / FarmTrainer)
# ---------------------------------------------------------------------------

class NativeVecHostEnv:
    """``n`` C++ envs stepped by one GIL-free native call per farm tick.

    Batched variant of :class:`~xingtian_tpu.envs.host.HostEnvProtocol`:
    ``reset_batch(seed_base) -> obs[n, ...]`` and
    ``step_batch(actions[n]) -> (obs, reward, done)``, each one ctypes
    call.  Returned arrays are views of persistent internal buffers —
    valid until the next call (callers copy into their rollout buffers
    immediately, which the async farm worker does).
    """

    BATCHED = True
    FRAME_STACKED = False

    def __init__(self, env_name: str, n: int = 64, n_threads: int = 0,
                 seed: int = 0, max_noops: int = 30):
        self._pool = _NativePool(env_name, n, n_threads, seed, max_noops)
        self.n = n
        self.ACTION_DIM = self._pool.n_actions
        self.obs_shape = self._pool.obs_shape
        self.obs_dtype = self._pool.obs_dtype

    def reset_batch(self, seed_base: int) -> np.ndarray:
        return self._pool.reset(seed_base)

    def step_batch(self, actions) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        self._pool.step(np.asarray(actions))
        return self._pool.obs, self._pool.rew, self._pool.done.astype(bool)

    def close(self) -> None:
        self._pool.close()


@Registers.host_env.register(name="NativeFakeALE")
class NativeFakeALE(NativeVecHostEnv):
    """C++ stub-ALE farm: FakeALE dynamics + the full Atari preprocessing
    (grayscale/resize/stack/noop/fire/life-loss) natively, exact-parity
    with the Python ``FakeALE`` adapter (tests/test_native.py)."""

    BATCHED = True
    FRAME_STACKED = True     # 84x84x4 uint8 stacks → slim transport works
    ACTION_DIM = 4

    def __init__(self, n: int = 64, n_threads: int = 0, seed: int = 0,
                 max_noops: int = 30, **_kw):
        super().__init__("AtariStub", n=n, n_threads=n_threads, seed=seed,
                         max_noops=max_noops)


@Registers.host_env.register(name="NativeCartPoleVec")
class NativeCartPoleVec(NativeVecHostEnv):
    """C++ CartPole farm behind the batched host protocol."""

    BATCHED = True
    ACTION_DIM = 2

    def __init__(self, n: int = 64, n_threads: int = 0, seed: int = 0,
                 **_kw):
        super().__init__("CartPole", n=n, n_threads=n_threads, seed=seed)


# ---------------------------------------------------------------------------
# Jittable io_callback surface (single-program algorithms)
# ---------------------------------------------------------------------------

@struct.dataclass
class NativeFarmState:
    tick: jax.Array


class NativeFarmEnv(JaxEnv):
    """N C++ env instances stepped by a native thread pool, zero-copy."""

    def __init__(self, env_name: str = "CartPole", n: int = 64,
                 n_threads: int = 0, seed: int = 0):
        self._pool = _NativePool(env_name, n, n_threads, seed)
        self.n = n
        dtype = jnp.uint8 if self._pool.obs_dtype == np.uint8 else jnp.float32
        self.spec = EnvSpec(
            name=f"Native{env_name}", obs_shape=self._pool.obs_shape,
            obs_dtype=dtype, action_spec=Discrete(self._pool.n_actions),
            max_steps=200)

    # -- host-side ops -----------------------------------------------------
    def _host_reset(self, tick):
        del tick
        return self._pool.reset(0).copy()

    def _host_step(self, tick, actions):
        del tick
        self._pool.step(actions)
        return (self._pool.obs.copy(), self._pool.rew.copy(),
                self._pool.done.astype(bool))

    # -- jittable surface ---------------------------------------------------
    def _reset(self, key):
        del key
        tick = jnp.zeros((), jnp.int32)
        obs = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self.n, *self.spec.obs_shape),
                                 self.spec.obs_dtype),
            tick, ordered=True)
        return NativeFarmState(tick=tick + 1), obs

    def _step(self, state: NativeFarmState, action):
        out_sds = (
            jax.ShapeDtypeStruct((self.n, *self.spec.obs_shape),
                                 self.spec.obs_dtype),
            jax.ShapeDtypeStruct((self.n,), jnp.float32),
            jax.ShapeDtypeStruct((self.n,), bool),
        )
        obs, rew, done = jax.experimental.io_callback(
            self._host_step, out_sds, state.tick, action, ordered=True)
        return NativeFarmState(tick=state.tick + 1), TimeStep(
            obs=obs, reward=rew, done=done, info={})


@Registers.env.register(name="NativeCartPole")
def native_cartpole(env_num: int = 64, n_threads: int = 0, seed: int = 0, **_kw):
    return NativeFarmEnv("CartPole", n=env_num, n_threads=n_threads, seed=seed)
