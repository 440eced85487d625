"""ctypes bridge to the C++ host env farm (``native/envfarm.cpp``).

Exposes the native farm through the same jittable surface as
:class:`~xingtian_tpu.envs.host.HostVecEnv` — ``io_callback`` with batched
step calls — so a C++ simulator pool drops into any algorithm unchanged.
The shared library is built on first use with the repo's Makefile
(g++ -O3); rebuilds are skipped when the .so is newer than the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

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


def build_native(force: bool = False) -> str:
    """Compile the farm library if missing/stale; returns the .so path."""
    src = os.path.join(_NATIVE_DIR, "envfarm.cpp")
    if (not force and os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
        return _LIB_PATH
    subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)
    return _LIB_PATH


def _load_lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_native())
    lib.farm_create.restype = ctypes.c_void_p
    lib.farm_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
    lib.farm_obs_dim.restype = ctypes.c_int
    lib.farm_obs_dim.argtypes = [ctypes.c_void_p]
    lib.farm_reset.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.farm_step.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8)]
    lib.farm_destroy.argtypes = [ctypes.c_void_p]
    return lib


@struct.dataclass
class NativeFarmState:
    tick: jax.Array


class NativeFarmEnv(JaxEnv):
    """N C++ env instances stepped by a native thread pool, zero-copy."""

    def __init__(self, env_name: str = "CartPole", n: int = 64,
                 n_threads: int = 0, seed: int = 0):
        self._lib = _load_lib()
        n_threads = n_threads or min(8, os.cpu_count() or 1)
        self._farm = self._lib.farm_create(
            env_name.encode(), n, n_threads, seed)
        if not self._farm:
            raise ValueError(f"native farm has no env named {env_name!r}")
        self.n = n
        obs_dim = self._lib.farm_obs_dim(self._farm)
        self.spec = EnvSpec(
            name=f"Native{env_name}", obs_shape=(obs_dim,),
            obs_dtype=jnp.float32, action_spec=Discrete(2), max_steps=200)
        # persistent pinned buffers (zero copies per step on the host side)
        self._obs = np.zeros((n, obs_dim), np.float32)
        self._rew = np.zeros((n,), np.float32)
        self._done = np.zeros((n,), np.uint8)

    def __del__(self):
        farm = getattr(self, "_farm", None)
        if farm:
            self._lib.farm_destroy(farm)
            self._farm = None

    # -- host-side ops -----------------------------------------------------
    def _host_reset(self, tick):
        del tick
        self._lib.farm_reset(
            self._farm, self._obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return self._obs.copy()

    def _host_step(self, tick, actions):
        del tick
        acts = np.ascontiguousarray(actions, np.int32)
        self._lib.farm_step(
            self._farm,
            acts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._rew.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return self._obs.copy(), self._rew.copy(), self._done.astype(bool)

    # -- jittable surface ---------------------------------------------------
    def _reset(self, key):
        del key
        tick = jnp.zeros((), jnp.int32)
        obs = jax.experimental.io_callback(
            self._host_reset,
            jax.ShapeDtypeStruct((self.n, *self.spec.obs_shape), jnp.float32),
            tick, ordered=True)
        return NativeFarmState(tick=tick + 1), obs

    def _step(self, state: NativeFarmState, action):
        out_sds = (
            jax.ShapeDtypeStruct((self.n, *self.spec.obs_shape), jnp.float32),
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
