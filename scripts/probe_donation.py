"""Probe axon-tunnel buffer donation at DQN-ring scale.

Round-2 finding: donating the full CNN train state fails on the axon
tunnel (INVALID_ARGUMENT), so ``safe_donate_argnums`` disables donation
there and big states ping-pong (2× HBM).  This probes the cases that
matter for the 100k pixel replay ring:

1. donate one big uint8 array through a scatter update;
2. donate the full DQNState pytree through the real train step (tiny net).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def probe_big_array() -> None:
    buf = jnp.zeros((100_000, 84, 84, 4), jnp.uint8)   # 2.8 GB

    @jax.jit
    def bump(b, i):
        return b.at[i].add(1)

    bump_d = jax.jit(lambda b, i: b.at[i].add(1), donate_argnums=(0,))
    try:
        for i in range(3):
            buf = bump_d(buf, jnp.asarray(i))
        jax.block_until_ready(buf)
        print("donate(big uint8 ring): OK", flush=True)
    except Exception as e:  # noqa: BLE001 — probe reports, never raises
        print(f"donate(big uint8 ring): FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


def probe_full_state() -> None:
    from xingtian_tpu.algos.dqn import DQN
    from xingtian_tpu.envs import VecEnv, make
    from xingtian_tpu.registry import Registers

    env = VecEnv(make("BreakoutPixel"), n=8)
    model = Registers.model.build(
        "DqnCnn", state_dim=[84, 84, 4], action_dim=4, input_dtype="uint8")
    alg = DQN(model, env, dict(
        rollout_steps=4, BUFFER_SIZE=8192, BATCH_SIZE=8, UPDATE_FREQ=32,
        learning_starts=0))
    state = alg.init_state(jax.random.PRNGKey(0))
    step = jax.jit(alg.train_step, donate_argnums=(0,))
    try:
        state, m = step(state)
        state, m = step(state)
        jax.block_until_ready(m)
        print("donate(full DQNState, small ring): OK", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"donate(full DQNState): FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    probe_big_array()
    probe_full_state()
