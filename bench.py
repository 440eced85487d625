"""Benchmark: PPO Breakout env-steps/s per chip (north-star metric).

Measures the steady-state throughput of the fused rollout+update PPO train
step on the pixel-mode pure-JAX Breakout (84×84×4 uint8 observations, the
reference's CNN input geometry from ``examples/breakout_ppo.yaml``), on
whatever single accelerator is available.

Baseline: XingTian PPO Breakout ≈ 2497 env-steps/s on 72-core Xeon + V100
(reference ``README.md:190-197``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_STEPS_PER_S = 2497.0  # XingTian PPO Breakout (README.md:190-197)


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    from xingtian_tpu.algos.ppo import PPO
    from xingtian_tpu.envs import VecEnv, make
    from xingtian_tpu.registry import Registers

    # TPU-tuned config: same model family / obs geometry / rollout length as
    # the reference benchmark, batch sized for one chip.
    n_envs = int(os.environ.get("BENCH_ENVS", "512"))
    T = int(os.environ.get("BENCH_T", "128"))
    env = VecEnv(make("BreakoutPixel"), n=n_envs)
    model = Registers.model.build(
        "PpoCnn", state_dim=[84, 84, 4], action_dim=4, input_dtype="uint8",
        model_config={"hidden_sizes": [256]})
    alg = PPO(model, env, dict(
        rollout_steps=T, BATCH_SIZE=(n_envs * T) // 4, NUM_SGD_ITER=4,
        LOSS_CLIPPING=0.1, ENTROPY_LOSS=0.003, LR=2.5e-4))

    from xingtian_tpu.utils import safe_donate_argnums

    state = alg.init_state(jax.random.PRNGKey(0))
    step = jax.jit(alg.train_step, donate_argnums=safe_donate_argnums())

    # warm-up / compile
    state, m = step(state)
    jax.block_until_ready(m)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state)
    jax.block_until_ready(m)
    dt = time.time() - t0

    steps_per_s = iters * T * n_envs / dt
    print(json.dumps({
        "metric": "env-steps/s per chip (PPO Breakout 84x84x4)",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
