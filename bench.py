"""Benchmark: PPO Breakout env-steps/s per chip (north-star metric).

Measures steady-state throughput of the fused rollout+update PPO train
step on pixel-mode pure-JAX Breakout (84×84×4 uint8 observations — the
reference's CNN input geometry, ``examples/breakout_ppo.yaml``).

Baseline: XingTian PPO Breakout ≈ 2497 env-steps/s on 72-core Xeon + V100
(reference ``README.md:190-197``).

Robustness: the development TPU is reached via the experimental axon
tunnel whose compile service latency varies from seconds to >30 min for
identical programs.  The top-level run therefore tries batch sizes
largest-first, each in a subprocess with its own timeout, and reports the
first configuration that completes (larger B = higher steps/s; measured
spread 512→64 is 168k→122k, all ≫ baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_STEPS_PER_S = 2497.0  # XingTian PPO Breakout (README.md:190-197)

# (n_envs, rollout_T, subprocess timeout seconds) — measured on v5e:
# 1024→179k, 512→174k, 256→173k steps/s (largest first)
CANDIDATES = [(1024, 128, 1500), (512, 128, 1200), (256, 128, 900),
              (128, 128, 700), (64, 128, 600)]


def run_one(n_envs: int, T: int) -> None:
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    from xingtian_tpu.algos.ppo import PPO
    from xingtian_tpu.envs import VecEnv, make
    from xingtian_tpu.registry import Registers
    from xingtian_tpu.utils import safe_donate_argnums

    env = VecEnv(make("BreakoutPixel"), n=n_envs)
    model = Registers.model.build(
        "PpoCnn", state_dim=[84, 84, 4], action_dim=4, input_dtype="uint8",
        model_config={"hidden_sizes": [256]})
    alg = PPO(model, env, dict(
        rollout_steps=T, BATCH_SIZE=(n_envs * T) // 4, NUM_SGD_ITER=4,
        LOSS_CLIPPING=0.1, ENTROPY_LOSS=0.003, LR=2.5e-4))

    state = alg.init_state(jax.random.PRNGKey(0))
    step = jax.jit(alg.train_step, donate_argnums=safe_donate_argnums())

    state, m = step(state)
    jax.block_until_ready(m)  # compile + warm-up

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


def main() -> int:
    if os.environ.get("BENCH_ENVS"):
        run_one(int(os.environ["BENCH_ENVS"]),
                int(os.environ.get("BENCH_T", "128")))
        return 0

    for n_envs, T, timeout_s in CANDIDATES:
        env = dict(os.environ, BENCH_ENVS=str(n_envs), BENCH_T=str(T))
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=timeout_s, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            print(f"[bench] B={n_envs} timed out after {timeout_s}s; "
                  f"falling back", file=sys.stderr)
            continue
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return 0
        print(f"[bench] B={n_envs} failed: {out.stderr[-300:]}", file=sys.stderr)
    print(json.dumps({
        "metric": "env-steps/s per chip (PPO Breakout 84x84x4)",
        "value": 0.0, "unit": "env-steps/s", "vs_baseline": 0.0}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
