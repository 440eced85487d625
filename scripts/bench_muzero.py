"""Time MuZero train_step at the benchmark shape (VERDICT r2 #6).

Usage: XT_MUZERO_ENVS=32 python scripts/bench_muzero.py [config]
Prints steps/s for the pixel MuZero config at the chosen env count.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def main() -> None:
    from xingtian_tpu.config import load_config
    from xingtian_tpu.runtime.trainer import build_algorithm, build_env, build_model
    from xingtian_tpu.utils import safe_donate_argnums

    path = sys.argv[1] if len(sys.argv) > 1 else \
        "examples/muzero/muzero_breakout.yaml"
    cfg = load_config(path)[0]
    n_envs = int(os.environ.get("XT_MUZERO_ENVS", "0"))
    if n_envs:
        cfg.raw["env_para"]["env_num"] = n_envs
        cfg.env_num = n_envs
    sims = int(os.environ.get("XT_MUZERO_SIMS", "0"))
    if sims:
        cfg.alg_config["NUM_SIMULATIONS"] = sims
    env = build_env(cfg)
    model = build_model(cfg, env)
    alg = build_algorithm(cfg, model, env)
    state = alg.init_state(jax.random.PRNGKey(0))
    step = jax.jit(alg.train_step, donate_argnums=safe_donate_argnums())

    t0 = time.time()
    state, m = step(state)
    jax.block_until_ready(m)
    print(f"compile+first step: {time.time()-t0:.1f}s", flush=True)

    iters = int(os.environ.get("BENCH_ITERS", "8"))
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state)
    jax.block_until_ready(m)
    dt = time.time() - t0
    spu = alg.T * cfg.total_envs
    print(f"n_envs={cfg.total_envs} T={alg.T} sims="
          f"{alg.config['NUM_SIMULATIONS']}: "
          f"{iters * spu / dt:.0f} env-steps/s", flush=True)


if __name__ == "__main__":
    main()
