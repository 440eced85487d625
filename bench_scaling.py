"""Scaling-curve harness: PPO env-steps/s vs device count (weak scaling).

BASELINE.md asks for "env-steps/s at 1 chip, 1 host, N hosts".  This
harness measures the dp-sharded fused PPO step at each device count
available to the process:

* on a real multi-chip TPU slice it produces the actual scaling curve;
* on a single-chip dev box or CPU (``--virtual 8``) it validates the
  sharded program end-to-end and reports *relative* numbers (virtual
  CPU "devices" share one socket, so the curve is structural, not
  speed-of-light).

Weak scaling: envs-per-device is held constant, so ideal scaling is a
flat ms/step line and steps/s ∝ devices.

Prints one JSON line per device count:
  {"devices": N, "n_envs": E, "steps_per_s": S, "ms_per_step": M}
"""

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force CPU with this many virtual devices")
    ap.add_argument("--envs_per_device", type=int, default=64)
    ap.add_argument("--rollout", type=int, default=64)
    ap.add_argument("--pixel", action="store_true",
                    help="84x84x4 pixel obs (CNN) instead of grid obs")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.virtual}").strip()
    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

    from xingtian_tpu.algos.ppo import PPO
    from xingtian_tpu.envs import VecEnv, make
    from xingtian_tpu.parallel import make_dp_step, make_mesh
    from xingtian_tpu.registry import Registers

    total = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= total]
    T = args.rollout

    for n_dev in counts:
        n_envs = args.envs_per_device * n_dev
        env = VecEnv(make("BreakoutPixel" if args.pixel else "Breakout"),
                     n=n_envs)
        if args.pixel:
            model = Registers.model.build(
                "PpoCnn", state_dim=[84, 84, 4], action_dim=4,
                input_dtype="uint8", model_config={"hidden_sizes": [256]})
        else:
            model = Registers.model.build(
                "PpoMlp", state_dim=list(env.spec.obs_shape), action_dim=4,
                model_config={"hidden_sizes": [128, 128]})
        alg = PPO(model, env, dict(
            rollout_steps=T, BATCH_SIZE=(n_envs * T) // 4, NUM_SGD_ITER=2))
        state = alg.init_state(jax.random.PRNGKey(0))
        mesh = make_mesh(n_devices=n_dev)
        placed, step = make_dp_step(alg, mesh, state, donate=False)

        placed, m = step(placed)
        jax.block_until_ready(m)                       # compile + warm-up
        t0 = time.time()
        for _ in range(args.iters):
            placed, m = step(placed)
        jax.block_until_ready(m)
        dt = (time.time() - t0) / args.iters
        print(json.dumps({
            "devices": n_dev,
            "n_envs": n_envs,
            "steps_per_s": round(n_envs * T / dt, 1),
            "ms_per_step": round(dt * 1000, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
