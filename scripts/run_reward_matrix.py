"""Run the 10M-step reward matrix on the real chip (VERDICT r1 item 1).

Runs every algo x game example config to ``complete_step`` sequentially
(the axon TPU tunnel is single-client), each in its own subprocess under a
timeout, and archives the learning curves under
``artifacts/reward_matrix/<id>+<ts>Ttrain/benchmark/records.csv``.

A global wall-clock budget bounds the whole matrix so the chip is free
again well before the round's bench run; a run that hits its slice is
killed but its records.csv up to that point is kept and summarised
(partial curves are still evidence).

Usage::

    python scripts/run_reward_matrix.py [--budget-s 19800] [--only id ...]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "reward_matrix")

# (example yaml relpath, benchmark id, per-run cap seconds[, extra argv])
# Round-4 order (VERDICT r3): the north-star proofs first — PPO on REAL
# gymnasium through the farm, real-sim convergence (LunarLander solve),
# the retuned breakout PPO, one real PBT curve, MuZero at 64 envs —
# then the full PPO/IMPALA re-run at r3 env depth, then DQN leftovers
# and a qbert_dqn seed repeat (r3 instability analysis).
RUNS = [
    ("examples/hostfarm_gym_cartpole_ppo.yaml",
     "hostfarm_gym_cartpole_ppo", 1500),
    ("examples/hostfarm_gym_lunarlander_dqn.yaml",
     "hostfarm_gym_lunarlander_dqn", 2700),
    ("examples/hostfarm_gym_cartpole_impala.yaml",
     "hostfarm_gym_cartpole_impala", 1200),
    ("examples/breakout_ppo.yaml", "breakout_ppo", 2400),
    ("examples/evolution/pbt_breakout_impala.yaml",
     "pbt_breakout_impala", 2700),
    ("examples/muzero/muzero_breakout.yaml", "muzero_breakout", 3600),
    ("examples/breakout_impala.yaml", "breakout_impala", 1500),
    ("examples/qbert_ppo.yaml", "qbert_ppo", 2400),
    ("examples/qbert_impala.yaml", "qbert_impala", 1500),
    ("examples/spaceinvader_ppo.yaml", "spaceinvader_ppo", 2400),
    ("examples/spaceinvader_impala.yaml", "spaceinvader_impala", 1500),
    ("examples/beamrider_ppo.yaml", "beamrider_ppo", 2400),
    ("examples/beamrider_impala.yaml", "beamrider_impala", 1500),
    ("examples/pong_ppo.yaml", "pong_ppo", 2400),
    ("examples/pong_impala_speedup.yaml", "pong_impala", 1500),
    ("examples/grids/qbert_dqn_seed1.yaml", "qbert_dqn_seed1", 2400,
     ["--seed", "1"]),
    ("examples/pong_dqn.yaml", "pong_dqn", 2100),
    ("examples/spaceinvader_dqn.yaml", "spaceinvader_dqn", 2100),
    ("examples/beamrider_dqn.yaml", "beamrider_dqn", 2100),
    ("examples/ma_cases/hostfarm_smac_qmix.yaml",
     "hostfarm_smac_qmix", 900),
    # round-5 rows (VERDICT r4 missing #1): every implemented algorithm
    # and bespoke env family gets an archived learning curve
    ("examples/ant_ppo.yaml", "ant_ppo", 2400),
    # opt-in potential-based shaping variant: the plain ant task's sparse
    # reward defeats undirected exploration (ANALYSIS.md probe); this row
    # shows the policy LEARNS the hunt when approach pays densely
    ("examples/ant_ppo_shaped.yaml", "ant_ppo_shaped", 900),
    ("examples/dog_ppo.yaml", "dog_ppo", 2400),
    ("examples/catchpigs_qmix.yaml", "catchpigs_qmix", 2700),
    ("examples/skirmish_scc.yaml", "skirmish_scc", 2700),
    ("examples/mspacman_dqn.yaml", "mspacman_dqn", 2100),
]


def latest_ws(bench_id: str, since: float = 0.0):
    """Newest workspace for this id CREATED AFTER ``since`` — a run that
    died before creating one must not inherit an older run's curves."""
    if not os.path.isdir(OUT):
        return None
    cands = sorted(
        d for d in os.listdir(OUT)
        # PBT runs suffix their workspace id with "_pbt"
        if (d.startswith(bench_id + "+") or d.startswith(bench_id + "_pbt+"))
        and d.endswith("Ttrain")
        and os.path.getmtime(os.path.join(OUT, d)) >= since - 5.0)
    return os.path.join(OUT, cands[-1]) if cands else None


def summarize(bench_id: str, since: float = 0.0):
    ws = latest_ws(bench_id, since)
    if ws is None:
        return None
    rec = os.path.join(ws, "benchmark", "records.csv")
    if not os.path.exists(rec):
        return None
    with open(rec) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return None

    def fcol(row, k, default=0.0):
        try:
            return float(row.get(k, default) or default)
        except ValueError:
            return default

    last = rows[-1]
    # prefer the recent-N running estimator: interval means cover 0-2
    # episodes and let a single 583-step episode print 40.0 next to a 265
    # running mean (VERDICT r4 weak #8); host-farm rows record the real
    # sims' finished-episode mean as train_reward_avg
    key = next((k for k in ("episode_reward_recent", "episode_reward_mean",
                            "train_reward_avg")
                if any(r.get(k) not in (None, "") for r in rows)),
               "train_reward_avg")
    rewards = [fcol(r, key) for r in rows]
    tail = rewards[max(0, len(rows) - max(3, len(rows) // 10)):]
    sps = [fcol(r, "step_per_second") for r in rows[1:]]
    return {
        "id": bench_id,
        "workspace": os.path.relpath(ws, REPO),
        "env_steps": int(fcol(last, "env_steps")),
        "train_count": int(fcol(last, "train_count")),
        "wall_time_s": fcol(last, "wall_time"),
        "final_reward_tail_mean": round(sum(tail) / max(len(tail), 1), 2),
        "reward_first": round(rewards[0], 2),
        "reward_max": round(max(rewards), 2),
        "steps_per_second_median": round(sorted(sps)[len(sps) // 2], 1) if sps else 0.0,
        "n_records": len(rows),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=19800.0)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    os.makedirs(OUT, exist_ok=True)
    deadline = time.time() + args.budget_s
    summary_path = os.path.join(OUT, "summary.json")
    summary = []
    if os.path.exists(summary_path):
        summary = json.load(open(summary_path))
    done_ids = {s["id"] for s in summary if s.get("completed")}

    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")

    for row_spec in RUNS:
        yaml_rel, bench_id, cap = row_spec[:3]
        extra = list(row_spec[3]) if len(row_spec) > 3 else []
        if args.only and bench_id not in args.only:
            continue
        if bench_id in done_ids:
            print(f"[matrix] {bench_id}: already complete, skipping", flush=True)
            continue
        remaining = deadline - time.time()
        if remaining < 300:
            print("[matrix] budget exhausted, stopping", flush=True)
            break
        slot = min(cap, remaining)
        print(f"[matrix] === {bench_id} (cap {int(slot)}s) ===", flush=True)
        t0 = time.time()
        proc = subprocess.Popen(
            [sys.executable, "-m", "xingtian_tpu.main", "-f",
             os.path.join(REPO, yaml_rel), "-t", "train",
             "--archive_root", OUT] + extra,
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
            preexec_fn=os.setsid)
        timed_out = False
        try:
            out, _ = proc.communicate(timeout=slot)
        except subprocess.TimeoutExpired:
            timed_out = True
            os.killpg(proc.pid, signal.SIGTERM)
            try:
                out, _ = proc.communicate(timeout=60)
            except subprocess.TimeoutExpired:
                os.killpg(proc.pid, signal.SIGKILL)
                out, _ = proc.communicate()
        dt = time.time() - t0
        tail = "\n".join((out or "").splitlines()[-12:])
        print(f"[matrix] {bench_id}: rc={proc.returncode} "
              f"timed_out={timed_out} dt={dt:.0f}s\n{tail}", flush=True)

        row = summarize(bench_id, since=t0) or {"id": bench_id, "n_records": 0}
        row["completed"] = (not timed_out) and proc.returncode == 0
        row["timed_out"] = timed_out
        row["run_wall_s"] = round(dt, 1)
        summary = [s for s in summary if s["id"] != bench_id] + [row]
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=1)

    print(json.dumps(summary, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
