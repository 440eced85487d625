"""Build artifacts/reward_matrix/REPORT.md from the archived runs.

Summarises every run's learning curve (downsampled reward-vs-steps
series straight from records.csv), compares asymptotes against the
reference's published ALE numbers with the analog-env caveat stated, and
pins the throughput each run sustained.
"""

from __future__ import annotations

import csv
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "reward_matrix")

# reference README.md:151-176 (episode reward @10M steps, real ALE)
REFERENCE_ALE = {
    "breakout_ppo": 341, "pong_ppo": None, "qbert_ppo": 14771,
    "spaceinvader_ppo": 1025, "beamrider_ppo": 4877,
    "breakout_impala": 334, "pong_impala": None, "qbert_impala": 12205,
    "spaceinvader_impala": 742, "beamrider_impala": 2313,
    "breakout_dqn": 352, "pong_dqn": None, "qbert_dqn": 14087,
    "qbert_dqn_seed1": 14087, "qbert_ppo_retuned": 14771,
    "spaceinvader_dqn": 947, "beamrider_dqn": 6706,
    "muzero_breakout": None,
}
# intrinsic maxima of the analog envs where known (context for asymptotes)
ANALOG_NOTES = {
    "pong": "analog Pong is first-to-21: 21 = perfect play",
    "qbert": ("analog QBert pays escalating per-round scores since r5 "
              "(real QBert's growing per-level yield)"),
    "ant_ppo_shaped": ("SHAPED training reward (env_info.shaping=0.3); "
                       "greedy eval on the unshaped env = -16.0 (passive) "
                       "for every checkpoint -- the gain is shaping "
                       "income, see artifacts/ant_shaping_probes_r05"),
    "muzero_breakout": ("hidden-256 capacity config (r5 probe-promoted); "
                        "r5-early hidden-128 run: tail 13.4 at 10M"),
    "hostfarm_gym_cartpole_ppo": (
        "SOLVED (greedy eval 500/500, the env max); the negative tail "
        "slope is oscillation against the 500-step cap, not regression"),
    "skirmish_scc": (
        "5M-step extension of the r5 2M run (tail 16.41) -- same "
        "plateau ~16.4, peak 19.45: converged, the tail slope is "
        "oscillation around the plateau"),
    "hostfarm_smac_qmix_stub": (
        "the stub pays stalling over quick wins (scripted-baseline "
        "measurement in ANALYSIS.md); QMIX's 19-20.6 beats every "
        "scripted baseline, won-rate 0.875"),
}


def load_rows(ws):
    path = os.path.join(OUT, ws, "benchmark", "records.csv")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return list(csv.DictReader(f))


def f(row, k, d=0.0):
    try:
        return float(row.get(k, d) or d)
    except ValueError:
        return d


def _reward_key(rows):
    """Prefer the recent-N running estimator over per-interval means: an
    interval holding a single short episode can print a bogus collapse or
    peak (VERDICT r4 weak #8 — breakout_ppo's final 40.0 vs recent 265.6)."""
    for k in ("episode_reward_recent", "episode_reward_mean",
              "train_reward_avg"):
        if any(r.get(k) not in (None, "") for r in rows):
            return k
    return "train_reward_avg"


def downsample(rows, n=12):
    if len(rows) <= n:
        return rows
    idx = [round(i * (len(rows) - 1) / (n - 1)) for i in range(n)]
    return [rows[i] for i in idx]


def trend(rows, key):
    """Least-squares slope of reward over the LAST 20% of records,
    classified against the tail mean — computed, not eyeballed (the r3
    'still rising' claim was unsupported by its own records.csv; this
    makes that class of claim mechanical)."""
    tail = rows[max(0, len(rows) - max(5, len(rows) // 5)):]
    if len(tail) < 3:
        return "too-few-records", 0.0
    xs = [f(r, "env_steps") / 1e6 for r in tail]
    ys = [f(r, key) for r in tail]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom <= 0:
        return "flat", 0.0
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    # threshold: ±5% of the tail mean per 1M steps
    thresh = 0.05 * max(abs(my), 1e-9)
    if slope > thresh:
        label = "rising"
    elif slope < -thresh:
        label = "declining"
    else:
        label = "flat"
    return label, slope


def main():
    summary = json.load(open(os.path.join(OUT, "summary.json")))
    lines = [
        "# Reward matrix — learning curves (rounds 4-5)",
        "",
        "Every run below trained on ONE v5e TPU chip via the fused",
        "rollout+update program; full per-interval records live in each",
        "workspace's `benchmark/records.csv`.",
        "",
        "**Caveat (stated wherever these numbers travel):** the envs are",
        "the pure-JAX arcade analogs, not ALE — absolute scores are NOT",
        "comparable to the reference's ALE rewards. The claim these runs",
        "substantiate is: the same algorithms, at the reference's",
        "observation geometry and hyperparameter schema, learn strong",
        "policies within the same 10M-step budget, at 5-50x the wall-clock",
        "throughput. The real-ALE adapter (`envs/ale.py`) runs the",
        "identical training path when ALE is installed.",
        "",
        "Round-4 notes: EVERY analog row below re-ran at the round-3 env",
        "depth (multi-life Breakout with speed-up and wall regeneration,",
        "QBert lives — reward scales NOT comparable to rounds ≤2; earlier",
        "matrices archived in `artifacts/reward_matrix_r2,_r3/`). Rows",
        "prefixed `hostfarm_gym_` train REAL third-party simulators",
        "(gymnasium classic control / Box2D) through the host farm +",
        "batched predictor with host-CPU inference — genuine external",
        "sims, no analog caveat. `pbt_breakout_impala` is a live PBT",
        "population (4 members, LR mutations); compare its best against",
        "the fixed-hyper `breakout_impala` row. `qbert_dqn_seed1` repeats",
        "round 3's unstable qbert_dqn under a different seed (variance",
        "evidence). The tail-trend column is a least-squares slope over",
        "the last 20% of records — computed, not eyeballed.",
        "",
        "| run | env steps | wall clock | steps/s (median) | reward: first → tail mean (max) | tail trend (Δ/1M steps) | reference @10M (real ALE) |",
        "|---|---|---|---|---|---|---|",
    ]
    by_id = {s["id"]: s for s in summary}
    for rid, s in sorted(by_id.items()):
        if not s.get("n_records"):
            note = s.get("note", "no records")
            lines.append(f"| {rid} | — | — | — | ({note}) | | |")
            continue
        ref = REFERENCE_ALE.get(rid)
        done = "" if s.get("completed") else " (partial: hit time cap)"
        ws = s.get("workspace", "")
        rows = load_rows(os.path.basename(ws)) if ws else []
        key = _reward_key(rows)
        label, slope = trend(rows, key) if rows else ("?", 0.0)
        lines.append(
            f"| {rid}{done} | {s['env_steps']:,} | {s['wall_time_s']:.0f}s "
            f"| {s['steps_per_second_median']:,} "
            f"| {s['reward_first']} → {s['final_reward_tail_mean']} "
            f"({s['reward_max']}) | {label} ({slope:+.1f}) "
            f"| {ref if ref else '—'} |")

    lines += ["", "## Curves (downsampled from records.csv)", ""]
    for rid, s in sorted(by_id.items()):
        ws = s.get("workspace", "")
        rows = load_rows(os.path.basename(ws)) if ws else []
        if not rows:
            continue
        lines.append(f"### {rid}")
        note = next((v for k, v in ANALOG_NOTES.items() if k in rid), None)
        if note:
            lines.append(f"*({note})*")
        lines.append("")
        key = _reward_key(rows)
        lines.append(f"| env steps | episode reward ({key}) |")
        lines.append("|---|---|")
        for r in downsample(rows):
            lines.append(f"| {int(f(r, 'env_steps')):,} "
                         f"| {f(r, key):.2f} |")
        lines.append("")

    with open(os.path.join(OUT, "REPORT.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.join(OUT, 'REPORT.md')} "
          f"({len(by_id)} runs)")


if __name__ == "__main__":
    main()
