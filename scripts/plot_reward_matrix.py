"""Render artifacts/reward_matrix learning curves as a small-multiples PNG.

Design notes (dataviz method): form = change-over-time → line charts, small
multiples per game with independent y (games have different reward scales,
clearly labeled); series identity = algorithm, colored from the validated
reference categorical palette in FIXED slot order (PPO=slot1 blue,
IMPALA=slot2 orange, DQN=slot3 aqua, MuZero=slot4 yellow) — never cycled,
color follows the entity; thin 2px lines, recessive grid, one legend for
the whole figure plus per-panel direct end-labels; text wears text tokens,
not series colors.  Static PNG (matplotlib) — no hover layer applies.
"""

from __future__ import annotations

import csv
import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "reward_matrix")

# validated reference palette, fixed slot order (dataviz references/palette.md)
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e4e3df"
SERIES = {  # entity → slot (fixed, never re-ranked)
    "ppo": "#2a78d6",
    "impala": "#eb6834",
    "dqn": "#1baf7a",
    "muzero": "#eda100",
}
GAMES = ["breakout", "pong", "qbert", "spaceinvader", "beamrider"]


def load_curve(ws_rel):
    path = os.path.join(REPO, ws_rel, "benchmark", "records.csv")
    if not os.path.exists(path):
        return [], []
    xs, ys = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            try:
                xs.append(float(row["env_steps"]) / 1e6)
                ys.append(float(row["episode_reward_mean"]))
            except (KeyError, ValueError):
                continue
    return xs, ys


def smooth(ys, k=9):
    if len(ys) < k:
        return ys
    out = []
    for i in range(len(ys)):
        lo, hi = max(0, i - k // 2), min(len(ys), i + k // 2 + 1)
        out.append(sum(ys[lo:hi]) / (hi - lo))
    return out


def main():
    summary = {s["id"]: s for s in
               json.load(open(os.path.join(OUT, "summary.json")))}
    fig, axes = plt.subplots(1, 5, figsize=(16, 3.4), dpi=150)
    fig.patch.set_facecolor(SURFACE)

    for ax, game in zip(axes, GAMES):
        ax.set_facecolor(SURFACE)
        for alg in ("ppo", "impala", "dqn", "muzero"):
            rid = f"{alg}_{game}" if alg == "muzero" else f"{game}_{alg}"
            rid = f"muzero_{game}" if alg == "muzero" else rid
            s = summary.get(rid)
            if not s or not s.get("workspace"):
                continue
            xs, ys = load_curve(s["workspace"])
            if not xs:
                continue
            ys = smooth(ys)
            label = alg.upper() if alg != "muzero" else "MuZero"
            ax.plot(xs, ys, color=SERIES[alg], linewidth=1.6, label=label,
                    solid_capstyle="round")
            # selective direct end-label (text token, colored mark via dot)
            ax.annotate(f" {label}", (xs[-1], ys[-1]), fontsize=6.5,
                        color=TEXT2, va="center")
        ax.set_title(game.capitalize(), fontsize=10, color=TEXT, pad=6)
        ax.set_xlabel("env steps (M)", fontsize=7.5, color=TEXT2)
        ax.tick_params(colors=TEXT2, labelsize=7, length=0)
        ax.grid(True, color=GRID, linewidth=0.6)
        ax.set_axisbelow(True)
        for spine in ax.spines.values():
            spine.set_visible(False)
        ax.set_xlim(0, 10.3)
    axes[0].set_ylabel("episode reward (analog env)", fontsize=7.5,
                       color=TEXT2)

    handles, labels = [], []
    for ax in axes:
        for h, l in zip(*ax.get_legend_handles_labels()):
            if l not in labels:
                handles.append(h)
                labels.append(l)
    fig.legend(handles, labels, loc="upper right", ncol=4, frameon=False,
               fontsize=8, labelcolor=TEXT2, bbox_to_anchor=(0.995, 1.02))
    fig.suptitle(
        "10M-step learning curves on one TPU v5e chip — pure-JAX arcade "
        "analogs (scores not comparable to ALE)",
        fontsize=10.5, color=TEXT, x=0.01, ha="left", y=1.04)
    fig.tight_layout()
    out = os.path.join(OUT, "curves.png")
    fig.savefig(out, bbox_inches="tight", facecolor=SURFACE)
    print("wrote", out)


if __name__ == "__main__":
    main()
