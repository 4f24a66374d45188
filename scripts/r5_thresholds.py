"""Threshold tables for the round-5 learning runs: for each run directory,
the first t_env where the 160-episode test win rate crosses 0.5 / 0.9, plus
plateau statistics. Emits the markdown table for results/r5_runs/README.md.

Usage: python scripts/r5_thresholds.py [results/r5_runs]
"""
import glob
import json
import os
import sys


def curve(run_dir, key="test_battle_won_mean"):
    fs = sorted(
        glob.glob(os.path.join(run_dir, "metrics", "*.jsonl")),
        key=lambda f: -os.path.getsize(f),
    )
    if not fs:
        return []
    rows = [json.loads(l) for l in open(fs[0]) if l.strip()]
    return sorted((r["t"], r["value"]) for r in rows if r["key"] == key)


def first_cross(pts, thr):
    for t, v in pts:
        if v >= thr:
            return t
    return None


def fmt_t(t):
    if t is None:
        return "—"
    return f"{t/1e6:.2f}M" if t >= 1e6 else f"{t/1e3:.0f}k"


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "results/r5_runs"
    print("| run | test points | first ≥0.5 | first ≥0.9 | "
          "final-1M mean | best |")
    print("|---|---|---|---|---|---|")
    for d in sorted(os.listdir(base)):
        run_dir = os.path.join(base, d)
        if not os.path.isdir(run_dir):
            continue
        pts = curve(run_dir)
        if not pts:
            print(f"| {d} | 0 | — | — | — | — |")
            continue
        t_last = pts[-1][0]
        tail = [v for t, v in pts if t > t_last - 1_000_000]
        print(
            f"| {d} | {len(pts)} | {fmt_t(first_cross(pts, 0.5))} | "
            f"{fmt_t(first_cross(pts, 0.9))} | "
            f"{sum(tail)/len(tail):.3f} | {max(v for _, v in pts):.3f} |"
        )


if __name__ == "__main__":
    main()
