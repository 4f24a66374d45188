"""Plot the round-4 learning curves (committed PNG next to the JSONL data).

Same visual system as plot_r3_curves.py: change-over-time -> line charts,
one panel per scenario, categorical palette slots (REFIL blue #2a78d6,
QMIX-atten orange #eb6834, seed-1 REFIL as a lighter blue), light surface,
recessive grid, direct legend.

Usage: python scripts/plot_r4_curves.py [results/r4_runs]
"""
import glob
import json
import os
import sys

sys.path.insert(0, ".")

BLUE, ORANGE, BLUE2 = "#2a78d6", "#eb6834", "#8db7e8"
SURFACE, INK, MUTED = "#fcfcfb", "#0b0b0b", "#52514e"
GRID = "#e5e4e0"


def curve(run_dir, key):
    fs = sorted(
        glob.glob(os.path.join(run_dir, "metrics", "*.jsonl")),
        key=lambda f: -os.path.getsize(f),
    )
    if not fs:
        return [], []
    rows = [json.loads(l) for l in open(fs[0]) if l.strip()]
    pts = [(r["t"], r["value"]) for r in rows if r["key"] == key]
    return [t for t, _ in pts], [v for _, v in pts]


def style(ax, title, ylab):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    ax.set_xlabel("env steps", color=MUTED, fontsize=9)
    ax.set_ylabel(ylab, color=MUTED, fontsize=9)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.set_ylim(-0.03, 1.03)


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    base = sys.argv[1] if len(sys.argv) > 1 else "results/r4_runs"
    fig, axes = plt.subplots(1, 3, figsize=(13.5, 3.8), dpi=130)
    fig.patch.set_facecolor(SURFACE)

    panels = [
        (axes[0], "3-8sz symmetric — untouched 10M protocol", "test win rate",
         [("REFIL s0", os.path.join(base, "refil_sz_10m"),
           "test_battle_won_mean", BLUE),
          ("REFIL s1 (2M)", os.path.join(base, "refil_sz_2m_s1"),
           "test_battle_won_mean", BLUE2),
          ("QMIX-atten s0", os.path.join(base, "qmix_atten_sz_10m"),
           "test_battle_won_mean", ORANGE)]),
        (axes[1], "3-8csz symmetric (2M)", "test win rate",
         [("REFIL", os.path.join(base, "refil_csz_2m"),
           "test_battle_won_mean", BLUE),
          ("QMIX-atten", os.path.join(base, "qmix_atten_csz_2m"),
           "test_battle_won_mean", ORANGE)]),
        (axes[2], "3-8MMM symmetric (2M)", "test win rate",
         [("REFIL", os.path.join(base, "refil_mmm_2m"),
           "test_battle_won_mean", BLUE)]),
    ]
    for ax, title, ylab, series in panels:
        style(ax, title, ylab)
        for name, run_dir, key, color in series:
            t, v = curve(run_dir, key)
            if not t:
                continue
            ax.plot(t, v, color=color, linewidth=2, label=name)
            ax.plot(t[-1], v[-1], "o", color=color, markersize=5)
        ax.legend(frameon=False, fontsize=8, labelcolor=MUTED,
                  loc="upper left")
        ax.xaxis.set_major_formatter(
            plt.FuncFormatter(lambda x, _: f"{x/1e6:g}M" if x else "0")
        )

    fig.tight_layout()
    out = os.path.join(base, "r4_curves.png")
    fig.savefig(out, facecolor=SURFACE, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
