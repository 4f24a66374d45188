"""Plot the round-5 learning curves (committed PNG next to the JSONL data).

Same visual system as plot_r3/r4_curves.py: change-over-time -> line charts,
one panel per flagship scenario set, categorical palette slots (REFIL blue,
QMIX-atten orange, seed-1 variants lighter), light surface, recessive grid,
direct legend. All r5 runs use the reference's untouched shipped protocol
(eps 1->0.05 over 500k, buffer 5000, 160-episode test blocks every 50k).

Usage: python scripts/plot_r5_curves.py [results/r5_runs]
"""
import glob
import json
import os
import sys

sys.path.insert(0, ".")

BLUE, ORANGE = "#2a78d6", "#eb6834"
BLUE2, ORANGE2 = "#8db7e8", "#f2a98e"
SURFACE, INK, MUTED = "#fcfcfb", "#0b0b0b", "#52514e"
GRID = "#e5e4e0"


def curve(run_dir, key="test_battle_won_mean"):
    fs = sorted(
        glob.glob(os.path.join(run_dir, "metrics", "*.jsonl")),
        key=lambda f: -os.path.getsize(f),
    )
    if not fs:
        return [], []
    rows = [json.loads(l) for l in open(fs[0]) if l.strip()]
    pts = sorted((r["t"], r["value"]) for r in rows if r["key"] == key)
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

    base = sys.argv[1] if len(sys.argv) > 1 else "results/r5_runs"
    fig, axes = plt.subplots(1, 3, figsize=(13.5, 3.8), dpi=130)
    fig.patch.set_facecolor(SURFACE)

    panels = [
        (axes[0], "3-8sz symmetric — untouched protocol", [
            ("REFIL s0", "refil_sz", BLUE),
            ("QMIX-atten s0", "qmix_atten_sz", ORANGE),
            ("REFIL s1", "refil_sz_s1", BLUE2),
            ("QMIX-atten s1", "qmix_atten_sz_s1", ORANGE2)]),
        (axes[1], "3-8MMM symmetric — untouched protocol", [
            ("REFIL", "refil_mmm", BLUE),
            ("QMIX-atten", "qmix_atten_mmm", ORANGE)]),
        (axes[2], "3-8csz symmetric — untouched protocol", [
            ("REFIL", "refil_csz", BLUE),
            ("QMIX-atten", "qmix_atten_csz", ORANGE)]),
    ]
    for ax, title, series in panels:
        style(ax, title, "test win rate")
        for name, sub, color in series:
            t, v = curve(os.path.join(base, sub))
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
    out = os.path.join(base, "r5_curves.png")
    fig.savefig(out, facecolor=SURFACE, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
