"""Extended round-3 learning runs: the 500k curves on 3-8sz/3-8MMM rise but
are still early (shield/heal scenarios are much harder than 3-8m) — these
2M-step runs give the paper-style separation. Epsilon anneal is kept at the
same 20% fraction of the run as the 500k protocol (400k of 2M).

Usage: python scripts/learning_runs_r3b.py [outdir]
"""
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/r3_runs"

COMBAT = [
    "t_max=2000000",
    "epsilon_anneal_time=400000",
    "test_interval=100000",
    "test_nepisode=32",
    "seed=0",
]

RUNS = [
    ("refil_sz_2m", ["--config=refil", "--env-config=sc2custom", "with",
                     "scenario=3-8sz_symmetric", "name=refil_3-8sz_2m", *COMBAT]),
    ("qmix_atten_sz_2m", ["--config=qmix_atten", "--env-config=sc2custom",
                          "with", "scenario=3-8sz_symmetric",
                          "name=qmix_atten_3-8sz_2m", *COMBAT]),
    ("refil_mmm_2m", ["--config=refil", "--env-config=sc2custom", "with",
                      "scenario=3-8MMM_symmetric", "name=refil_3-8MMM_2m",
                      *COMBAT]),
]


def main():
    from refil_tpu.main import main as cli

    os.makedirs(OUT, exist_ok=True)
    for tag, argv in RUNS:
        res = os.path.join(OUT, tag)
        t0 = time.time()
        print(f"\n===== {tag}: {' '.join(argv)} =====", flush=True)
        try:
            cli(argv + [f"local_results_path={res}"])
            print(f"===== {tag} DONE in {time.time()-t0:.0f}s =====", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"===== {tag} FAILED after {time.time()-t0:.0f}s =====", flush=True)


if __name__ == "__main__":
    main()
