"""Round-3 learning runs on the paper's flagship scenarios (VERDICT r2
items 3 and 4), executed back-to-back in ONE process so the tunneled TPU is
claimed once and never wedged between runs.

  1. refil        @ 3-8sz_symmetric  (the config every perf number uses)
  2. qmix_atten   @ 3-8sz_symmetric  (ordering comparison)
  3. refil        @ 3-8MMM_symmetric (learning-validates Medivac heal/energy)
  4. refil_group_matching       @ paper hyperparameters, t_max 1M, gt diagnostics
  5. qmix_atten_group_matching  @ same

Protocol matches results/combat_r2: production CLI path, reference
hyperparameters, 500k steps with the epsilon schedule shortened 500k->100k
(the 10M-step schedule would leave eps~0.9 for a 500k run). GM runs use the
untouched paper configuration (eps anneal 5k, t_max 1M).

Usage: python scripts/learning_runs_r3.py [outdir]
"""
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/r3_runs"

COMBAT = [
    "t_max=500000",
    "epsilon_anneal_time=100000",
    "test_interval=25000",
    "test_nepisode=32",
    "seed=0",
]
GM = [
    "t_max=1000000",
    "test_gt_factors=True",
    "seed=0",
]

RUNS = [
    ("refil_sz", ["--config=refil", "--env-config=sc2custom", "with",
                  "scenario=3-8sz_symmetric", "name=refil_3-8sz", *COMBAT]),
    ("qmix_atten_sz", ["--config=qmix_atten", "--env-config=sc2custom", "with",
                       "scenario=3-8sz_symmetric", "name=qmix_atten_3-8sz", *COMBAT]),
    ("refil_mmm", ["--config=refil", "--env-config=sc2custom", "with",
                   "scenario=3-8MMM_symmetric", "name=refil_3-8MMM", *COMBAT]),
    ("refil_gm", ["--config=refil_group_matching", "--env-config=group_matching",
                  "with", "name=refil_gm_paper", *GM]),
    ("qmix_atten_gm", ["--config=qmix_atten_group_matching",
                       "--env-config=group_matching", "with",
                       "name=qmix_atten_gm_paper", *GM]),
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
