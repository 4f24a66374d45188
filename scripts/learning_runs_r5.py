"""Round-5 learning runs (VERDICT r4 items 1, 2, 7), back-to-back in ONE
process so the tunneled TPU is claimed once.

1. qmix_atten @ 3-8MMM_symmetric, 2M cadence — the comparison partner for
   r4's `refil_mmm_2m` (same overrides, same env code), closing the last
   unevidenced flagship ordering claim (VERDICT r4 missing #1; replaces the
   empty results/r4_runs/qmix_atten_mmm_2m).
2. refil      @ 3-8sz_symmetric, seed 1, UNTOUCHED protocol, t_max=4M —
   second seed of the headline pair; 4M is past where every seed-0
   threshold resolved (<=1.56M for refil).
3. qmix_atten @ 3-8sz_symmetric, seed 1, UNTOUCHED protocol, t_max=6M —
   seed-0 qmix hit >=0.9 at 3.53M, so 6M gives headroom for the slowest
   threshold to resolve at seed 1.
4/5. refil + qmix_atten @ 3-8csz_symmetric, seed 0, UNTOUCHED protocol
   (eps 1->0.05 over 500k, 160-episode test blocks every 50k), t_max=4M —
   the paper-cadence csz pair VERDICT r4 weak-list asked for (the r4 2M
   points used 32-episode blocks and were noisy).

"Untouched" = config/algs/{refil,qmix_atten}.yaml + config/envs/sc2custom.yaml
with ONLY t_max overridden (budget, not protocol: epsilon schedule, buffer,
test cadence/size, optimizer all shipped values). All runs use the round-4
env code (difficulty-7 focus-fire enemy, range-slack fix) so curves merge
with results/r4_runs/ tables.

Usage: python scripts/learning_runs_r5.py [outdir] [first_run_index]
"""
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/r5_runs"
FIRST = int(sys.argv[2]) if len(sys.argv) > 2 else 0

# the r4 2M cadence — used ONLY for the MMM run so it pairs exactly with
# results/r4_runs/refil_mmm_2m
COMBAT_2M = [
    "t_max=2000000",
    "epsilon_anneal_time=400000",
    "test_interval=100000",
    "test_nepisode=32",
]

RUNS = [
    ("qmix_atten_mmm_2m", ["--config=qmix_atten", "--env-config=sc2custom",
                           "with", "scenario=3-8MMM_symmetric",
                           "name=qmix_atten_3-8MMM_2m", "seed=0", *COMBAT_2M]),
    ("refil_sz_4m_s1", ["--config=refil", "--env-config=sc2custom", "with",
                        "scenario=3-8sz_symmetric", "name=refil_3-8sz_4m_s1",
                        "seed=1", "t_max=4000000"]),
    ("qmix_atten_sz_6m_s1", ["--config=qmix_atten", "--env-config=sc2custom",
                             "with", "scenario=3-8sz_symmetric",
                             "name=qmix_atten_3-8sz_6m_s1", "seed=1",
                             "t_max=6000000"]),
    ("refil_csz_4m", ["--config=refil", "--env-config=sc2custom", "with",
                      "scenario=3-8csz_symmetric", "name=refil_3-8csz_4m",
                      "seed=0", "t_max=4000000"]),
    ("qmix_atten_csz_4m", ["--config=qmix_atten", "--env-config=sc2custom",
                           "with", "scenario=3-8csz_symmetric",
                           "name=qmix_atten_3-8csz_4m", "seed=0",
                           "t_max=4000000"]),
]


def main():
    from refil_tpu.main import main as cli

    os.makedirs(OUT, exist_ok=True)
    for tag, argv in RUNS[FIRST:]:
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
