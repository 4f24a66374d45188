"""Round-5 learning runs, back-to-back in ONE process so the tunneled TPU is
claimed once.

Context: the round-4 run data under results/r4_runs/ was lost (results/ is
gitignored and the r4 JSONLs were never force-added), so BOTH sides of every
flagship pair re-run here on the current env code (difficulty-7 focus-fire
enemy with the r5 chaser-reservation fix, range-slack fix). Queue in priority
order — the script stops starting new runs past --deadline so the chip is
free for the end-of-round bench:

1/2. refil + qmix_atten @ 3-8MMM_symmetric — UNTOUCHED protocol (eps 1->0.05
   over 500k, buffer 5000, 160-episode test blocks every 50k; only t_max
   overridden as budget). Closes the last unevidenced flagship ordering
   claim (VERDICT r4 missing #1): the paper trio is sz/MMM/csz
   (/root/reference/src/envs/starcraft2/custom_scenarios.py:108-142).
3/4. refil + qmix_atten @ 3-8sz_symmetric, seed 0, untouched protocol —
   restores the lost r4 headline pair. 4M/5M budgets: every seed-0 r4
   threshold resolved by 1.56M (refil) / 3.53M (qmix).
5/6. refil + qmix_atten @ 3-8csz_symmetric, seed 0, untouched protocol —
   the paper-cadence csz pair (VERDICT r4 item 7; the r4 2M points used
   32-episode blocks and were noisy).
7/8. the sz pair again at seed 1 (VERDICT r4 item 2) — second seed of the
   headline comparison.

Usage: python scripts/learning_runs_r5.py [outdir] [first_run_index] [deadline_epoch_s]
"""
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/r5_runs"
FIRST = int(sys.argv[2]) if len(sys.argv) > 2 else 0
DEADLINE = float(sys.argv[3]) if len(sys.argv) > 3 else float("inf")

RUNS = [
    ("refil_mmm", ["--config=refil", "--env-config=sc2custom", "with",
                   "scenario=3-8MMM_symmetric", "name=refil_3-8MMM",
                   "seed=0", "t_max=3000000"]),
    ("qmix_atten_mmm", ["--config=qmix_atten", "--env-config=sc2custom",
                        "with", "scenario=3-8MMM_symmetric",
                        "name=qmix_atten_3-8MMM", "seed=0", "t_max=4000000"]),
    ("refil_sz", ["--config=refil", "--env-config=sc2custom", "with",
                  "scenario=3-8sz_symmetric", "name=refil_3-8sz",
                  "seed=0", "t_max=4000000"]),
    ("qmix_atten_sz", ["--config=qmix_atten", "--env-config=sc2custom",
                       "with", "scenario=3-8sz_symmetric",
                       "name=qmix_atten_3-8sz", "seed=0", "t_max=5000000"]),
    ("refil_csz", ["--config=refil", "--env-config=sc2custom", "with",
                   "scenario=3-8csz_symmetric", "name=refil_3-8csz",
                   "seed=0", "t_max=4000000"]),
    ("qmix_atten_csz", ["--config=qmix_atten", "--env-config=sc2custom",
                        "with", "scenario=3-8csz_symmetric",
                        "name=qmix_atten_3-8csz", "seed=0",
                        "t_max=4000000"]),
    ("refil_sz_s1", ["--config=refil", "--env-config=sc2custom", "with",
                     "scenario=3-8sz_symmetric", "name=refil_3-8sz_s1",
                     "seed=1", "t_max=4000000"]),
    ("qmix_atten_sz_s1", ["--config=qmix_atten", "--env-config=sc2custom",
                          "with", "scenario=3-8sz_symmetric",
                          "name=qmix_atten_3-8sz_s1", "seed=1",
                          "t_max=5000000"]),
]


def main():
    from refil_tpu.main import main as cli

    os.makedirs(OUT, exist_ok=True)
    for tag, argv in RUNS[FIRST:]:
        if time.time() > DEADLINE:
            print(f"===== DEADLINE passed, skipping {tag} and the rest =====",
                  flush=True)
            break
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
