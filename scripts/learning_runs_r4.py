"""Round-4 learning runs (VERDICT r3 items 1 and 3), executed back-to-back in
ONE process so the tunneled TPU is claimed once.

The headline pair runs the reference's UNTOUCHED shipped protocol — no
hyperparameter edits at all (refil.yaml: eps 1->0.05 over 500k, buffer 5000,
batch_size_run 8, t_max 10M; sc2custom.yaml: test 160 episodes / 50k steps):

  1. refil      @ 3-8sz_symmetric, seed 0, full 10M protocol
  2. qmix_atten @ 3-8sz_symmetric, seed 0, full 10M protocol
  3. refil      @ 3-8csz_symmetric, 2M protocol (r3b cadence) — the pair
  4. qmix_atten @ 3-8csz_symmetric, 2M protocol   for the csz ordering claim
  5. refil      @ 3-8sz_symmetric, seed 1, 2M protocol (seed evidence)
  6. refil      @ 3-8MMM_symmetric, 2M protocol (Medivac path on the
                  round-4 env: difficulty-7 focus-fire enemy + range slack)

All runs face the NEW difficulty-7 enemy (overkill-aware focus fire,
envs/combat/env.py tier 2) — the r3 curves were against what is now tier 1,
so r4 curves supersede rather than extend them.

Usage: python scripts/learning_runs_r4.py [outdir] [first_run_index]
"""
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/r4_runs"
FIRST = int(sys.argv[2]) if len(sys.argv) > 2 else 0

# the 2M cadence used by the r3b runs (NOT the untouched protocol; used only
# for the secondary scenarios where the 10M budget is not warranted)
COMBAT_2M = [
    "t_max=2000000",
    "epsilon_anneal_time=400000",
    "test_interval=100000",
    "test_nepisode=32",
]

RUNS = [
    ("refil_sz_10m", ["--config=refil", "--env-config=sc2custom", "with",
                      "scenario=3-8sz_symmetric", "name=refil_3-8sz_10m",
                      "seed=0"]),
    ("qmix_atten_sz_10m", ["--config=qmix_atten", "--env-config=sc2custom",
                           "with", "scenario=3-8sz_symmetric",
                           "name=qmix_atten_3-8sz_10m", "seed=0"]),
    ("refil_csz_2m", ["--config=refil", "--env-config=sc2custom", "with",
                      "scenario=3-8csz_symmetric", "name=refil_3-8csz_2m",
                      "seed=0", *COMBAT_2M]),
    ("qmix_atten_csz_2m", ["--config=qmix_atten", "--env-config=sc2custom",
                           "with", "scenario=3-8csz_symmetric",
                           "name=qmix_atten_3-8csz_2m", "seed=0", *COMBAT_2M]),
    ("refil_sz_2m_s1", ["--config=refil", "--env-config=sc2custom", "with",
                        "scenario=3-8sz_symmetric", "name=refil_3-8sz_2m_s1",
                        "seed=1", *COMBAT_2M]),
    ("refil_mmm_2m", ["--config=refil", "--env-config=sc2custom", "with",
                      "scenario=3-8MMM_symmetric", "name=refil_3-8MMM_2m",
                      "seed=0", *COMBAT_2M]),
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
