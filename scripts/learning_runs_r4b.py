"""Continuation of scripts/learning_runs_r4.py after the qmix_atten_sz_10m
run stalled on a wedged tunnel dispatch and was killed: remaining runs
reordered so the shorter, verdict-critical csz comparison lands first and
the long qmix 10M run comes last (a deadline SIGTERM still leaves a
graceful partial curve via PreemptionGuard).

Usage: python scripts/learning_runs_r4b.py [outdir]
"""
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/r4_runs"

COMBAT_2M = [
    "t_max=2000000",
    "epsilon_anneal_time=400000",
    "test_interval=100000",
    "test_nepisode=32",
]

RUNS = [
    ("refil_csz_2m", ["--config=refil", "--env-config=sc2custom", "with",
                      "scenario=3-8csz_symmetric", "name=refil_3-8csz_2m",
                      "seed=0", *COMBAT_2M]),
    ("qmix_atten_csz_2m", ["--config=qmix_atten", "--env-config=sc2custom",
                           "with", "scenario=3-8csz_symmetric",
                           "name=qmix_atten_3-8csz_2m", "seed=0", *COMBAT_2M]),
    ("qmix_atten_sz_10m", ["--config=qmix_atten", "--env-config=sc2custom",
                           "with", "scenario=3-8sz_symmetric",
                           "name=qmix_atten_3-8sz_10m", "seed=0"]),
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
