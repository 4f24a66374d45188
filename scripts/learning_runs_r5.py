"""Round-5 learning runs under a supervisor: each run is a CHILD process with
a progress watchdog, because the experimental axon TPU tunnel can wedge
mid-dispatch (observed r5: a run went silent at a test-block dispatch with
zero socket traffic; SIGTERM cannot help because the preemption guard is only
checked between dispatches). The supervisor SIGKILLs a stalled child, waits
for the tunnel to recover (probe loop), and moves on to the next run, so one
wedge cannot eat the night's queue.

Context: the round-4 run data under results/r4_runs/ was lost (results/ is
gitignored and the r4 JSONLs were never force-added), so BOTH sides of every
flagship pair re-run here on the current env code. Queue in priority order —
past --deadline no new runs start so the chip frees up for the end-of-round
bench.

Usage: python scripts/learning_runs_r5.py [outdir] [first_run_index] [deadline_epoch_s]
"""
import glob
import os
import signal
import subprocess
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/r5_runs"
FIRST = int(sys.argv[2]) if len(sys.argv) > 2 else 0
DEADLINE = float(sys.argv[3]) if len(sys.argv) > 3 else float("inf")

STALL_S = 360       # no metrics-file progress for this long -> kill the child
START_GRACE_S = 1200  # compile + session init can delay the first metrics row

RUNS = [
    # 1: completed to t_env 1.16M before the r5 tunnel wedge; curve is
    # conclusive (>=0.5 @ 351k, >=0.9 @ 552k, best 0.956) — re-run only by
    # explicitly passing first_run_index=0
    ("refil_mmm", ["--config=refil", "--env-config=sc2custom", "with",
                   "scenario=3-8MMM_symmetric", "name=refil_3-8MMM",
                   "seed=0", "t_max=3000000"]),
    ("qmix_atten_mmm", ["--config=qmix_atten", "--env-config=sc2custom",
                        "with", "scenario=3-8MMM_symmetric",
                        "name=qmix_atten_3-8MMM", "seed=0", "t_max=3000000"]),
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def tunnel_ok(timeout=90):
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_tunnel():
    for i in range(12):
        if tunnel_ok():
            log("tunnel probe OK")
            return True
        log(f"tunnel probe failed ({i + 1}/12), waiting 30s")
        time.sleep(30)
    return False


def newest_metric_mtime(res):
    fs = glob.glob(os.path.join(res, "metrics", "*.jsonl"))
    return max((os.path.getmtime(f) for f in fs), default=None)


def run_one(tag, argv):
    res = os.path.join(OUT, tag)
    os.makedirs(res, exist_ok=True)
    logf = open(os.path.join(OUT, f"{tag}.log"), "a")
    t0 = time.time()
    log(f"START {tag}: {' '.join(argv)}")
    child = subprocess.Popen(
        [sys.executable, "-m", "refil_tpu.main"] + argv
        + [f"local_results_path={res}"],
        stdout=logf, stderr=subprocess.STDOUT,
    )
    stalled = False
    while True:
        try:
            child.wait(timeout=20)
            break
        except subprocess.TimeoutExpired:
            pass
        mt = newest_metric_mtime(res)
        age = time.time() - (mt if mt is not None else t0)
        if (mt is None and age > START_GRACE_S) or (mt is not None and age > STALL_S):
            log(f"STALL {tag}: no metrics progress for {age:.0f}s — killing "
                f"pid {child.pid}")
            child.send_signal(signal.SIGKILL)
            child.wait()
            stalled = True
            break
    dt = time.time() - t0
    if stalled:
        log(f"KILLED {tag} after {dt:.0f}s (tunnel wedge suspected)")
        wait_for_tunnel()
    elif child.returncode == 0:
        log(f"DONE {tag} in {dt:.0f}s")
    else:
        log(f"FAILED {tag} (exit {child.returncode}) after {dt:.0f}s")
        wait_for_tunnel()
    logf.close()


def main():
    os.makedirs(OUT, exist_ok=True)
    if not wait_for_tunnel():
        log("tunnel never came back — aborting queue")
        return
    for tag, argv in RUNS[FIRST:]:
        if time.time() > DEADLINE:
            log(f"DEADLINE passed, skipping {tag} and the rest")
            break
        run_one(tag, argv)
    log("queue complete")


if __name__ == "__main__":
    main()
