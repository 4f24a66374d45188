"""Measure PRODUCTION-CLI training throughput against `bench_ours` (VERDICT
r3 weak #1 done-criterion: CLI within ~10% of the bench at B=8 and B=512).

The CLI number drives the real `run()` entry (multi-block fused dispatch,
logging, cadence checks); throughput is value-forced — computed from the
on-device t_env the loop itself fetches per dispatch, between two wall-clock
stamps host-side (never from block_until_ready, which lies on the axon
tunnel — CLAUDE.md "TPU timing").

Usage: python scripts/cli_vs_bench.py [gm|combat] [B ...]
Prints one line per configuration; run on the TPU host.
"""
import io
import json
import os
import sys
import time

sys.path.insert(0, ".")


def cli_throughput(kind: str, B: int, t_max: int):
    """Run the real CLI for t_max env steps; return steps/s over the
    post-warmup portion (timer starts after the first test/log boundary so
    compile time is excluded)."""
    from refil_tpu import run as run_mod
    from refil_tpu.main import parse_cli
    from refil_tpu.config import load_config

    marks = []
    orig = run_mod._run_fused_loop

    def timed_loop(args, runner, learner, state, logger, key, timer,
                   start_time, **kw):
        class R:
            pass
        # sample (wallclock, t_env) at every dispatch by wrapping the runner's
        # t_env attribute access — simplest: poll via a logger hook
        orig_account = runner.account_block

        def account(stats, test_mode=False):
            orig_account(stats, test_mode=test_mode)
            if not test_mode:
                marks.append((time.perf_counter(), runner.t_env))

        runner.account_block = account
        return orig(args, runner, learner, state, logger, key, timer,
                    start_time, **kw)

    run_mod._run_fused_loop = timed_loop
    try:
        if kind == "gm":
            argv = ["--config=refil_group_matching",
                    "--env-config=group_matching", "with"]
        else:
            # bench_combat measures bf16 (the kernels' operating point);
            # compare the CLI at the same dtype
            argv = ["--config=refil", "--env-config=sc2custom", "with",
                    "scenario=3-8sz_symmetric", "compute_dtype=bfloat16"]
        argv += [
            f"batch_size_run={B}",
            f"buffer_size={max(5000 if kind != 'gm' else 2000, 2 * B)}",
            f"t_max={t_max}",
            "test_interval=100000000",  # exclude test rollouts: measure the
            "test_nepisode=8",          # training path, like bench_ours
            "log_interval=100000000",
            "runner_log_interval=100000000",
            "learner_log_interval=100000000",
            "save_model=False",
            "local_results_path=/tmp/cli_vs_bench",
        ]
        alg, env, overrides = parse_cli(argv)
        config = load_config(alg=alg, env=env, overrides=overrides)
        run_mod.run(config)
    finally:
        run_mod._run_fused_loop = orig

    # steps/s over the central 25-75% t_env window: outside it live the
    # initial jit traces / persistent-cache loads and the tail's smaller
    # dispatch programs' first loads; inside it the loop replays one already
    # -loaded program. The caller must still have warmed the persistent
    # cache (a cold first invocation measures XLA compiles, not training).
    if os.environ.get("CLI_VS_BENCH_DEBUG"):
        # per-dispatch wallclock gaps (marks inside one dispatch share a
        # timestamp): where does the time actually go?
        uniq = []
        for w, t in marks:
            if not uniq or w - uniq[-1][0] > 1e-4:
                uniq.append((w, t))
        gaps = [
            (round(b[0] - a[0], 3), a[1], b[1])
            for a, b in zip(uniq, uniq[1:])
        ]
        gaps.sort(reverse=True)
        print(f"  [debug] {len(uniq)} dispatches; largest gaps "
              f"(sec, t_env from->to): {gaps[:6]}", file=sys.stderr, flush=True)
    lo = next(m for m in marks if m[1] >= 0.25 * t_max)
    hi = next(m for m in reversed(marks) if m[1] <= 0.75 * t_max)
    (w0, t0), (w1, t1) = lo, hi
    if w1 <= w0:  # window fell inside one dispatch: use all marks instead
        (w0, t0), (w1, t1) = marks[1], marks[-1]
    return (t1 - t0) / (w1 - w0), len(marks)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "gm"
    bs = [int(b) for b in sys.argv[2:]] or [8, 512]
    import bench

    for B in bs:
        # t_max sized so the 25-75% window spans several max-size dispatches
        if kind == "gm":
            t_max = 150000 if B == 8 else 5000000
            ours = bench.bench_ours(n_blocks=30, batch_size_run=B)
        else:
            t_max = 250000 if B == 8 else 8000000
            ours = bench.bench_combat(
                n_blocks=10, batch_size_run=B
            )["combat_env_steps_per_s"]
        # pass 1 fills the persistent XLA cache (every pow2 scan length the
        # dispatch ladder uses); pass 2 is the measurement
        cli_throughput(kind, B, t_max)
        cli, n = cli_throughput(kind, B, t_max)
        print(json.dumps({
            "kind": kind, "B": B,
            "cli_env_steps_per_s": round(cli, 1),
            "bench_env_steps_per_s": round(float(ours), 1),
            "cli_over_bench": round(cli / float(ours), 3),
            "n_blocks": n,
        }), flush=True)


if __name__ == "__main__":
    main()
