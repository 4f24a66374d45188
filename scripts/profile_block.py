"""Scratch profiler: break fused-block time into rollout vs train on TPU.

Usage: python scripts/profile_block.py [batch_size_run ...]
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax

    from bench import _build
    from refil_tpu.core.pipeline import FusedPipeline

    batches = [int(a) for a in sys.argv[1:]] or [512]
    for bsr in batches:
        args, runner, learner, state, key = _build(bsr)
        pipe = FusedPipeline(runner, learner, args.buffer_size, args)
        ps = pipe.init_state(state, key)
        for _ in range(pipe.warmup_blocks()):
            ps, _ = pipe.block(ps, train=False)

        # rollout-only blocks (barrier on the WHOLE state, same as full
        # blocks, so the two measurements are symmetric)
        ps, _ = pipe.run_blocks(ps, 10, train=False)
        ps = jax.block_until_ready(ps)
        t0 = time.perf_counter()
        ps, _ = pipe.run_blocks(ps, 10, train=False)
        ps = jax.block_until_ready(ps)
        dt_ro = (time.perf_counter() - t0) / 10

        # full blocks
        ps, _ = pipe.run_blocks(ps, 10, train=True)
        ps = jax.block_until_ready(ps)
        t0 = time.perf_counter()
        ps, _ = pipe.run_blocks(ps, 10, train=True)
        ps = jax.block_until_ready(ps)
        dt_full = (time.perf_counter() - t0) / 10

        steps = bsr * runner.env.episode_limit
        print(
            f"bsr={bsr}: rollout {dt_ro*1e3:.1f} ms, full {dt_full*1e3:.1f} ms "
            f"(train ~{(dt_full-dt_ro)*1e3:.1f} ms) -> "
            f"{steps/dt_full:,.0f} env-steps/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
