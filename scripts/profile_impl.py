"""Scratch: compare xla vs pallas attention on rollout-only and full blocks.

Usage: python scripts/profile_impl.py [bsr]
"""
import sys
import time

sys.path.insert(0, ".")


def run(impl: str, bsr: int):
    import jax

    import bench
    from refil_tpu.core.pipeline import FusedPipeline
    from refil_tpu.ops.attention import set_attention_impl

    from refil_tpu.ops.attention import get_attention_impl

    args, runner, learner, state, key = bench._build(bsr)
    set_attention_impl(impl)  # after _build (which force-sets pallas on TPU)
    pipe = FusedPipeline(runner, learner, args.buffer_size, args)
    ps = pipe.init_state(state, key)
    for _ in range(pipe.warmup_blocks()):
        ps, _ = pipe.block(ps, train=False)

    out = {}
    # everything below traces lazily; the timed programs must see `impl`
    assert get_attention_impl() == impl, (get_attention_impl(), impl)
    for train in (False, True):
        ps, _ = pipe.run_blocks(ps, 10, train=train)
        ps = jax.block_until_ready(ps)
        t0 = time.perf_counter()
        ps, _ = pipe.run_blocks(ps, 10, train=train)
        ps = jax.block_until_ready(ps)
        out["full" if train else "rollout"] = (time.perf_counter() - t0) / 10
    return out


def main():
    bsr = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    for impl in ("xla", "pallas"):
        r = run(impl, bsr)
        print(
            f"impl={impl} bsr={bsr}: rollout {r['rollout']*1e3:.1f} ms, "
            f"full {r['full']*1e3:.1f} ms (train ~{(r['full']-r['rollout'])*1e3:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
