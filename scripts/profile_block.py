"""Break down fused-block time: rollout-only vs train-only vs full block.

Usage: python scripts/profile_block.py [batch_size_run] [--trace DIR]
Prints per-stage ms/block so optimization effort lands where the time is.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _build  # noqa: E402
from refil_tpu.core.pipeline import FusedPipeline  # noqa: E402


def timeit(fn, n=20):
    fn()  # compile + warm
    jax.effects_barrier()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    args, runner, learner, state, key = _build(B)
    pipe = FusedPipeline(runner, learner, args.buffer_size, args)
    ps = pipe.init_state(state, key)
    for _ in range(pipe.warmup_blocks()):
        ps, _ = pipe.block(ps, train=False)
    ps = jax.block_until_ready(ps)

    # full block (can't donate repeatedly without replacing state; block
    # returns the new state so reassign)
    st = {"ps": ps}

    def full():
        st["ps"], stats = pipe.block(st["ps"], train=True)
        return stats["ep_lengths"]

    full_ms = timeit(full)

    def roll_only():
        st["ps"], stats = pipe.block(st["ps"], train=False)
        return stats["ep_lengths"]

    roll_ms = timeit(roll_only)

    # train_iters alone on a fixed sample
    idx = pipe._sample_idx(jax.random.PRNGKey(0), st["ps"].episodes_in_buffer)
    samples = jax.tree.map(lambda buf: buf[idx], st["ps"].buffer)
    samples = jax.block_until_ready(samples)
    train_state = st["ps"].train
    ti = jax.jit(learner._train_iters_impl)

    def train_only():
        s2, m = ti(train_state, samples, jax.random.PRNGKey(1))
        return m["loss"]

    train_ms = timeit(train_only)

    # single train step (1 of training_iters)
    one = jax.jit(learner._train_step_impl)
    b1 = jax.tree.map(lambda x: x[0], samples)

    def step_only():
        s2, m = one(train_state, b1, jax.random.PRNGKey(1))
        return m["loss"]

    step_ms = timeit(step_only)

    steps_per_block = float(jnp.asarray(B * runner.episode_limit))
    print(f"B={B} T={runner.episode_limit} iters={args.training_iters}")
    print(f"full block      : {full_ms:8.2f} ms  ({steps_per_block/full_ms*1e3:,.0f} env-steps/s)")
    print(f"rollout-only    : {roll_ms:8.2f} ms")
    print(f"train_iters x{args.training_iters} : {train_ms:8.2f} ms")
    print(f"train_step x1   : {step_ms:8.2f} ms")
    print(f"insert+sample+overhead ≈ {full_ms - roll_ms - train_ms:8.2f} ms")


if __name__ == "__main__":
    main()
