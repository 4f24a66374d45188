"""Sweep the Pallas attention batch-tile size x dtype at the flagship train
shapes — isolates per-tile fixed overhead (grid steps) from matmul time.

CAVEAT: on the axon tunnel platform jax.block_until_ready can return before
device execution completes, so these times are submission-contaminated.
Use them for RELATIVE structure only; value-forced end-to-end numbers
(bench.py, scripts/perf_matrix.py) are the truth. See
results/PERF_ANALYSIS.md — the value-forced tile A/B lives there.

Usage: python scripts/tune_attn_tile.py
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from refil_tpu.ops import pallas_attn as pa

    Bp, Ne, Nq, E, H = 14496, 16, 8, 128, 4
    kk = jax.random.PRNGKey(0)
    pre = jax.random.bernoulli(kk, 0.2, (Bp, Nq, Ne))
    post = jnp.zeros((Bp, Nq), bool)

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(kk, (Bp, Ne, E), dtype)
        wqkv = (jax.random.normal(kk, (E, 3 * E)) * 0.02).astype(dtype)
        wo = (jax.random.normal(kk, (E, E)) * 0.02).astype(dtype)
        bo = jnp.zeros((E,), dtype)
        for tile in (64, 128, 256, 512):
            f = jax.jit(
                lambda *a, t=tile: pa._pallas_forward(*a, H, batch_tile=t)
            )
            try:
                out = f(x, wqkv, wo, bo, pre, post)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(20):
                    out = f(x, wqkv, wo, bo, pre, post)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / 20
                G, SG, TB = pa._tile_geometry(Ne, tile)
                print(
                    f"{dtype.__name__:9s} tile={tile:4d} (TB={TB}, "
                    f"{-(-Bp // TB)} grid steps) -> {dt*1e3:7.2f} ms",
                    flush=True,
                )
            except Exception as e:
                print(f"{dtype.__name__:9s} tile={tile:4d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
