"""TPU smoke + micro-benchmark for the fused Pallas GRU kernel
(ops/pallas_gru.py) at the flagship combat train shapes (T=151, R=768, H=64;
R = 3-tiled imagine batch x n_agents).

Correctness: kernel vs lax.scan reference, fwd and full VJP, f32 and bf16.
Timing: chained calls (each iteration's h0 is the previous hs[-1], so
iterations cannot overlap or be elided) with a single value fetch at the end
— never block_until_ready (unreliable over the axon tunnel, CLAUDE.md).

Usage: python scripts/gru_tpu_check.py [T R H iters]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import refil_tpu.ops.pallas_gru as pg

T = int(sys.argv[1]) if len(sys.argv) > 1 else 151
R = int(sys.argv[2]) if len(sys.argv) > 2 else 768
H = int(sys.argv[3]) if len(sys.argv) > 3 else 64
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 30


def data(dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    xw = jax.random.normal(ks[0], (T, R, 3 * H), jnp.float32).astype(dtype)
    wh = (jax.random.normal(ks[1], (H, 3 * H), jnp.float32) / np.sqrt(H)).astype(dtype)
    bhn = jax.random.normal(ks[2], (H,), jnp.float32) * 0.1
    h0 = jax.random.normal(ks[3], (R, H), jnp.float32) * 0.3
    return xw, wh, bhn, h0


def check(dtype, rtol, atol):
    xw, wh, bhn, h0 = data(dtype)
    ref = jax.jit(pg.gru_sequence_xla)(xw, wh, bhn, h0)
    out = jax.jit(pg.pallas_gru)(xw, wh, bhn, h0)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"[{dtype}] fwd max abs err: {err:.2e}")
    assert err < atol + rtol * float(jnp.max(jnp.abs(ref))), err

    def loss(fn, *a):
        return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    # grads tolerate more: the MXU's default-precision matmuls accumulate
    # differently through XLA's autodiff order vs the kernel's recompute
    # order over T=151 BPTT steps (~1e-3 relative at f32; fwd is bit-exact)
    g_ref = jax.jit(jax.grad(lambda *a: loss(pg.gru_sequence_xla, *a), argnums=(0, 1, 2, 3)))(xw, wh, bhn, h0)
    g_pal = jax.jit(jax.grad(lambda *a: loss(pg.pallas_gru, *a), argnums=(0, 1, 2, 3)))(xw, wh, bhn, h0)
    for a, b, name in zip(g_pal, g_ref, ("dxw", "dwh", "dbhn", "dh0")):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        print(f"[{dtype}] {name} max abs err: {e:.2e} (scale {scale:.1f})")
        assert e < max(0.01, 100 * rtol) * scale, (name, e)


def bench(fn_name, fn, dtype):
    xw, wh, bhn, h0 = data(dtype)
    jfn = jax.jit(fn)
    hs = jfn(xw, wh, bhn, h0)
    float(hs.sum())  # force compile + first run
    t0 = time.perf_counter()
    for _ in range(ITERS):
        hs = jfn(xw, wh, bhn, h0)
        h0 = hs[-1].astype(h0.dtype)  # serialize iterations
    _ = float(hs.sum())  # value read forces full completion
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{fn_name} [{dtype}] fwd: {dt*1e3:.2f} ms")
    return dt


def bench_grad(fn_name, fn, dtype):
    xw, wh, bhn, h0 = data(dtype)

    def loss(xw, wh, bhn, h0):
        return jnp.sum(fn(xw, wh, bhn, h0).astype(jnp.float32) ** 2)

    jfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    g = jfn(xw, wh, bhn, h0)
    float(g[1].sum())
    t0 = time.perf_counter()
    for _ in range(ITERS):
        g = jfn(xw, wh, bhn, h0)
        h0 = h0 + 0.0 * g[3]  # serialize
    _ = float(g[1].sum())
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{fn_name} [{dtype}] fwd+bwd: {dt*1e3:.2f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    check(jnp.float32, 1e-5, 1e-5)
    check(jnp.bfloat16, 2e-2, 1e-2)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = bench("xla   ", pg.gru_sequence_xla, dtype)
        p = bench("pallas", pg.pallas_gru, dtype)
        print(f"  fwd speedup [{dtype}]: {x/p:.2f}x")
        xg = bench_grad("xla   ", pg.gru_sequence_xla, dtype)
        pg_ = bench_grad("pallas", pg.pallas_gru, dtype)
        print(f"  fwd+bwd speedup [{dtype}]: {xg/pg_:.2f}x")


if __name__ == "__main__":
    main()
