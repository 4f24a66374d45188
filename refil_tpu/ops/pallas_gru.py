"""Fused Pallas TPU kernel for the GRU time scan.

The reference runs its GRU as a python loop over timesteps
(``entity_rnn_agent.py:51-55``); the XLA port uses ``lax.scan``, which still
dispatches one tiny (R, H) x (H, 3H) recurrent matmul per step with the
input-side projection re-issued inside the scan body. The r3 profile puts the
GRU at ~14% of the combat train step (``results/perf_matrix_r3.txt``:
gru_alone 2.7 ms fwd / 4.4 ms fwd+bwd at rows=768, T=151, H=64).

This kernel runs the WHOLE sequence in one ``pallas_call``:

  * the input-side projection ``xw = x @ W_i + b_i`` is hoisted OUT of the
    recurrence and computed as one large MXU matmul in XLA (the scan body
    cannot hoist it — ``x_t`` is a scan operand there);
  * the recurrence itself is a sequential grid over ``(row_tiles, T)`` with
    rows as the OUTER (slow) dimension: each row tile runs its full T-step
    recurrence before the next tile starts, so the hidden state lives in one
    per-tile VMEM scratch (f32 carry) that persists across the T inner grid
    steps; the recurrent weights stay resident in VMEM; per-step HBM traffic
    is exactly one ``xw_t`` row-tile block in and one ``h_t`` block out,
    double-buffered by the Pallas pipeline. Row tiling bounds the per-step
    VMEM footprint for ANY row count (r4 capped the kernel at 8192 rows
    because the untiled (1, R, 3H) block busts VMEM at R = 32768).

The recurrent matmuls run in f32 (weights are NOT cast to the bf16
activation dtype): the pre-r4 ``nn.RNN(GRUCell)`` stack promoted the gate
matmuls to f32, and over 151-step BPTT a bf16 recurrence is a silent
numerics change (ADVICE r4). Only the hoisted input projection — the big
MXU matmul — runs in the activation dtype.

Backward is a second kernel over the REVERSED grid: it recomputes the cheap
gate elementwise math from the saved ``(xw, hs)`` residuals (no extra
activation memory beyond the forward outputs), carries ``dh`` in scratch, and
accumulates ``dW_h``/``db_hn`` across the sequential grid like the attention
backward does (``ops/pallas_attn.py``).

Gate math matches ``flax.linen.GRUCell`` exactly (the torch-parity cell used
by the agents, with the torch-default U(-1/sqrt(H), 1/sqrt(H)) init):

  r = sigmoid(xw_r + h @ W_hr)          # no hidden bias on r/z in flax
  z = sigmoid(xw_z + h @ W_hz)
  n = tanh(xw_n + r * (h @ W_hn + b_hn))
  h' = (1 - z) * n + z * h

Verified against ``gru_sequence_xla`` (the lax.scan reference) including
gradients, ``tests/test_pallas_gru.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # Pallas TPU is unavailable on some CPU-only builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


_GRU_IMPL = "xla"
_INTERPRET = False  # tests flip this to run the kernel on CPU


def set_gru_impl(impl: str) -> None:
    global _GRU_IMPL
    assert impl in ("pallas", "xla"), impl
    _GRU_IMPL = impl


def get_gru_impl() -> str:
    return _GRU_IMPL


def configure_gru_impl(use_pallas: bool) -> str:
    """Single decision point, mirroring ``configure_attention_impl``: the
    kernel runs only when requested AND a non-CPU backend is live."""
    impl = (
        "pallas"
        if use_pallas and PALLAS_AVAILABLE and jax.default_backend() != "cpu"
        else "xla"
    )
    set_gru_impl(impl)
    return impl


# ----------------------------------------------------------------------
def gru_sequence_xla(xw, wh, bhn, h0):
    """lax.scan reference. ``xw``: (T, R, 3H) precomputed input projection
    (incl. its biases), ``wh``: (H, 3H) recurrent kernels [hr | hz | hn],
    ``bhn``: (H,), ``h0``: (R, H). Returns hs (T, R, H)."""
    H = h0.shape[-1]

    def step(h, xw_t):
        # h is the f32 carry; wh arrives f32 (layers.py does not cast it to
        # the activation dtype) so the recurrent matmul runs in f32, matching
        # the pre-r4 nn.RNN(GRUCell) promotion semantics
        gh = h @ wh.astype(jnp.float32)
        r = jax.nn.sigmoid(xw_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(xw_t[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(xw_t[:, 2 * H :] + r * (gh[:, 2 * H :] + bhn))
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0.astype(jnp.float32), xw)
    return hs.astype(xw.dtype)


# ----------------------------------------------------------------------
def _fwd_kernel(xw_ref, wh_ref, bhn_ref, h0_ref, hs_ref, h_scr):
    # grid = (row_tiles, T): program_id(0) = row tile (outer), (1) = t (inner)
    H = h_scr.shape[-1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scr[:] = h0_ref[:].astype(jnp.float32)

    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    h = h_scr[:]
    # recurrent matmul in f32 (wh arrives f32; h is the f32 carry)
    gh = dot(h, wh_ref[:], (((1,), (0,)), ((), ())))  # (Rt, 3H) f32
    xw = xw_ref[0].astype(jnp.float32)
    r = jax.nn.sigmoid(xw[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(xw[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(xw[:, 2 * H :] + r * (gh[:, 2 * H :] + bhn_ref[0]))
    h_new = (1.0 - z) * n + z * h
    h_scr[:] = h_new
    hs_ref[0] = h_new.astype(hs_ref.dtype)


def _bwd_kernel(xw_ref, g_ref, hprev_ref, h0_ref, wh_ref, bhn_ref,
                dxw_ref, dwh_ref, dbhn_ref, dh0_ref, dh_scr, *, T: int):
    # grid = (row_tiles, T): program_id(0) = row tile (outer),
    # program_id(1) = i with t = T - 1 - i (inner, reversed time)
    H = dh_scr.shape[-1]
    rt = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((i == 0) & (rt == 0))
    def _init_acc():
        # the weight-grad blocks have a constant index map, so they stay
        # resident in VMEM and accumulate across the WHOLE (row_tiles, T)
        # grid; zero them once at the very first grid step
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbhn_ref[:] = jnp.zeros_like(dbhn_ref)

    @pl.when(i == 0)
    def _init_carry():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    # h_{t-1}: the saved hs block at t-1, except at t=0 where it is h0
    h_prev = jnp.where(i == T - 1, h0_ref[:].astype(jnp.float32),
                       hprev_ref[0].astype(jnp.float32))

    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    # recompute the gates (cheap: one f32 matmul + elementwise)
    gh = dot(h_prev, wh_ref[:], (((1,), (0,)), ((), ())))
    xw = xw_ref[0].astype(jnp.float32)
    bhn = bhn_ref[0]
    r = jax.nn.sigmoid(xw[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(xw[:, H : 2 * H] + gh[:, H : 2 * H])
    ghn_b = gh[:, 2 * H :] + bhn
    n = jnp.tanh(xw[:, 2 * H :] + r * ghn_b)

    dh = g_ref[0].astype(jnp.float32) + dh_scr[:]
    dz = dh * (h_prev - n)
    dn = dh * (1.0 - z)
    dpre_n = dn * (1.0 - n * n)
    da_hn = dpre_n * r  # grad wrt (h @ W_hn + b_hn)
    dr = dpre_n * ghn_b
    dpre_r = dr * r * (1.0 - r)
    dpre_z = dz * z * (1.0 - z)

    dxw = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)  # (Rt, 3H) f32
    dxw_ref[0] = dxw.astype(dxw_ref.dtype)
    dgh = jnp.concatenate([dpre_r, dpre_z, da_hn], axis=-1)  # f32
    # dh_{t-1} = dh * z + dgh @ W_h^T
    dh_prev = dh * z + dot(dgh, wh_ref[:], (((1,), (1,)), ((), ())))
    dh_scr[:] = dh_prev
    # weight grads accumulate across the sequential grid (race-free on TPU)
    dwh_ref[:] += dot(
        h_prev, dgh, (((0,), (0,)), ((), ()))
    )  # h_prev^T @ dgh
    dbhn_ref[:] += da_hn.sum(0, keepdims=True)

    @pl.when(i == T - 1)
    def _last():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)


# Row-tile sizes. Chosen so the per-grid-step VMEM working set (double-
# buffered streamed blocks + the f32 carry scratch + resident weights) stays
# well under the ~16MB budget for BOTH f32 and bf16 activations; the backward
# streams ~3x the forward's bytes per step (xw + g + hprev in, f32 dxw out),
# hence the smaller tile (ADVICE r4: one shared cap let a forward-safe width
# bust VMEM in the f32 backward). At H=64 f32: fwd ~2.6KB/row -> 2048 rows
# ~5.3MB; bwd ~4.9KB/row -> 1024 rows ~5MB.
_ROW_TILE_FWD = 2048
_ROW_TILE_BWD = 1024


def _tile_rows(R, tile):
    """Padded row count and tile size: a single padded-to-8 tile when R fits
    in one tile, else pad R up to a multiple of ``tile`` (<= tile-1 waste;
    padded rows carry zero xw/g and provably contribute zero to every
    gradient accumulation — dh stays identically 0 there)."""
    if R <= tile:
        Rp = R + (-R) % 8
        return Rp, Rp
    return R + (-R) % tile, tile


def _pad_rows(x, Rp):
    R = x.shape[1] if x.ndim == 3 else x.shape[0]
    if R == Rp:
        return x
    width = [(0, 0)] * x.ndim
    width[1 if x.ndim == 3 else 0] = (0, Rp - R)
    return jnp.pad(x, width)


def _pallas_fwd(xw, wh, bhn, h0):
    T, R, H3 = xw.shape
    H = h0.shape[-1]
    cdt = xw.dtype
    Rp, Rt = _tile_rows(R, _ROW_TILE_FWD)
    xw_p = _pad_rows(xw, Rp)
    h0_p = _pad_rows(h0, Rp)
    hs = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((T, Rp, H), cdt),
        grid=(Rp // Rt, T),  # rows OUTER, time inner (carry per row tile)
        in_specs=[
            pl.BlockSpec((1, Rt, H3), lambda r, t: (t, r, 0)),
            pl.BlockSpec((H, H3), lambda r, t: (0, 0)),
            pl.BlockSpec((1, H), lambda r, t: (0, 0)),
            pl.BlockSpec((Rt, H), lambda r, t: (r, 0)),
        ],
        out_specs=pl.BlockSpec((1, Rt, H), lambda r, t: (t, r, 0)),
        scratch_shapes=[pltpu.VMEM((Rt, H), jnp.float32)],
        interpret=_INTERPRET,
    )(xw_p, wh.astype(jnp.float32), bhn.reshape(1, H).astype(jnp.float32),
      h0_p)
    return hs[:, :R]


def _pallas_bwd(xw, hs, h0, wh, bhn, g):
    T, R, H3 = xw.shape
    H = h0.shape[-1]
    Rp, Rt = _tile_rows(R, _ROW_TILE_BWD)
    xw_p = _pad_rows(xw, Rp)
    hs_p = _pad_rows(hs, Rp)
    g_p = _pad_rows(g, Rp)
    h0_p = _pad_rows(h0, Rp)
    dxw, dwh, dbhn, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((T, Rp, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((Rp, H), jnp.float32),
        ),
        grid=(Rp // Rt, T),  # rows OUTER, reversed time inner
        in_specs=[
            pl.BlockSpec((1, Rt, H3), lambda r, i: (T - 1 - i, r, 0)),
            pl.BlockSpec((1, Rt, H), lambda r, i: (T - 1 - i, r, 0)),
            # h_{t-1} block; clamped at t=0 (the kernel substitutes h0 there)
            pl.BlockSpec(
                (1, Rt, H), lambda r, i: (jnp.maximum(T - 2 - i, 0), r, 0)
            ),
            pl.BlockSpec((Rt, H), lambda r, i: (r, 0)),
            pl.BlockSpec((H, H3), lambda r, i: (0, 0)),
            pl.BlockSpec((1, H), lambda r, i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, Rt, H3), lambda r, i: (T - 1 - i, r, 0)),
            pl.BlockSpec((H, H3), lambda r, i: (0, 0)),
            pl.BlockSpec((1, H), lambda r, i: (0, 0)),
            pl.BlockSpec((Rt, H), lambda r, i: (r, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((Rt, H), jnp.float32)],
        interpret=_INTERPRET,
    )(xw_p, g_p, hs_p, h0_p, wh.astype(jnp.float32),
      bhn.reshape(1, H).astype(jnp.float32))
    return dxw[:, :R], dwh, dbhn.reshape(H), dh0[:R]


@jax.custom_vjp
def pallas_gru(xw, wh, bhn, h0):
    """Fused GRU sequence: (T, R, 3H) input projection -> (T, R, H) hidden
    states. Semantics of ``gru_sequence_xla``."""
    return _pallas_fwd(xw, wh, bhn, h0)


def _vjp_fwd(xw, wh, bhn, h0):
    hs = _pallas_fwd(xw, wh, bhn, h0)
    return hs, (xw, hs, h0, wh, bhn)


def _vjp_bwd(res, g):
    xw, hs, h0, wh, bhn = res
    dxw, dwh, dbhn, dh0 = _pallas_bwd(xw, hs, h0, wh, bhn, g)
    return (
        dxw.astype(xw.dtype),
        dwh.astype(wh.dtype),
        dbhn.astype(bhn.dtype),
        dh0.astype(h0.dtype),
    )


pallas_gru.defvjp(_vjp_fwd, _vjp_bwd)


def gru_sequence(xw, wh, bhn, h0):
    """Impl-dispatching entry: the fused kernel when configured AND the
    shape profits from it — a T=1 call (the rollout step path) has no
    recurrence to fuse. Row tiling bounds VMEM at any width, so there is no
    row cap (r4's _MAX_KERNEL_ROWS=8192 gate is gone)."""
    if _GRU_IMPL == "pallas" and xw.shape[0] > 1:
        return pallas_gru(xw, wh, bhn, h0)
    return gru_sequence_xla(xw, wh, bhn, h0)
