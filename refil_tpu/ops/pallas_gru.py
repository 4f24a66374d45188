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
  * the recurrence itself is a sequential grid over T. The hidden state
    lives in a VMEM scratch (f32 carry) that persists across grid steps; the
    recurrent weights stay resident in VMEM; per-step HBM traffic is exactly
    one ``xw_t`` block in and one ``h_t`` block out, double-buffered by the
    Pallas pipeline.

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
        gh = h @ wh  # promotes to f32 like flax's Dense on f32 params
        r = jax.nn.sigmoid(xw_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(xw_t[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(xw_t[:, 2 * H :] + r * (gh[:, 2 * H :] + bhn))
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0.astype(jnp.float32), xw)
    return hs.astype(xw.dtype)


# ----------------------------------------------------------------------
def _fwd_kernel(xw_ref, wh_ref, bhn_ref, h0_ref, hs_ref, h_scr):
    H = h_scr.shape[-1]
    cdt = xw_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = h0_ref[:].astype(jnp.float32)

    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    h = h_scr[:]
    gh = dot(h.astype(cdt), wh_ref[:], (((1,), (0,)), ((), ())))  # (R, 3H) f32
    xw = xw_ref[0].astype(jnp.float32)
    r = jax.nn.sigmoid(xw[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(xw[:, H : 2 * H] + gh[:, H : 2 * H])
    n = jnp.tanh(xw[:, 2 * H :] + r * (gh[:, 2 * H :] + bhn_ref[0].astype(jnp.float32)))
    h_new = (1.0 - z) * n + z * h
    h_scr[:] = h_new
    hs_ref[0] = h_new.astype(hs_ref.dtype)


def _bwd_kernel(xw_ref, g_ref, hprev_ref, h0_ref, wh_ref, bhn_ref,
                dxw_ref, dwh_ref, dbhn_ref, dh0_ref, dh_scr, *, T: int):
    H = dh_scr.shape[-1]
    cdt = xw_ref.dtype
    i = pl.program_id(0)  # t = T - 1 - i

    @pl.when(i == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbhn_ref[:] = jnp.zeros_like(dbhn_ref)

    # h_{t-1}: the saved hs block at t-1, except at t=0 where it is h0
    h_prev = jnp.where(i == T - 1, h0_ref[:].astype(jnp.float32),
                       hprev_ref[0].astype(jnp.float32))

    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    # recompute the gates (cheap: one matmul + elementwise)
    gh = dot(h_prev.astype(cdt), wh_ref[:], (((1,), (0,)), ((), ())))
    xw = xw_ref[0].astype(jnp.float32)
    bhn = bhn_ref[0].astype(jnp.float32)
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

    dxw = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)  # (R, 3H) f32
    dxw_ref[0] = dxw.astype(dxw_ref.dtype)
    dgh = jnp.concatenate([dpre_r, dpre_z, da_hn], axis=-1).astype(cdt)
    # dh_{t-1} = dh * z + dgh @ W_h^T
    dh_prev = dh * z + dot(dgh, wh_ref[:], (((1,), (1,)), ((), ())))
    dh_scr[:] = dh_prev
    # weight grads accumulate across the sequential grid (race-free on TPU)
    dwh_ref[:] += dot(
        h_prev.astype(cdt), dgh, (((0,), (0,)), ((), ()))
    )  # h_prev^T @ dgh
    dbhn_ref[:] += da_hn.sum(0, keepdims=True)

    @pl.when(i == T - 1)
    def _last():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)


def _pad_rows(x, mult=8):
    R = x.shape[1] if x.ndim == 3 else x.shape[0]
    pad = (-R) % mult
    if pad == 0:
        return x, R
    width = [(0, 0)] * x.ndim
    width[1 if x.ndim == 3 else 0] = (0, pad)
    return jnp.pad(x, width), R


def _pallas_fwd(xw, wh, bhn, h0):
    T, R, H3 = xw.shape
    H = h0.shape[-1]
    cdt = xw.dtype
    xw_p, R0 = _pad_rows(xw)
    h0_p, _ = _pad_rows(h0)
    Rp = xw_p.shape[1]
    hs = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((T, Rp, H), cdt),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Rp, H3), lambda t: (t, 0, 0)),
            pl.BlockSpec((H, H3), lambda t: (0, 0)),
            pl.BlockSpec((1, H), lambda t: (0, 0)),
            pl.BlockSpec((Rp, H), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Rp, H), lambda t: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((Rp, H), jnp.float32)],
        interpret=_INTERPRET,
    )(xw_p, wh.astype(cdt), bhn.reshape(1, H).astype(cdt), h0_p)
    return hs[:, :R0]


def _pallas_bwd(xw, hs, h0, wh, bhn, g):
    T, R, H3 = xw.shape
    H = h0.shape[-1]
    cdt = xw.dtype
    xw_p, R0 = _pad_rows(xw)
    hs_p, _ = _pad_rows(hs)
    g_p, _ = _pad_rows(g)
    h0_p, _ = _pad_rows(h0)
    Rp = xw_p.shape[1]
    dxw, dwh, dbhn, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((T, Rp, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((Rp, H), jnp.float32),
        ),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Rp, H3), lambda i: (T - 1 - i, 0, 0)),
            pl.BlockSpec((1, Rp, H), lambda i: (T - 1 - i, 0, 0)),
            # h_{t-1} block; clamped at t=0 (the kernel substitutes h0 there)
            pl.BlockSpec(
                (1, Rp, H), lambda i: (jnp.maximum(T - 2 - i, 0), 0, 0)
            ),
            pl.BlockSpec((Rp, H), lambda i: (0, 0)),
            pl.BlockSpec((H, H3), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, Rp, H3), lambda i: (T - 1 - i, 0, 0)),
            pl.BlockSpec((H, H3), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((Rp, H), lambda i: (0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((Rp, H), jnp.float32)],
        interpret=_INTERPRET,
    )(xw_p, g_p, hs_p, h0_p, wh.astype(cdt), bhn.reshape(1, H).astype(cdt))
    return dxw[:, :R0], dwh, dbhn.reshape(H), dh0[:R0]


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


# the kernel keeps one (R, 3H) xw block + the (R, H) f32 carry + weights in
# VMEM; past this row count the block exceeds the ~16MB VMEM budget and
# Mosaic refuses to compile (hit at B=4096 rollouts: R = 32768)
_MAX_KERNEL_ROWS = 8192


def gru_sequence(xw, wh, bhn, h0):
    """Impl-dispatching entry: the fused kernel when configured AND the
    shape profits from it — a T=1 call (the rollout step path) has no
    recurrence to fuse, and very wide row counts exceed VMEM."""
    if (
        _GRU_IMPL == "pallas"
        and xw.shape[0] > 1
        and xw.shape[1] <= _MAX_KERNEL_ROWS
    ):
        return pallas_gru(xw, wh, bhn, h0)
    return gru_sequence_xla(xw, wh, bhn, h0)
