"""Fused Pallas TPU kernels for the masked entity-attention layer.

Forward: one kernel fuses the whole layer per batch tile, keeping every
intermediate in VMEM: QKV projection (MXU) -> per-head masked attention ->
output projection (MXU) -> post-mask. The XLA path (``ops/attention.py``)
materializes the (B', H, Nq, Ne) logits/weights between fusions; here they
never leave VMEM.

Entity sets are tiny (Ne ~ 8-32), so naive per-sample score matmuls are
(Nq, hd) @ (hd, Ne) — a ~2% utilization of the 128x128 MXU and the r2
profile's dominant term. This version **group-packs** G = 128//Ne samples
into one block-diagonal attention: Q of G samples stack to (G*Nq, hd), K/V
to (G*Ne, hd), ONE matmul computes all G samples' scores as the block
diagonal of a (G*Nq, G*Ne) product, cross-sample entries are masked to -1e9
before the (full 128-lane) softmax, and W @ V directly yields the per-sample
attention because the cross-sample weights are 0. G*Ne = 128 lanes exactly
for the flagship combat config (Ne=16) and Group Matching (Ne=8). Matmuls
run in the caller's compute dtype (bf16 stays bf16 on the MXU) with f32
accumulation and an f32 softmax — the r2 kernel silently upcast everything
to f32, which is why bf16 configs saw no speedup.

Backward: a second fused kernel recomputes the forward intermediates per
batch tile in VMEM (cheaper than saving them to HBM at these sizes) with the
same group packing, and produces dEntities plus the three weight gradients,
accumulated across batch tiles inside the kernel (the sequential TPU grid
makes the += race-free). Switch with ``set_backward_impl("xla")`` to fall
back to replaying XLA math (``scripts/perf_matrix.py`` measures both).

Semantics are identical to ``ops.attention.entity_attention`` (reference
``attention.py:24-79``), verified by ``tests/test_pallas_attn.py`` including
gradients vs ``jax.grad`` of the XLA implementation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .attention import entity_attention as _xla_entity_attention

try:  # Pallas TPU is unavailable on some CPU-only builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

_NEG = -1e9
_LANES = 128

# default batch-tile target (samples per grid step); configurable for tuning
_BATCH_TILE = 128


def set_batch_tile(n: int) -> None:
    global _BATCH_TILE
    _BATCH_TILE = int(n)


def _tile_geometry(Ne: int, batch_tile: int):
    """(G samples per group, SG groups per tile, TB = SG*G samples per tile).
    G packs sample blocks onto the 128-lane axis; SG sizes the tile toward
    ``batch_tile`` rows so the projection matmuls stay large."""
    G = max(1, _LANES // Ne)
    SG = max(1, -(-batch_tile // G))
    return G, SG, G * SG


def _block_diag_mask(pre_add, G):
    """(Bp, Nq, Ne) additive mask -> (Bp//G, G*Nq, G*Ne) block-diagonal
    additive mask with cross-sample entries at -1e9. Built in XLA (cheap,
    bandwidth-trivial next to the kernel's matmuls)."""
    Bp, Nq, Ne = pre_add.shape
    S = Bp // G
    eye = jnp.eye(G, dtype=bool)  # (G row-block, G col-block)
    m5 = jnp.where(
        eye[None, :, None, :, None],
        pre_add.reshape(S, G, Nq, 1, Ne),
        jnp.asarray(_NEG, jnp.float32),
    )  # (S, G, Nq, G, Ne)
    return m5.reshape(S, G * Nq, G * Ne)


def _kernel(ents_ref, wqkv_ref, wo_ref, bo_ref, mask_ref, row_ok_ref,
            post_keep_ref, out_ref, *, n_heads: int, n_queries: int, G: int):
    ents = ents_ref[:]  # (TB, Ne, D)
    TB, Ne, D = ents.shape
    SG = TB // G
    Nq = n_queries
    cdt = ents.dtype  # compute dtype: bf16 in -> bf16 MXU matmuls
    wqkv = wqkv_ref[:]  # (D, 3E)
    E = wqkv.shape[1] // 3
    hd = E // n_heads
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    bmm = lambda a, b: dot(a, b, (((2,), (1,)), ((0,), (0,))))
    bmm_t = lambda a, b: dot(a, b, (((2,), (2,)), ((0,), (0,))))  # a @ b^T

    qkv = dot(ents, wqkv, (((2,), (0,)), ((), ()))).astype(cdt)  # (TB, Ne, 3E)
    scale = 1.0 / (hd ** 0.5)
    mask = mask_ref[:]  # (SG, G*Nq, G*Ne) f32 additive

    outs = []
    for h in range(n_heads):
        # group-pack G samples: block-diagonal scores in ONE matmul
        q = qkv[:, :Nq, h * hd : (h + 1) * hd].reshape(SG, G * Nq, hd)
        k = qkv[:, :, E + h * hd : E + (h + 1) * hd].reshape(SG, G * Ne, hd)
        v = qkv[:, :, 2 * E + h * hd : 2 * E + (h + 1) * hd].reshape(
            SG, G * Ne, hd
        )
        logits = bmm_t(q, k) * scale + mask  # (SG, G*Nq, G*Ne) f32
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        # cross-sample entries carry -1e9 -> w underflows to 0 there, so
        # W @ V is exactly the per-sample attention
        attn = bmm(w.astype(cdt), v)  # (SG, G*Nq, hd) f32 accum
        outs.append(attn.reshape(TB, Nq, hd))
    attn = jnp.concatenate(outs, axis=-1)  # (TB, Nq, E) f32
    # zero fully-blocked rows (reference NaN->0, attention.py:58-60);
    # commutes with the output projection's row structure
    attn = attn * row_ok_ref[:][:, :, None]
    out = (
        dot(attn.astype(cdt), wo_ref[:], (((2,), (0,)), ((), ())))
        + bo_ref[:][None, None, :].astype(jnp.float32)
    )
    out_ref[:] = (out * post_keep_ref[:][:, :, None]).astype(out_ref.dtype)


def _prep(entities, pre_mask, post_mask, G, TB, extra=()):
    """Shared forward/backward preprocessing: additive masks, row/post keeps,
    padding to a TB multiple, block-diagonal mask build."""
    Bp, Ne, D = entities.shape
    n_queries = post_mask.shape[1]
    pm = pre_mask[:, :n_queries] if pre_mask is not None else jnp.zeros(
        (Bp, n_queries, Ne), bool
    )
    pre_add = jnp.where(pm, jnp.asarray(_NEG, jnp.float32), 0.0)
    row_ok = (~jnp.all(pm, axis=-1)).astype(jnp.float32)
    post_keep = (~post_mask).astype(jnp.float32)

    pad = (-Bp) % TB
    arrs = (entities, pre_add, row_ok, post_keep) + tuple(extra)
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0
        )
        arrs = tuple(map(z, arrs))
    entities, pre_add, row_ok, post_keep = arrs[:4]
    mask = _block_diag_mask(pre_add, G)
    return (entities, mask, row_ok, post_keep) + arrs[4:]


def _pallas_forward(entities, in_kernel, out_kernel, out_bias, pre_mask,
                    post_mask, n_heads: int, batch_tile: int = None):
    batch_tile = batch_tile or _BATCH_TILE
    Bp, Ne, D = entities.shape
    n_queries = post_mask.shape[1]
    O = out_kernel.shape[1]
    G, SG, TB = _tile_geometry(Ne, batch_tile)

    entities_p, mask, row_ok, post_keep = _prep(
        entities, pre_mask, post_mask, G, TB
    )
    Bpad = entities_p.shape[0]
    cdt = entities.dtype

    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, n_queries=n_queries, G=G),
        out_shape=jax.ShapeDtypeStruct((Bpad, n_queries, O), cdt),
        grid=(Bpad // TB,),
        in_specs=[
            pl.BlockSpec((TB, Ne, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((D, in_kernel.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((out_kernel.shape[0], O), lambda i: (0, 0)),
            pl.BlockSpec((O,), lambda i: (0,)),
            pl.BlockSpec(
                (SG, G * n_queries, G * Ne), lambda i: (i, 0, 0)
            ),
            pl.BlockSpec((TB, n_queries), lambda i: (i, 0)),
            pl.BlockSpec((TB, n_queries), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TB, n_queries, O), lambda i: (i, 0, 0)),
    )(
        entities_p,
        in_kernel.astype(cdt),
        out_kernel.astype(cdt),
        out_bias.astype(cdt),
        mask,
        row_ok,
        post_keep,
    )
    return out[:Bp]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def pallas_entity_attention(entities, in_kernel, out_kernel, out_bias,
                            pre_mask, post_mask, n_heads):
    """Drop-in fused replacement for ``ops.attention.entity_attention``
    (``ret_attn_logits`` unsupported — callers needing logits use the XLA
    path)."""
    return _pallas_forward(
        entities, in_kernel, out_kernel, out_bias, pre_mask, post_mask, n_heads
    )


# ----------------------------------------------------------------------
# Backward kernel: recompute-forward-in-VMEM with the same group packing,
# accumulate weight grads across the (sequential) batch-tile grid.

_BACKWARD_IMPL = "pallas"


def set_backward_impl(impl: str) -> None:
    global _BACKWARD_IMPL
    assert impl in ("pallas", "xla"), impl
    _BACKWARD_IMPL = impl


def _bwd_kernel(ents_ref, g_ref, wqkv_ref, wo_ref, mask_ref, row_ok_ref,
                post_keep_ref, dents_ref, dwqkv_ref, dwo_ref, dbo_ref,
                *, n_heads: int, n_queries: int, G: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    ents = ents_ref[:]  # (TB, Ne, D)
    TB, Ne, D = ents.shape
    SG = TB // G
    cdt = ents.dtype
    wqkv = wqkv_ref[:]  # (D, 3E)
    wo = wo_ref[:]  # (E, O)
    E = wqkv.shape[1] // 3
    O = wo.shape[1]
    hd = E // n_heads
    scale = 1.0 / (hd ** 0.5)
    Nq = n_queries
    row_ok = row_ok_ref[:]  # (TB, Nq)
    # out = (attn @ wo + bo) * post_keep  =>  g flows through post_keep first
    g = g_ref[:].astype(jnp.float32) * post_keep_ref[:][:, :, None]

    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    bmm = lambda a, b: dot(a, b, (((2,), (1,)), ((0,), (0,))))
    bmm_t = lambda a, b: dot(a, b, (((2,), (2,)), ((0,), (0,))))  # a @ b^T
    bmm_tl = lambda a, b: dot(a, b, (((1,), (1,)), ((0,), (0,))))  # a^T @ b

    # ---- recompute forward (grouped) ----
    qkv = dot(ents, wqkv, (((2,), (0,)), ((), ()))).astype(cdt)  # (TB, Ne, 3E)
    mask = mask_ref[:]  # (SG, G*Nq, G*Ne)
    qs, ks, vs, ws, attns = [], [], [], [], []
    for h in range(n_heads):
        q = qkv[:, :Nq, h * hd : (h + 1) * hd].reshape(SG, G * Nq, hd)
        k = qkv[:, :, E + h * hd : E + (h + 1) * hd].reshape(SG, G * Ne, hd)
        v = qkv[:, :, 2 * E + h * hd : 2 * E + (h + 1) * hd].reshape(
            SG, G * Ne, hd
        )
        logits = bmm_t(q, k) * scale + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)  # (SG, G*Nq, G*Ne) f32
        qs.append(q); ks.append(k); vs.append(v); ws.append(w)
        attns.append(bmm(w.astype(cdt), v).reshape(TB, Nq, hd))
    attn = jnp.concatenate(attns, axis=-1) * row_ok[:, :, None]  # (TB, Nq, E)

    # ---- output projection grads ----
    dwo_ref[:] += dot(
        attn.reshape(TB * Nq, E).astype(cdt), g.reshape(TB * Nq, O).astype(cdt),
        (((0,), (0,)), ((), ())),
    )  # attn^T @ g over (batch*query)
    dbo_ref[:] += g.reshape(TB * Nq, O).sum(0)
    dattn = dot(g.astype(cdt), wo, (((2,), (1,)), ((), ())))  # (TB, Nq, E) f32
    # row_ok zeroing: fold into the upstream attention gradient rows
    dattn = dattn * row_ok[:, :, None]

    # ---- per-head attention grads (grouped; cross-block w == 0 keeps all
    # products exactly per-sample) ----
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        dattn_h = (
            dattn[..., h * hd : (h + 1) * hd].reshape(SG, G * Nq, hd)
        ).astype(cdt)
        w = ws[h]
        dvs.append(
            bmm_tl(w.astype(cdt), dattn_h).reshape(TB, Ne, hd)
        )  # w^T @ dattn
        dw = bmm_t(dattn_h, vs[h])  # dattn @ v^T: (SG, G*Nq, G*Ne) f32
        # softmax VJP: dl = w * (dw - sum(dw * w))
        dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
        dl = dl.astype(cdt)
        dqs.append((bmm(dl, ks[h]) * scale).reshape(TB, Nq, hd))
        dks.append((bmm_tl(dl, qs[h]) * scale).reshape(TB, Ne, hd))
    dq = jnp.concatenate(dqs, axis=-1)  # (TB, Nq, E) f32
    # q rows beyond Nq never feed the output -> zero gradient (all-queries
    # callers like the mixer hypernets have Nq == Ne: nothing to pad, and a
    # 0-sized vector would be rejected by Mosaic)
    if Ne > Nq:
        dq_full = jnp.concatenate(
            [dq, jnp.zeros((TB, Ne - Nq, E), jnp.float32)], axis=1
        )
    else:
        dq_full = dq
    dqkv = jnp.concatenate(
        [dq_full, jnp.concatenate(dks, -1), jnp.concatenate(dvs, -1)], axis=-1
    ).astype(cdt)  # (TB, Ne, 3E)

    # ---- input projection grads ----
    dents_ref[:] = dot(dqkv, wqkv, (((2,), (1,)), ((), ()))).astype(
        dents_ref.dtype
    )  # dqkv @ wqkv^T
    dwqkv_ref[:] += dot(
        ents.reshape(TB * Ne, D), dqkv.reshape(TB * Ne, 3 * E),
        (((0,), (0,)), ((), ())),
    )


def _pallas_backward(entities, in_kernel, out_kernel, pre_mask, post_mask,
                     g, n_heads: int, batch_tile: int = None):
    batch_tile = batch_tile or min(_BATCH_TILE, 64)
    Bp, Ne, D = entities.shape
    n_queries = post_mask.shape[1]
    O = out_kernel.shape[1]
    G, SG, TB = _tile_geometry(Ne, batch_tile)
    cdt = entities.dtype

    entities_p, mask, row_ok, post_keep, g_p = _prep(
        entities, pre_mask, post_mask, G, TB, extra=(g,)
    )
    Bpad = entities_p.shape[0]

    dents, dwqkv, dwo, dbo = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_heads=n_heads, n_queries=n_queries, G=G
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bpad, Ne, D), jnp.float32),
            jax.ShapeDtypeStruct(in_kernel.shape, jnp.float32),
            jax.ShapeDtypeStruct(out_kernel.shape, jnp.float32),
            jax.ShapeDtypeStruct((O,), jnp.float32),
        ),
        grid=(Bpad // TB,),
        in_specs=[
            pl.BlockSpec((TB, Ne, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, n_queries, O), lambda i: (i, 0, 0)),
            pl.BlockSpec((D, in_kernel.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((out_kernel.shape[0], O), lambda i: (0, 0)),
            pl.BlockSpec(
                (SG, G * n_queries, G * Ne), lambda i: (i, 0, 0)
            ),
            pl.BlockSpec((TB, n_queries), lambda i: (i, 0)),
            pl.BlockSpec((TB, n_queries), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((TB, Ne, D), lambda i: (i, 0, 0)),
            # weight grads: every grid step maps to the SAME block; the
            # sequential TPU grid makes += accumulation race-free
            pl.BlockSpec(in_kernel.shape, lambda i: (0, 0)),
            pl.BlockSpec(out_kernel.shape, lambda i: (0, 0)),
            pl.BlockSpec((O,), lambda i: (0,)),
        ),
    )(
        entities_p,
        g_p,
        in_kernel.astype(cdt),
        out_kernel.astype(cdt),
        mask,
        row_ok,
        post_keep,
    )
    return dents[:Bp], dwqkv, dwo, dbo


def _fwd(entities, in_kernel, out_kernel, out_bias, pre_mask, post_mask, n_heads):
    out = _pallas_forward(
        entities, in_kernel, out_kernel, out_bias, pre_mask, post_mask, n_heads
    )
    return out, (entities, in_kernel, out_kernel, out_bias, pre_mask, post_mask)


def _bwd(n_heads, res, g):
    entities, in_kernel, out_kernel, out_bias, pre_mask, post_mask = res
    if _BACKWARD_IMPL == "pallas":
        de, dwi, dwo, dbo = _pallas_backward(
            entities, in_kernel, out_kernel, pre_mask, post_mask, g, n_heads
        )
        return (
            de.astype(entities.dtype),
            dwi.astype(in_kernel.dtype),
            dwo.astype(out_kernel.dtype),
            dbo.astype(out_bias.dtype),
            None,
            None,
        )

    # fallback: exact gradients by replaying the XLA implementation
    def f(e, wi, wo, bo):
        return _xla_entity_attention(e, wi, wo, bo, pre_mask, post_mask, n_heads)

    _, vjp = jax.vjp(f, entities, in_kernel, out_kernel, out_bias)
    de, dwi, dwo, dbo = vjp(g)
    return de, dwi, dwo, dbo, None, None


pallas_entity_attention.defvjp(_fwd, _bwd)
