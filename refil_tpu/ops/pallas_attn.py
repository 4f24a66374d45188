"""Fused Pallas TPU kernels for the masked entity-attention layer.

Forward: one kernel fuses the whole layer per batch tile, keeping every
intermediate in VMEM: QKV projection (MXU) -> per-head masked attention (VPU
softmax) -> output projection (MXU) -> post-mask. The XLA path
(``ops/attention.py``) materializes the (B', H, Nq, Ne) logits/weights between
fusions; here they never leave VMEM.

Backward: a second fused kernel recomputes the forward intermediates per batch
tile in VMEM (cheaper than saving them to HBM at these sizes) and produces
dEntities plus the three weight gradients, accumulated across batch tiles
inside the kernel (the sequential TPU grid makes the += race-free). Gradients
are exact — verified against ``jax.grad`` of the XLA implementation. Switch
with ``set_backward_impl("xla")`` to fall back to replaying XLA math
(``scripts/perf_matrix.py`` measures both).

Semantics are identical to ``ops.attention.entity_attention`` (reference
``attention.py:24-79``), verified by ``tests/test_pallas_attn.py``.

Enable per-config with ``use_pallas_attention: True``; the entity axis is tiny
(Ne ≈ 8-32) so lanes are padded — whether the fusion wins is measured by
``bench.py``, not assumed.
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


def _kernel(ents_ref, wqkv_ref, wo_ref, bo_ref, pre_add_ref, row_ok_ref,
            post_keep_ref, out_ref, *, n_heads: int, n_queries: int):
    ents = ents_ref[:]  # (TB, Ne, D)
    TB, Ne, D = ents.shape
    wqkv = wqkv_ref[:]  # (D, 3E)
    E = wqkv.shape[1] // 3
    hd = E // n_heads

    qkv = jax.lax.dot_general(
        ents, wqkv, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TB, Ne, 3E)
    scale = 1.0 / (hd ** 0.5)

    outs = []
    for h in range(n_heads):
        q = qkv[:, :n_queries, h * hd : (h + 1) * hd]  # (TB, Nq, hd)
        k = qkv[:, :, E + h * hd : E + (h + 1) * hd]  # (TB, Ne, hd)
        v = qkv[:, :, 2 * E + h * hd : 2 * E + (h + 1) * hd]
        logits = (
            jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            * scale
        )  # (TB, Nq, Ne)
        logits = logits + pre_add_ref[:]
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        # zero fully-blocked rows (reference NaN->0, attention.py:58-60)
        w = w * row_ok_ref[:][:, :, None]
        outs.append(
            jax.lax.dot_general(
                w, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        )  # (TB, Nq, hd)
    attn = jnp.concatenate(outs, axis=-1)  # (TB, Nq, E)
    out = (
        jax.lax.dot_general(
            attn, wo_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bo_ref[:][None, None, :]
    )
    out_ref[:] = out * post_keep_ref[:][:, :, None]


def _pallas_forward(entities, in_kernel, out_kernel, out_bias, pre_mask,
                    post_mask, n_heads: int, batch_tile: int = 64):
    Bp, Ne, D = entities.shape
    n_queries = post_mask.shape[1]
    O = out_kernel.shape[1]

    pm = pre_mask[:, :n_queries] if pre_mask is not None else jnp.zeros(
        (Bp, n_queries, Ne), bool
    )
    pre_add = jnp.where(pm, jnp.asarray(_NEG, jnp.float32), 0.0)
    row_ok = (~jnp.all(pm, axis=-1)).astype(jnp.float32)
    post_keep = (~post_mask).astype(jnp.float32)

    TB = min(batch_tile, Bp)
    pad = (-Bp) % TB
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0
        )
        entities, pre_add, row_ok, post_keep = map(
            z, (entities, pre_add, row_ok, post_keep)
        )
    Bpad = entities.shape[0]

    grid = (Bpad // TB,)
    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, n_queries=n_queries),
        out_shape=jax.ShapeDtypeStruct((Bpad, n_queries, O), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Ne, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((D, in_kernel.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((out_kernel.shape[0], O), lambda i: (0, 0)),
            pl.BlockSpec((O,), lambda i: (0,)),
            pl.BlockSpec((TB, n_queries, Ne), lambda i: (i, 0, 0)),
            pl.BlockSpec((TB, n_queries), lambda i: (i, 0)),
            pl.BlockSpec((TB, n_queries), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TB, n_queries, O), lambda i: (i, 0, 0)),
    )(
        entities.astype(jnp.float32),
        in_kernel.astype(jnp.float32),
        out_kernel.astype(jnp.float32),
        out_bias.astype(jnp.float32),
        pre_add,
        row_ok,
        post_keep,
    )
    # kernel math runs in f32; return the caller's compute dtype so the
    # custom-VJP dtype contract matches the XLA path (bf16 in -> bf16 out)
    return out[:Bp].astype(entities.dtype)


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
# Backward kernel: recompute-forward-in-VMEM, accumulate weight grads across
# the (sequential) batch-tile grid.

_BACKWARD_IMPL = "pallas"


def set_backward_impl(impl: str) -> None:
    global _BACKWARD_IMPL
    assert impl in ("pallas", "xla"), impl
    _BACKWARD_IMPL = impl


def _bwd_kernel(ents_ref, g_ref, wqkv_ref, wo_ref, pre_add_ref, row_ok_ref,
                post_keep_ref, dents_ref, dwqkv_ref, dwo_ref, dbo_ref,
                *, n_heads: int, n_queries: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    ents = ents_ref[:]  # (TB, Ne, D)
    TB, Ne, D = ents.shape
    wqkv = wqkv_ref[:]  # (D, 3E)
    wo = wo_ref[:]  # (E, O)
    E = wqkv.shape[1] // 3
    O = wo.shape[1]
    hd = E // n_heads
    scale = 1.0 / (hd ** 0.5)
    Nq = n_queries
    # out = (attn @ wo + bo) * post_keep  =>  g flows through post_keep first
    g = g_ref[:] * post_keep_ref[:][:, :, None]  # (TB, Nq, O)
    row_ok = row_ok_ref[:]  # (TB, Nq)

    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32
    )
    bmm = lambda a, b: dot(a, b, (((2,), (1,)), ((0,), (0,))))
    bmm_t = lambda a, b: dot(a, b, (((2,), (2,)), ((0,), (0,))))  # a @ b^T
    bmm_tl = lambda a, b: dot(a, b, (((1,), (1,)), ((0,), (0,))))  # a^T @ b

    # ---- recompute forward intermediates ----
    qkv = dot(ents, wqkv, (((2,), (0,)), ((), ())))  # (TB, Ne, 3E)
    ws, vs, qs, ks, attns = [], [], [], [], []
    for h in range(n_heads):
        q = qkv[:, :Nq, h * hd : (h + 1) * hd]
        k = qkv[:, :, E + h * hd : E + (h + 1) * hd]
        v = qkv[:, :, 2 * E + h * hd : 2 * E + (h + 1) * hd]
        logits = bmm_t(q, k) * scale + pre_add_ref[:]
        m = jnp.max(logits, axis=-1, keepdims=True)
        w = jnp.exp(logits - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)  # softmax (pre row_ok)
        wf = w * row_ok[:, :, None]
        qs.append(q); ks.append(k); vs.append(v); ws.append(w)
        attns.append(bmm(wf, v))  # (TB, Nq, hd)
    attn = jnp.concatenate(attns, axis=-1)  # (TB, Nq, E)

    # ---- output projection grads ----
    dwo_ref[:] += dot(
        attn.reshape(TB * Nq, E), g.reshape(TB * Nq, O),
        (((0,), (0,)), ((), ())),
    )  # attn^T @ g over (batch*query)
    dbo_ref[:] += g.reshape(TB * Nq, O).sum(0)
    dattn = dot(g, wo, (((2,), (1,)), ((), ())))  # g @ wo^T: (TB, Nq, E)

    # ---- per-head attention grads ----
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        dattn_h = dattn[..., h * hd : (h + 1) * hd]  # (TB, Nq, hd)
        wf = ws[h] * row_ok[:, :, None]
        dvs.append(bmm_tl(wf, dattn_h))  # wf^T @ dattn: (TB, Ne, hd)
        dwf = bmm_t(dattn_h, vs[h])  # dattn @ v^T: (TB, Nq, Ne)
        dw = dwf * row_ok[:, :, None]  # through wf = w * row_ok
        # softmax VJP: dl = w * (dw - sum(dw * w))
        dl = ws[h] * (dw - jnp.sum(dw * ws[h], axis=-1, keepdims=True))
        dqs.append(bmm(dl, ks[h]) * scale)  # (TB, Nq, hd)
        dks.append(bmm_tl(dl, qs[h]) * scale)  # dl^T @ q: (TB, Ne, hd)
    dq = jnp.concatenate(dqs, axis=-1)  # (TB, Nq, E)
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
    )  # (TB, Ne, 3E)

    # ---- input projection grads ----
    dents_ref[:] = dot(dqkv, wqkv, (((2,), (1,)), ((), ())))  # dqkv @ wqkv^T
    dwqkv_ref[:] += dot(
        ents.reshape(TB * Ne, D), dqkv.reshape(TB * Ne, 3 * E),
        (((0,), (0,)), ((), ())),
    )


def _pallas_backward(entities, in_kernel, out_kernel, pre_mask, post_mask,
                     g, n_heads: int, batch_tile: int = 64):
    Bp, Ne, D = entities.shape
    n_queries = post_mask.shape[1]
    O = out_kernel.shape[1]

    pm = pre_mask[:, :n_queries] if pre_mask is not None else jnp.zeros(
        (Bp, n_queries, Ne), bool
    )
    pre_add = jnp.where(pm, jnp.asarray(_NEG, jnp.float32), 0.0)
    row_ok = (~jnp.all(pm, axis=-1)).astype(jnp.float32)
    post_keep = (~post_mask).astype(jnp.float32)

    TB = min(batch_tile, Bp)
    pad = (-Bp) % TB
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0
        )
        entities, pre_add, row_ok, post_keep, g = map(
            z, (entities, pre_add, row_ok, post_keep, g)
        )
    Bpad = entities.shape[0]

    dents, dwqkv, dwo, dbo = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads, n_queries=n_queries),
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
            pl.BlockSpec((TB, n_queries, Ne), lambda i: (i, 0, 0)),
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
        entities.astype(jnp.float32),
        g.astype(jnp.float32),
        in_kernel.astype(jnp.float32),
        out_kernel.astype(jnp.float32),
        pre_add,
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
