"""Masked entity-set attention — the core compute op of the framework.

Parity target: reference ``src/modules/layers/attention.py:6-79``
(EntityAttentionLayer) and ``:82-132`` (EntityPoolingLayer).

TPU-first design notes:
  * One fused input projection produces QKV (single (D, 3E) matmul on the MXU).
  * Queries are computed for all entities and sliced to the first ``n_queries``
    rows — the slice is free under XLA and keeps the projection a single large
    matmul instead of two.
  * Blocking uses a large negative additive constant followed by an explicit
    zeroing of fully-blocked rows. This reproduces the reference's
    ``-inf`` + NaN->0 semantics (``attention.py:57-60``) without generating
    NaNs (XLA propagates NaNs through masked lanes otherwise).
  * Head split is a reshape/transpose that XLA folds into the matmul layouts.

This is the pure functional op; the flax modules in ``modules/`` own the
parameters and call into here. A fused Pallas kernel (``ops/pallas_attn.py``)
is a drop-in replacement for the inner ``_attend``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG = -1e9  # large-negative logit for blocked pairs (finite: avoids NaN rows)

# global implementation switch, set once at startup from config
# (``use_pallas_attention``); read at trace time by the layer modules.
_IMPL = "xla"


def set_attention_impl(impl: str) -> None:
    global _IMPL
    assert impl in ("xla", "pallas"), impl
    _IMPL = impl


def get_attention_impl() -> str:
    return _IMPL


def configure_attention_impl(use_pallas: bool) -> str:
    """THE single decision point for the kernel choice: the fused Pallas
    kernel runs only when requested AND a non-CPU backend is live (on CPU it
    would run in slow interpret mode; measured 1.5-2.2x faster than XLA on
    TPU v5e, see bench history). Layers still fall back per-call when a
    caller needs ``ret_attn_logits`` (the kernel does not emit logits)."""
    impl = "pallas" if use_pallas and jax.default_backend() != "cpu" else "xla"
    set_attention_impl(impl)
    return impl


def masked_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    pre_mask: Optional[jnp.ndarray],
    n_heads: int,
    ret_logits: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Multi-head scaled dot-product attention with a blocking pre-mask.

    Args:
      query: (B, Nq, E)
      key, value: (B, Ne, E)
      pre_mask: (B, Nq, Ne) bool, True = blocked; or None.
      n_heads: number of heads; E % n_heads == 0.
      ret_logits: also return the *unmasked* per-head logits (B, H, Nq, Ne)
        (the reference returns unmasked logits, ``attention.py:68-78``).

    Returns (out (B, Nq, E), logits or None). Rows whose pre_mask blocks every
    entity produce exactly zero output (reference NaN->0, ``attention.py:60``).
    """
    B, Nq, E = query.shape
    Ne = key.shape[1]
    hd = E // n_heads
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, dtype=query.dtype))

    q = query.reshape(B, Nq, n_heads, hd).transpose(0, 2, 1, 3)  # (B,H,Nq,hd)
    k = key.reshape(B, Ne, n_heads, hd).transpose(0, 2, 1, 3)  # (B,H,Ne,hd)
    v = value.reshape(B, Ne, n_heads, hd).transpose(0, 2, 1, 3)  # (B,H,Ne,hd)

    # f32 accumulation on the MXU even under bf16 activations
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale.astype(jnp.float32)
    )  # (B,H,Nq,Ne)

    if pre_mask is not None:
        m = pre_mask[:, None, :, :]  # broadcast over heads
        masked_logits = jnp.where(m, jnp.asarray(_NEG, logits.dtype), logits)
        weights = jax.nn.softmax(masked_logits, axis=-1)
        # zero fully-blocked rows (softmax of all-_NEG is uniform, not NaN here,
        # but the reference semantics require exactly zero output rows)
        all_blocked = jnp.all(pre_mask, axis=-1)[:, None, :, None]  # (B,1,Nq,1)
        weights = jnp.where(all_blocked, jnp.zeros((), weights.dtype), weights)
    else:
        weights = jax.nn.softmax(logits, axis=-1)

    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(query.dtype)  # (B,H,Nq,hd)
    out = out.transpose(0, 2, 1, 3).reshape(B, Nq, E)
    return out, (logits if ret_logits else None)


def entity_attention(
    entities: jnp.ndarray,
    in_kernel: jnp.ndarray,
    out_kernel: jnp.ndarray,
    out_bias: jnp.ndarray,
    pre_mask: Optional[jnp.ndarray],
    post_mask: jnp.ndarray,
    n_heads: int,
    ret_attn_logits: Optional[str] = None,
):
    """Full entity-attention layer: fused QKV projection -> masked MHA ->
    output projection -> post-mask zeroing.

    Args:
      entities: (B, Ne, D) entity embeddings.
      in_kernel: (D, 3E) fused QKV projection (no bias, reference
        ``attention.py:21``).
      out_kernel, out_bias: (E, O), (O,) output projection.
      pre_mask: (B, *, Ne) bool blocking mask; rows beyond ``n_queries`` are
        ignored (reference slices ``pre_mask[:, :n_queries]``).
      post_mask: (B, Nq) bool; True rows are zeroed in the output, which also
        blocks their gradients (reference ``attention.py:66-67``). The size of
        its second dim determines the number of queries.
      ret_attn_logits: None | 'max' | 'mean' — optionally return head-reduced
        unmasked logits (B, Nq, Ne).
    """
    n_queries = post_mask.shape[1]
    E = in_kernel.shape[1] // 3
    qkv = entities @ in_kernel  # (B, Ne, 3E): one MXU matmul
    query = qkv[:, :n_queries, :E]
    key = qkv[..., E : 2 * E]
    value = qkv[..., 2 * E :]

    pm = None if pre_mask is None else pre_mask[:, :n_queries]
    out, logits = masked_attention(
        query, key, value, pm, n_heads, ret_logits=ret_attn_logits is not None
    )
    out = out @ out_kernel + out_bias
    out = jnp.where(post_mask[..., None], jnp.zeros((), out.dtype), out)

    if ret_attn_logits is not None:
        if ret_attn_logits == "max":
            logits = logits.max(axis=1)
        else:  # 'mean' / 'norm' both reduce by mean in the reference
            logits = logits.mean(axis=1)
        return out, logits
    return out


def entity_pooling(
    entities: jnp.ndarray,
    in_kernel: jnp.ndarray,
    in_bias: jnp.ndarray,
    out_kernel: jnp.ndarray,
    out_bias: jnp.ndarray,
    pre_mask: Optional[jnp.ndarray],
    post_mask: jnp.ndarray,
    pooling_type: str,
):
    """Masked max/mean pooling ablation of the attention layer
    (reference ``attention.py:82-132``).

    Note: faithfully reproduces the reference's quirks — masked entries are
    zeroed (not -inf) before max-pooling, and mean divides by the *total*
    entity count Ne, not the visible count (``attention.py:117-123``).
    """
    n_queries = post_mask.shape[1]
    x = entities @ in_kernel + in_bias  # (B, Ne, E)
    rep = jnp.broadcast_to(x[:, None], (x.shape[0], n_queries, x.shape[1], x.shape[2]))
    if pre_mask is not None:
        pm = pre_mask[:, :n_queries]
        rep = jnp.where(pm[..., None], jnp.zeros((), rep.dtype), rep)
    if pooling_type == "max":
        pooled = rep.max(axis=2)
    elif pooling_type == "mean":
        pooled = rep.mean(axis=2)
    else:
        raise ValueError(f"Unknown pooling_type {pooling_type}")
    out = pooled @ out_kernel + out_bias
    out = jnp.where(post_mask[..., None], jnp.zeros((), out.dtype), out)
    return out
