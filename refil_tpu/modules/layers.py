"""Parameterized layers (flax) wrapping the functional ops in ``refil_tpu.ops``.

Weight init reproduces torch's ``nn.Linear`` default (U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for both kernel and bias) so training dynamics track the
reference (which relies on torch defaults throughout).
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import entity_attention, entity_pooling


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Note flax kernels are (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """Dense layer with torch-default initialization."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (fan_in, self.features))
        y = x @ kernel.astype(self.dtype or x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class EntityAttentionLayer(nn.Module):
    """Set-attention over entities where only the first ``post_mask.shape[1]``
    entities form queries. Parity: reference ``attention.py:6-79``."""

    embed_dim: int
    out_dim: int
    n_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, entities, pre_mask=None, post_mask=None, ret_attn_logits=None):
        in_dim = entities.shape[-1]
        in_kernel = self.param(
            "in_trans", torch_kernel_init, (in_dim, self.embed_dim * 3)
        )
        out_kernel = self.param(
            "out_kernel", torch_kernel_init, (self.embed_dim, self.out_dim)
        )
        out_bias = self.param(
            "out_bias", torch_bias_init(self.embed_dim), (self.out_dim,)
        )
        dt = self.dtype or entities.dtype
        from ..ops.attention import get_attention_impl

        if get_attention_impl() == "pallas" and ret_attn_logits is None:
            from ..ops.pallas_attn import pallas_entity_attention

            return pallas_entity_attention(
                entities.astype(dt),
                in_kernel.astype(dt),
                out_kernel.astype(dt),
                out_bias.astype(dt),
                pre_mask,
                post_mask,
                self.n_heads,
            )
        return entity_attention(
            entities.astype(dt),
            in_kernel.astype(dt),
            out_kernel.astype(dt),
            out_bias.astype(dt),
            pre_mask,
            post_mask,
            self.n_heads,
            ret_attn_logits=ret_attn_logits,
        )


class EntityPoolingLayer(nn.Module):
    """Masked max/mean pooling ablation. Parity: reference ``attention.py:82-132``."""

    embed_dim: int
    out_dim: int
    pooling_type: str
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, entities, pre_mask=None, post_mask=None, ret_attn_logits=None):
        in_dim = entities.shape[-1]
        in_kernel = self.param("in_kernel", torch_kernel_init, (in_dim, self.embed_dim))
        in_bias = self.param("in_bias", torch_bias_init(in_dim), (self.embed_dim,))
        out_kernel = self.param(
            "out_kernel", torch_kernel_init, (self.embed_dim, self.out_dim)
        )
        out_bias = self.param(
            "out_bias", torch_bias_init(self.embed_dim), (self.out_dim,)
        )
        dt = self.dtype or entities.dtype
        out = entity_pooling(
            entities.astype(dt),
            in_kernel.astype(dt),
            in_bias.astype(dt),
            out_kernel.astype(dt),
            out_bias.astype(dt),
            pre_mask,
            post_mask,
            self.pooling_type,
        )
        if ret_attn_logits is not None:
            return out, None
        return out


def make_entity_layer(
    embed_dim: int,
    out_dim: int,
    n_heads: int,
    pooling_type: Optional[str],
    dtype=None,
    name: Optional[str] = None,
):
    """Attention layer, or pooling ablation when ``pooling_type`` is set
    (reference ``default.yaml:43`` / agent constructors)."""
    if pooling_type is None:
        return EntityAttentionLayer(
            embed_dim=embed_dim, out_dim=out_dim, n_heads=n_heads, dtype=dtype, name=name
        )
    return EntityPoolingLayer(
        embed_dim=embed_dim, out_dim=out_dim, pooling_type=pooling_type, dtype=dtype, name=name
    )
