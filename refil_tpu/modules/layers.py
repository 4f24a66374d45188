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


class _ProjParams(nn.Module):
    """Child scope holding one projection's parameters, named/shaped exactly
    like the ``flax.linen.GRUCell`` Dense children (`ir`/`iz`/`in` with bias,
    `hr`/`hz` without, `hn` with) so checkpoints interoperate with the
    previous ``nn.RNN(GRUCell)`` stack."""

    fan_in: int
    features: int
    use_bias: bool = True
    bound: Optional[float] = None

    @nn.compact
    def __call__(self):
        bound = self.bound if self.bound is not None else 1.0 / math.sqrt(self.fan_in)

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", uinit, (self.fan_in, self.features))
        bias = self.param("bias", uinit, (self.features,)) if self.use_bias else None
        return kernel, bias


class GRUSequence(nn.Module):
    """GRU over a sequence with the input projection hoisted out of the
    recurrence (one large MXU matmul instead of a per-scan-step Dense) and an
    optional fused Pallas recurrence kernel (``ops/pallas_gru.py``).

    Replaces ``nn.RNN(GRUCell)`` (reference GRU python loop,
    ``entity_rnn_agent.py:51-55``): same gate math, same parameter tree, same
    ``(h_last, hs)`` return. ``xs``: (R, T, D), ``h0``: (R, H). GRUCell's
    torch-parity init bound (1/sqrt(H) everywhere) is preserved."""

    features: int

    @nn.compact
    def __call__(self, xs, h0):
        from ..ops.pallas_gru import gru_sequence

        H = self.features
        bound = 1.0 / math.sqrt(H)
        D = xs.shape[-1]
        proj = lambda name, use_bias=True: _ProjParams(
            fan_in=D if name.startswith("i") else H,
            features=H, use_bias=use_bias, bound=bound, name=name,
        )()
        k_ir, b_ir = proj("ir")
        k_iz, b_iz = proj("iz")
        k_in, b_in = proj("in")
        k_hr, _ = proj("hr", use_bias=False)
        k_hz, _ = proj("hz", use_bias=False)
        k_hn, b_hn = proj("hn")

        wi = jnp.concatenate([k_ir, k_iz, k_in], axis=-1)  # (D, 3H)
        bi = jnp.concatenate([b_ir, b_iz, b_in], axis=-1)
        wh = jnp.concatenate([k_hr, k_hz, k_hn], axis=-1)  # (H, 3H)

        # The hoisted input projection — the big MXU matmul — runs in the
        # activation dtype (TorchLinear convention; bf16 configs keep it on
        # the bf16 MXU). The RECURRENT matmul stays f32 (wh not cast): the
        # pre-r4 nn.RNN(GRUCell) promoted it to f32, and a bf16 recurrence
        # over 151-step BPTT is a silent numerics change (ADVICE r4).
        xw = xs @ wi.astype(xs.dtype) + bi.astype(xs.dtype)  # (R, T, 3H)
        hs = gru_sequence(
            jnp.swapaxes(xw, 0, 1), wh.astype(jnp.float32),
            b_hn.astype(jnp.float32), h0,
        )  # (T, R, H)
        hs = jnp.swapaxes(hs, 0, 1)
        return hs[:, -1], hs


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
