"""Pallas fused attention vs the XLA reference implementation: bit-level
parity of outputs and exact gradients (custom VJP replays the XLA math).

Runs in Pallas interpret mode on CPU; the same kernel compiles with Mosaic on
TPU (exercised by bench/e2e runs there).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refil_tpu.ops import pallas_attn
from refil_tpu.ops.attention import entity_attention

if not pallas_attn.PALLAS_AVAILABLE:  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)

from jax.experimental.pallas import tpu as pltpu


def _inputs(Bp=10, Ne=6, Nq=3, D=12, E=16, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    ents = jax.random.normal(k[0], (Bp, Ne, D))
    wi = jax.random.normal(k[1], (D, 3 * E)) * 0.2
    wo = jax.random.normal(k[2], (E, E)) * 0.2
    bo = jax.random.normal(k[3], (E,)) * 0.1
    pre = jax.random.bernoulli(k[4], 0.3, (Bp, Nq, Ne))
    # one fully-blocked row to exercise the NaN->0 path
    pre = pre.at[0, 1, :].set(True)
    post = jax.random.bernoulli(k[5], 0.2, (Bp, Nq))
    return ents, wi, wo, bo, pre, post


def test_forward_parity_interpret():
    ents, wi, wo, bo, pre, post = _inputs()
    ref = entity_attention(ents, wi, wo, bo, pre, post, n_heads=4)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_attn.pallas_entity_attention(ents, wi, wo, bo, pre, post, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_parity_batch_padding():
    # Bp not a multiple of the batch tile
    ents, wi, wo, bo, pre, post = _inputs(Bp=70)
    ref = entity_attention(ents, wi, wo, bo, pre, post, n_heads=2)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_attn.pallas_entity_attention(ents, wi, wo, bo, pre, post, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_xla():
    ents, wi, wo, bo, pre, post = _inputs(Bp=8)

    def loss_pallas(e, a, b, c):
        out = pallas_attn.pallas_entity_attention(e, a, b, c, pre, post, 4)
        return (out ** 2).sum()

    def loss_xla(e, a, b, c):
        out = entity_attention(e, a, b, c, pre, post, 4)
        return (out ** 2).sum()

    # the backward kernel is traced at grad time: keep the whole grad call
    # inside interpret mode
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(ents, wi, wo, bo)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(ents, wi, wo, bo)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_pallas_backward_kernel_matches_xla():
    """The fused backward kernel's gradients (dEntities + all weight grads,
    accumulated across batch tiles) must match jax.grad of the XLA math."""
    for Bp, heads, seed in ((8, 4, 0), (70, 2, 1)):  # 70: exercises tile padding
        ents, wi, wo, bo, pre, post = _inputs(Bp=Bp, seed=seed)
        pallas_attn.set_backward_impl("pallas")
        try:
            def loss_pallas(e, a, b, c):
                out = pallas_attn.pallas_entity_attention(
                    e, a, b, c, pre, post, heads
                )
                return (out ** 2).sum()

            def loss_xla(e, a, b, c):
                out = entity_attention(e, a, b, c, pre, post, heads)
                return (out ** 2).sum()

            with pltpu.force_tpu_interpret_mode():
                g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(ents, wi, wo, bo)
            g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(ents, wi, wo, bo)
            for a, b in zip(g1, g2):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
                )
        finally:
            pallas_attn.set_backward_impl("pallas")


def test_backward_impl_switch_xla_replay():
    ents, wi, wo, bo, pre, post = _inputs(Bp=8)
    pallas_attn.set_backward_impl("xla")
    try:
        def loss_pallas(e):
            return (
                pallas_attn.pallas_entity_attention(
                    e, wi, wo, bo, pre, post, 4
                ) ** 2
            ).sum()

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_pallas)(ents)
        g2 = jax.grad(
            lambda e: (entity_attention(e, wi, wo, bo, pre, post, 4) ** 2).sum()
        )(ents)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
    finally:
        pallas_attn.set_backward_impl("pallas")


def test_backward_all_queries_case():
    """Mixer hypernets attend with Nq == Ne (every entity is a query): the
    backward kernel must handle the no-padding dq case."""
    k = jax.random.split(jax.random.PRNGKey(7), 6)
    Bp, Ne, D, E = 12, 6, 10, 16
    ents = jax.random.normal(k[0], (Bp, Ne, D))
    wi = jax.random.normal(k[1], (D, 3 * E)) * 0.2
    wo = jax.random.normal(k[2], (E, E)) * 0.2
    bo = jax.random.normal(k[3], (E,)) * 0.1
    pre = jax.random.bernoulli(k[4], 0.3, (Bp, Ne, Ne))
    post = jax.random.bernoulli(k[5], 0.2, (Bp, Ne))  # Nq == Ne

    def loss_p(e, a, b, c):
        return (
            pallas_attn.pallas_entity_attention(e, a, b, c, pre, post, 4) ** 2
        ).sum()

    def loss_x(e, a, b, c):
        return (entity_attention(e, a, b, c, pre, post, 4) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_p, argnums=(0, 1, 2, 3))(ents, wi, wo, bo)
    g2 = jax.grad(loss_x, argnums=(0, 1, 2, 3))(ents, wi, wo, bo)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_bfloat16_dtype_contract():
    """bf16 inputs -> bf16 output (same dtype contract as the XLA path), and
    both backward impls accept the bf16 cotangent."""
    ents, wi, wo, bo, pre, post = _inputs(Bp=8)
    cast = lambda x: x.astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_attn.pallas_entity_attention(
            cast(ents), cast(wi), cast(wo), cast(bo), pre, post, 4
        )
    assert out.dtype == jnp.bfloat16
    ref = entity_attention(cast(ents), cast(wi), cast(wo), cast(bo), pre, post, 4)
    assert ref.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.15
    )
    for impl in ("pallas", "xla"):
        pallas_attn.set_backward_impl(impl)
        try:
            def loss(e):
                return (
                    pallas_attn.pallas_entity_attention(
                        e, cast(wi), cast(wo), cast(bo), pre, post, 4
                    ).astype(jnp.float32) ** 2
                ).sum()

            with pltpu.force_tpu_interpret_mode():
                g = jax.grad(loss)(cast(ents))
            assert g.dtype == jnp.bfloat16
            assert np.isfinite(np.asarray(g, np.float32)).all()
        finally:
            pallas_attn.set_backward_impl("pallas")
