"""GRUSequence (hoisted input projection + fused recurrence) must reproduce
the previous nn.RNN(GRUCell) stack exactly, and the Pallas kernel must match
the lax.scan reference including gradients."""
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refil_tpu.ops.pallas_gru as pg
from refil_tpu.modules.layers import GRUSequence


def _data(key, R=12, T=7, D=8, H=8):
    k1, k2, k3 = jax.random.split(key, 3)
    xs = jax.random.normal(k1, (R, T, D))
    h0 = jax.random.normal(k2, (R, H)) * 0.3
    return xs, h0


def test_gru_sequence_matches_flax_rnn_grucell():
    """Same params, same inputs: GRUSequence == nn.RNN(GRUCell) (the r3
    stack). The parameter trees are identical by construction, so the
    GRUSequence params apply directly to the reference module."""
    H, D = 8, 8
    xs, h0 = _data(jax.random.PRNGKey(0), D=D, H=H)
    gru = GRUSequence(features=H)
    params = gru.init(jax.random.PRNGKey(1), xs, h0)
    h_last, hs = gru.apply(params, xs, h0)

    bound = 1.0 / math.sqrt(H)

    def uinit(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, xs, h0):
            cell = nn.GRUCell(
                features=H, kernel_init=uinit, recurrent_kernel_init=uinit,
                bias_init=uinit, name="gru",
            )
            rnn = nn.RNN(cell, name="rnn_scan")
            return rnn(xs, initial_carry=h0, return_carry=True)

    # GRUSequence was initialized top-level; Ref nests the cell under "gru"
    h_last_ref, hs_ref = Ref().apply({"params": {"gru": params["params"]}}, xs, h0)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(h_last_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.fixture
def interpret_kernel():
    pg._INTERPRET = True
    yield
    pg._INTERPRET = False


def _raw(key, T=9, R=12, H=8):
    ks = jax.random.split(key, 4)
    xw = jax.random.normal(ks[0], (T, R, 3 * H))
    wh = jax.random.normal(ks[1], (H, 3 * H)) * (1.0 / math.sqrt(H))
    bhn = jax.random.normal(ks[2], (H,)) * 0.1
    h0 = jax.random.normal(ks[3], (R, H)) * 0.3
    return xw, wh, bhn, h0


def test_pallas_gru_forward_matches_xla(interpret_kernel):
    xw, wh, bhn, h0 = _raw(jax.random.PRNGKey(2))
    hs_ref = pg.gru_sequence_xla(xw, wh, bhn, h0)
    hs = pg.pallas_gru(xw, wh, bhn, h0)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_gru_forward_rows_not_multiple_of_8(interpret_kernel):
    xw, wh, bhn, h0 = _raw(jax.random.PRNGKey(3), R=13)
    hs_ref = pg.gru_sequence_xla(xw, wh, bhn, h0)
    hs = pg.pallas_gru(xw, wh, bhn, h0)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_gru_grads_match_xla(interpret_kernel):
    """Full custom-VJP check: d/d{xw, wh, bhn, h0} of a scalar loss over the
    whole hidden sequence, kernel vs jax.grad of the lax.scan reference."""
    xw, wh, bhn, h0 = _raw(jax.random.PRNGKey(4))
    w = jax.random.normal(jax.random.PRNGKey(5), xw.shape[:2] + (8,))

    def loss(fn, *args):
        hs = fn(*args)
        return jnp.sum(hs * w) + jnp.sum(jnp.tanh(hs)) * 0.1

    g_ref = jax.grad(lambda *a: loss(pg.gru_sequence_xla, *a), argnums=(0, 1, 2, 3))(
        xw, wh, bhn, h0
    )
    g_pal = jax.grad(lambda *a: loss(pg.pallas_gru, *a), argnums=(0, 1, 2, 3))(
        xw, wh, bhn, h0
    )
    for a, b, name in zip(g_pal, g_ref, ("dxw", "dwh", "dbhn", "dh0")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-5, err_msg=name)


def test_pallas_gru_row_tiled_matches_xla(interpret_kernel, monkeypatch):
    """R larger than the row tile exercises the (row_tiles, T) grid: per-tile
    carry re-init, cross-tile weight-grad accumulation, and row padding to a
    tile multiple (R=41 with fwd tile 16 / bwd tile 8 -> 3 fwd / 6 bwd tiles
    plus padded rows). Forward AND full custom-VJP vs the lax.scan
    reference."""
    monkeypatch.setattr(pg, "_ROW_TILE_FWD", 16)
    monkeypatch.setattr(pg, "_ROW_TILE_BWD", 8)
    xw, wh, bhn, h0 = _raw(jax.random.PRNGKey(7), R=41)
    hs_ref = pg.gru_sequence_xla(xw, wh, bhn, h0)
    hs = pg.pallas_gru(xw, wh, bhn, h0)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref),
                               rtol=1e-5, atol=1e-6)

    w = jax.random.normal(jax.random.PRNGKey(8), xw.shape[:2] + (8,))

    def loss(fn, *args):
        return jnp.sum(fn(*args) * w)

    g_ref = jax.grad(lambda *a: loss(pg.gru_sequence_xla, *a),
                     argnums=(0, 1, 2, 3))(xw, wh, bhn, h0)
    g_pal = jax.grad(lambda *a: loss(pg.pallas_gru, *a),
                     argnums=(0, 1, 2, 3))(xw, wh, bhn, h0)
    for a, b, name in zip(g_pal, g_ref, ("dxw", "dwh", "dbhn", "dh0")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-5, err_msg=name)


def test_gru_sequence_single_step(interpret_kernel):
    """T=1 (the rollout step path) works in both impls."""
    xw, wh, bhn, h0 = _raw(jax.random.PRNGKey(6), T=1)
    np.testing.assert_allclose(
        np.asarray(pg.pallas_gru(xw, wh, bhn, h0)),
        np.asarray(pg.gru_sequence_xla(xw, wh, bhn, h0)),
        rtol=1e-5, atol=1e-6,
    )
