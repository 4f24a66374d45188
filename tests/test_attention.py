"""Property tests for the masked entity attention op.

Invariants from the reference (``src/modules/layers/attention.py``):
  * masked (unobservable) entities must not influence an agent's output;
  * agents whose pre_mask blocks ALL entities output exactly zero (NaN->0,
    ``attention.py:58-60``);
  * post-masked (inactive) agents output exactly zero and receive no gradient
    (``attention.py:66-67``);
  * only the first ``post_mask.shape[1]`` entities form queries.
"""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.modules.layers import EntityAttentionLayer, EntityPoolingLayer


def _make(B=3, Ne=6, Na=3, D=8, E=16, H=4, seed=0):
    key = jax.random.PRNGKey(seed)
    layer = EntityAttentionLayer(embed_dim=E, out_dim=E, n_heads=H)
    ents = jax.random.normal(key, (B, Ne, D))
    pre = jnp.zeros((B, Na, Ne), bool)
    post = jnp.zeros((B, Na), bool)
    params = layer.init(key, ents, pre, post)
    return layer, params, ents, pre, post


def test_masked_entity_does_not_affect_output():
    layer, params, ents, pre, post = _make()
    # block entity 5 from agent 0's view in all batches
    pre_blocked = pre.at[:, 0, 5].set(True)
    out1 = layer.apply(params, ents, pre_blocked, post)
    # perturb entity 5 wildly
    ents2 = ents.at[:, 5].add(100.0)
    out2 = layer.apply(params, ents2, pre_blocked, post)
    np.testing.assert_allclose(out1[:, 0], out2[:, 0], atol=1e-5)
    # agent 1 (not blocked) must see the change
    assert not np.allclose(out1[:, 1], out2[:, 1], atol=1e-3)


def test_fully_blocked_row_is_bias_not_nan():
    """Reference semantics (attention.py:58-65): NaN attention rows become 0,
    so a fully-blocked agent's output is exactly the out-projection bias —
    finite, input-independent — unless post-masked (then exactly 0)."""
    layer, params, ents, pre, post = _make()
    pre_all = pre.at[:, 2, :].set(True)
    out = layer.apply(params, ents, pre_all, post)
    assert np.isfinite(np.asarray(out)).all()
    bias = np.asarray(params["params"]["out_bias"])
    np.testing.assert_allclose(np.asarray(out[:, 2]), np.tile(bias, (3, 1)), atol=1e-6)
    # and input-independent
    out2 = layer.apply(params, ents + 5.0, pre_all, post)
    np.testing.assert_allclose(np.asarray(out2[:, 2]), np.asarray(out[:, 2]), atol=1e-6)


def test_post_mask_zeroes_output_and_gradient():
    layer, params, ents, pre, post = _make()
    post_blocked = post.at[:, 1].set(True)
    out = layer.apply(params, ents, pre, post_blocked)
    np.testing.assert_array_equal(np.asarray(out[:, 1]), 0.0)

    # gradient of agent-1 outputs w.r.t. entities must be zero
    def f(e):
        return (layer.apply(params, e, pre, post_blocked)[:, 1] ** 2).sum()

    g = jax.grad(f)(ents)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_n_queries_from_post_mask():
    layer, params, ents, pre, post = _make()
    out = layer.apply(params, ents, pre, post)
    assert out.shape == (3, 3, 16)
    # full-entity query variant: post mask over all entities
    post_full = jnp.zeros((3, 6), bool)
    pre_full = jnp.zeros((3, 6, 6), bool)
    out_full = layer.apply(params, ents, pre_full, post_full)
    assert out_full.shape == (3, 6, 16)
    # agent rows must agree between the two
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_full[:, :3]), atol=1e-5)


def test_attention_vs_manual_softmax():
    """Numerical check of one head against a straightforward numpy softmax."""
    B, Ne, Na, E = 1, 4, 2, 8
    key = jax.random.PRNGKey(1)
    layer = EntityAttentionLayer(embed_dim=E, out_dim=E, n_heads=1)
    ents = jax.random.normal(key, (B, Ne, E))
    pre = jnp.zeros((B, Na, Ne), bool).at[0, 0, 3].set(True)
    post = jnp.zeros((B, Na), bool)
    params = layer.init(key, ents, pre, post)
    W = np.asarray(params["params"]["in_trans"])
    Wo = np.asarray(params["params"]["out_kernel"])
    bo = np.asarray(params["params"]["out_bias"])
    e = np.asarray(ents[0])
    qkv = e @ W
    q, k, v = qkv[:, :E], qkv[:, E : 2 * E], qkv[:, 2 * E :]
    logits = q[:Na] @ k.T / np.sqrt(E)
    logits[0, 3] = -1e9
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    out_manual = (w @ v) @ Wo + bo
    out = np.asarray(layer.apply(params, ents, pre, post)[0])
    np.testing.assert_allclose(out, out_manual, rtol=2e-5, atol=1e-5)


def test_pooling_layer_masking():
    B, Ne, Na, D, E = 2, 5, 2, 6, 8
    key = jax.random.PRNGKey(2)
    for ptype in ("max", "mean"):
        layer = EntityPoolingLayer(embed_dim=E, out_dim=E, pooling_type=ptype)
        ents = jax.random.normal(key, (B, Ne, D))
        pre = jnp.zeros((B, Na, Ne), bool).at[:, 0, 4].set(True)
        post = jnp.zeros((B, Na), bool)
        params = layer.init(key, ents, pre, post)
        out1 = layer.apply(params, ents, pre, post)
        out2 = layer.apply(params, ents.at[:, 4].add(-50.0), pre, post)
        np.testing.assert_allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]), atol=1e-5)
