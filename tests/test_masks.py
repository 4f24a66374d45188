"""Imagine-mask algebra vs the reference's uint8 arithmetic re-expressed in
numpy (``entity_rnn_agent.py:79-126`` / ``entity_ff_agent.py:72-135``)."""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.ops import masks as M


def _np_logical_not(x):
    return 1 - x


def _np_logical_or(a, b):
    out = a + b
    out[out > 1] = 1
    return out


def _np_entitymask2attnmask(em):
    # reference entity_rnn_agent.py:79-85 (batch of (T, Ne))
    bs, ts, ne = em.shape
    inp = (1 - em.astype(np.float32)).reshape(bs * ts, ne, 1)
    attn = 1 - np.matmul(inp, inp.transpose(0, 2, 1))
    return attn.reshape(bs, ts, ne, ne).astype(np.uint8)


def test_entitymask2attnmask_matches_reference_math():
    rng = np.random.RandomState(0)
    em = rng.randint(0, 2, size=(4, 3, 6)).astype(np.uint8)
    ref = _np_entitymask2attnmask(em)
    ours = np.asarray(M.entitymask2attnmask(jnp.asarray(em, bool))).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_imagine_masks_match_reference_composition():
    """Feed a fixed bipartition through both the reference uint8 pipeline and
    our boolean pipeline; all four output masks must agree."""
    rng = np.random.RandomState(1)
    B, T, Ne, Na = 3, 4, 6, 6
    entity_mask = rng.randint(0, 2, (B, T, Ne)).astype(np.uint8)
    obs_mask = rng.randint(0, 2, (B, T, Ne, Ne)).astype(np.uint8)
    groupA = rng.randint(0, 2, (B, 1, Ne)).astype(np.uint8)

    # ---- reference math (entity_rnn_agent.py:94-117) ----
    em0 = entity_mask[:, [0]]
    gA = _np_logical_or(groupA.copy(), em0)
    gB = _np_logical_or(_np_logical_not(groupA), em0)
    Amask = _np_entitymask2attnmask(gA)
    Bmask = _np_entitymask2attnmask(gB)
    interact = _np_logical_or(_np_logical_not(Amask), _np_logical_not(Bmask))
    within = _np_logical_not(interact)
    active = _np_entitymask2attnmask(em0)
    W_noobs = _np_logical_or(within.copy(), active)
    I_noobs = _np_logical_or(interact.copy(), active)
    within_obs = _np_logical_or(within, obs_mask)
    interact_obs = _np_logical_or(interact, obs_mask)

    # ---- ours: replicate the partition deterministically ----
    em_j = jnp.asarray(entity_mask, bool)
    om_j = jnp.asarray(obs_mask, bool)
    gA_j = jnp.asarray(groupA, bool) | em_j[:, 0:1]
    gB_j = (~jnp.asarray(groupA, bool)) | em_j[:, 0:1]
    maskA = M.entitymask2attnmask(gA_j)
    maskB = M.entitymask2attnmask(gB_j)
    interact_j = (~maskA) | (~maskB)
    within_j = ~interact_j
    active_j = M.entitymask2attnmask(em_j[:, 0:1])

    np.testing.assert_array_equal(np.asarray(within_j).astype(np.uint8), within)
    np.testing.assert_array_equal(
        np.asarray(within_j | active_j).astype(np.uint8), W_noobs
    )
    np.testing.assert_array_equal(
        np.asarray(interact_j | active_j).astype(np.uint8), I_noobs
    )
    np.testing.assert_array_equal(
        np.asarray(within_j | om_j).astype(np.uint8), within_obs
    )
    np.testing.assert_array_equal(
        np.asarray(interact_j | om_j).astype(np.uint8), interact_obs
    )


def test_build_imagine_masks_shapes_and_partition_property():
    key = jax.random.PRNGKey(0)
    B, T, Ne, Na = 4, 5, 7, 3
    em = jnp.zeros((B, T, Ne), bool).at[:, :, -1].set(True)  # last slot inactive
    om = jnp.zeros((B, T, Ne, Ne), bool)
    out = M.build_imagine_masks(key, om, em, Na, agent_rows=False)
    assert out.within.shape == (B, T, Ne, Ne)
    assert out.w_noobs.shape == (B, T, Ne, Ne)
    w = np.asarray(out.within[:, 0])
    i = np.asarray(out.interact[:, 0])
    # partition property: among active entities, every pair is either within
    # or interact, never both, never neither
    act = slice(0, Ne - 1)
    assert not (w[:, act, act] & i[:, act, act]).any()
    assert (w[:, act, act] | i[:, act, act]).all()
    # inactive slots are blocked in the mixer masks
    assert np.asarray(out.w_noobs)[:, :, :, -1].all()
    assert np.asarray(out.i_noobs)[:, :, -1, :].all()


def test_gt_factor_paths():
    key = jax.random.PRNGKey(0)
    B, T, Ne, Na = 2, 3, 5, 5
    em = jnp.zeros((B, T, Ne), bool)
    om = jnp.zeros((B, T, Ne, Ne), bool)
    rng = np.random.RandomState(3)
    gt = jnp.asarray(rng.randint(0, 2, (B, T, Na, Ne)), bool)
    out = M.build_imagine_masks(
        key, om, em, Na, agent_rows=True, gt_mask=gt, use_gt_factors=True
    )
    np.testing.assert_array_equal(np.asarray(out.within), np.asarray(gt))
    np.testing.assert_array_equal(np.asarray(out.interact), ~np.asarray(gt))
    # rand_gt: within ⊇ gt blocking (blocked if either blocks)
    out2 = M.build_imagine_masks(
        key, om, em, Na, agent_rows=True, gt_mask=gt, use_rand_gt_factors=True
    )
    assert (np.asarray(out2.within) | ~np.asarray(gt)).all()
