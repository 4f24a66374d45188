"""Learner math checks: hand-computed TD loss on a tiny VDN case, masking
semantics, target updates, and the imagined-loss mixing weight.

Reference: ``src/learners/q_learner.py:66-182``.
"""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.config import Args
from refil_tpu.controllers.mac import EntityMAC
from refil_tpu.learners.q_learner import QLearner


def _args(**over):
    base = dict(
        agent="entity_attend_ff",
        mixer="vdn",
        entity_scheme=True,
        entity_last_action=False,
        attn_embed_dim=16,
        attn_n_heads=2,
        rnn_hidden_dim=8,
        pooling_type=None,
        gt_obs_mask=False,
        double_q=True,
        gamma=0.99,
        lr=0.5,
        optim_alpha=0.99,
        optim_eps=1e-5,
        grad_norm_clip=10,
        weight_decay=0,
        mixing_embed_dim=8,
        hypernet_embed=16,
        softmax_mixing_weights=False,
        lmbda=0.5,
        target_update_interval=200,
        learner_log_interval=2000,
        train_gt_factors=False,
        train_rand_gt_factors=False,
    )
    base.update(over)
    return Args(**base)


def _env_info(Na=2, Ne=3, A=3, D=5):
    return {
        "n_agents": Na,
        "n_actions": A,
        "n_entities": Ne,
        "entity_shape": D,
        "episode_limit": 4,
        "gt_mask_avail": False,
    }


def _batch(key, B=3, L=5, Na=2, Ne=3, A=3, D=5):
    ks = jax.random.split(key, 3)
    return {
        "entities": jax.random.normal(ks[0], (B, L, Ne, D)),
        "obs_mask": jnp.zeros((B, L, Ne, Ne), bool),
        "entity_mask": jnp.zeros((B, L, Ne), bool),
        "avail_actions": jnp.ones((B, L, Na, A), bool),
        "actions": jax.random.randint(ks[1], (B, L, Na), 0, A),
        "actions_onehot": jnp.zeros((B, L, Na, A), jnp.float32),
        "reward": jax.random.normal(ks[2], (B, L, 1)),
        "terminated": jnp.zeros((B, L, 1), bool),
        "filled": jnp.ones((B, L, 1), bool),
    }


def test_vdn_loss_matches_hand_computation():
    args = _args()
    info = _env_info()
    mac = EntityMAC(args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    batch = _batch(jax.random.PRNGKey(1))
    state = learner.init_state(key, batch)

    loss, metrics = learner._loss(state.params, state.target_params, batch, key)

    # hand computation with the same params (target == live at init)
    q = np.asarray(mac.forward_episode(state.params["agent"], batch))  # (B,L,Na,A)
    actions = np.asarray(batch["actions"])
    B, L, Na, A = q.shape
    chosen = np.take_along_axis(q[:, :-1], actions[:, :-1, :, None], 3)[..., 0]
    # double-Q with all-available actions and identical target: max of q
    tmax = q[:, 1:].max(axis=3)
    q_tot = chosen.sum(2)
    t_tot = tmax.sum(2)
    r = np.asarray(batch["reward"])[:, :-1, 0]
    targets = r + 0.99 * t_tot
    expected = ((q_tot - targets) ** 2).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_mask_excludes_post_termination_steps():
    args = _args()
    info = _env_info()
    mac = EntityMAC(args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    batch = _batch(jax.random.PRNGKey(1))
    state = learner.init_state(key, batch)

    loss_full, _ = learner._loss(state.params, state.target_params, batch, key)

    # terminate everything at t=1; steps 2+ get masked out. Perturbing their
    # rewards must not change the loss.
    term = jnp.zeros((3, 5, 1), bool).at[:, 1].set(True)
    filled = jnp.ones((3, 5, 1), bool).at[:, 3:].set(False)
    b2 = dict(batch, terminated=term, filled=filled)
    loss_a, _ = learner._loss(state.params, state.target_params, b2, key)
    b3 = dict(b2, reward=batch["reward"].at[:, 3:].add(100.0))
    loss_b, _ = learner._loss(state.params, state.target_params, b3, key)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    assert abs(float(loss_a) - float(loss_full)) > 1e-8  # masking does something


def test_terminated_stops_bootstrap():
    args = _args()
    info = _env_info()
    mac = EntityMAC(args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    batch = _batch(jax.random.PRNGKey(1))
    state = learner.init_state(key, batch)
    term = jnp.zeros((3, 5, 1), bool).at[:, 0].set(True)
    filled = jnp.ones((3, 5, 1), bool).at[:, 2:].set(False)
    b = dict(batch, terminated=term, filled=filled)
    loss1, m1 = learner._loss(state.params, state.target_params, b, key)
    # different entities at t>=1 shouldn't matter: only step 0 contributes and
    # its target is r (no bootstrap)... but entities[:,1] feed the target net.
    # Instead check the target value directly: target_mean == mean reward at t0
    r0 = float(np.asarray(batch["reward"])[:, 0].mean())
    np.testing.assert_allclose(float(m1["target_mean"]) * info["n_agents"], r0, rtol=1e-5)


def test_imagine_loss_weighting():
    args = _args(agent="imagine_entity_attend_ff", lmbda=0.5)
    info = _env_info()
    mac = EntityMAC(args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    batch = _batch(jax.random.PRNGKey(1))
    state = learner.init_state(key, batch)
    loss, m = learner._loss(state.params, state.target_params, batch, key)
    np.testing.assert_allclose(
        float(loss), 0.5 * float(m["loss_td"]) + 0.5 * float(m["im_loss"]), rtol=1e-6
    )


def test_target_update_and_train_step():
    args = _args()
    info = _env_info()
    mac = EntityMAC(args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    batch = _batch(jax.random.PRNGKey(1))
    state = learner.init_state(key, batch)

    p0 = jax.tree.map(np.asarray, state.params)
    state2, metrics = learner.train(state, batch, key, t_env=10, episode_num=0)
    # params moved, target unchanged
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: np.abs(a - np.asarray(b)).max() > 0, p0, state2.params)
    )
    assert any(moved)
    t_same = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: np.allclose(a, np.asarray(b)), p0, state2.target_params
        )
    )
    assert all(t_same)
    assert float(metrics["grad_norm"]) > 0

    # force target update: reference updates targets AFTER the optimizer step
    # (q_learner.py:178-182), so target == post-step params
    state3, _ = learner.train(state2, batch, key, t_env=20, episode_num=500)
    eq2 = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            state3.target_params,
            state3.params,
        )
    )
    assert all(eq2)


def test_rmsprop_matches_torch_semantics():
    """One RMSprop step vs torch's formula: g / (sqrt(ema(g^2)) + eps)."""
    import optax

    tx = optax.rmsprop(0.1, decay=0.99, eps=1e-5, eps_in_sqrt=False)
    p = {"w": jnp.asarray([1.0, 2.0])}
    g = {"w": jnp.asarray([0.5, -0.3])}
    st = tx.init(p)
    up, _ = tx.update(g, st, p)
    gn = np.asarray(g["w"])
    sq_avg = 0.01 * gn ** 2
    expected = -0.1 * gn / (np.sqrt(sq_avg) + 1e-5)
    np.testing.assert_allclose(np.asarray(up["w"]), expected, rtol=1e-5)


def test_td_lambda_zero_equals_one_step_loss():
    """TD(λ=0) must reproduce the 1-step TD loss on fully-filled batches."""
    args1 = _args()
    args2 = _args(td_lambda=0.0)
    info = _env_info()
    key = jax.random.PRNGKey(0)
    batch = _batch(jax.random.PRNGKey(1))
    mac1 = EntityMAC(args1, info)
    l1 = QLearner(mac1, args1, info, key)
    s1 = l1.init_state(key, batch)
    loss1, _ = l1._loss(s1.params, s1.target_params, batch, key)
    mac2 = EntityMAC(args2, info)
    l2 = QLearner(mac2, args2, info, key)
    loss2, _ = l2._loss(s1.params, s1.target_params, batch, key)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
