"""Checkpoint save/load roundtrip: full training state (params + target +
optimizer) restores bit-exactly (reference saves model-only and acknowledges
approximate resume, q_learner.py:222-225 — we do better)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.config import Args
from refil_tpu.controllers.mac import EntityMAC
from refil_tpu.learners.q_learner import QLearner
from refil_tpu.run import _dummy_batch, _load_checkpoint, _save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    args = Args(
        agent="imagine_entity_attend_ff", mixer="lin_flex_qmix", entity_scheme=True,
        entity_last_action=False, attn_embed_dim=8, attn_n_heads=2, rnn_hidden_dim=8,
        pooling_type=None, gt_obs_mask=False, double_q=True, gamma=0.99, lr=5e-4,
        optim_alpha=0.99, optim_eps=1e-5, grad_norm_clip=10, weight_decay=0,
        mixing_embed_dim=4, hypernet_embed=8, softmax_mixing_weights=True, lmbda=0.5,
        target_update_interval=200, learner_log_interval=100,
        train_gt_factors=False, train_rand_gt_factors=False,
    )
    info = {"n_agents": 2, "n_actions": 3, "n_entities": 2, "entity_shape": 4,
            "episode_limit": 3, "gt_mask_avail": False}
    mac = EntityMAC(args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    batch = _dummy_batch(mac, info)
    batch["entities"] = jax.random.normal(key, batch["entities"].shape)
    state = learner.init_state(key, batch)
    # one step so optimizer state is non-trivial
    state, _ = learner.train(state, batch, key, 0, 0)

    path = str(tmp_path / "ckpt")
    _save_checkpoint(path, state)
    assert os.path.getsize(os.path.join(path, "state.msgpack")) > 0
    assert not os.path.exists(os.path.join(path, "state.msgpack.tmp"))

    fresh = learner.init_state(jax.random.PRNGKey(42), batch)
    restored, pipe_payload = _load_checkpoint(path, fresh)
    assert pipe_payload is None  # no pipeline state was saved
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(restored.target_params), jax.tree.leaves(state.target_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
