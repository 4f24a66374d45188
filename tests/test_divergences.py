"""Regression tests pinning the two argued-identical divergences from the
reference (PARITY.md "Known gaps / divergences"):

1. The reference selects an action at the terminal pre-transition slot and
   for post-termination slots of shorter episodes, but the learner never
   consumes them (``parallel_runner.py:117-163`` fills them;
   ``q_learner.py:74-126`` gathers only ``actions[:, :-1]`` under the filled
   mask). We skip selecting them entirely — equivalent iff the loss is
   invariant to those action slots. This test would fail if a code change
   ever made the learner read a terminal/post-termination action.

2. The reference truncates sampled batches to ``max_t_filled`` before
   training (``run.py:268-271``); we keep the full static T and rely on the
   filled/terminated masks (XLA static shapes). Equivalent iff the loss on
   the full padded batch equals the loss on the truncated batch exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refil_tpu.controllers.mac import EntityMAC
from refil_tpu.learners.q_learner import QLearner

from test_learner import _args, _batch, _env_info


def _setup(**over):
    args = _args(**over)
    info = _env_info()
    mac = EntityMAC(args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    batch = _batch(jax.random.PRNGKey(1))
    state = learner.init_state(key, batch)
    return learner, state, batch, key


@pytest.mark.parametrize("agent", ["entity_attend_ff", "entity_attend_rnn"])
def test_terminal_and_post_termination_actions_never_consumed(agent):
    learner, state, batch, key = _setup(agent=agent, entity_last_action=True)
    B, L, Na = batch["actions"].shape
    A = batch["avail_actions"].shape[-1]
    # episodes end at t=2: slots 0..3 filled (incl. terminal slot 3)
    term = jnp.zeros((B, L, 1), bool).at[:, 2].set(True)
    filled = jnp.ones((B, L, 1), bool).at[:, 4:].set(False)
    base = dict(batch, terminated=term, filled=filled)
    loss0, m0 = learner._loss(state.params, state.target_params, base, key)

    # corrupt the actions the reference spuriously selects but never trains
    # on: the terminal slot (3) and everything after — incl. their onehots,
    # which with entity_last_action=True only feed inputs at slot t+1 >= 5,
    # all masked out of the loss
    corrupt_actions = base["actions"].at[:, 3:].set(
        (base["actions"][:, 3:] + 1) % A
    )
    corrupt_onehot = base["actions_onehot"].at[:, 3:].add(7.0)
    b2 = dict(base, actions=corrupt_actions, actions_onehot=corrupt_onehot)
    loss1, m1 = learner._loss(state.params, state.target_params, b2, key)

    np.testing.assert_array_equal(np.asarray(loss0), np.asarray(loss1))
    for k in m0:
        np.testing.assert_array_equal(np.asarray(m0[k]), np.asarray(m1[k]), err_msg=k)

    # sanity: a consumed slot (t=1) is NOT invariant
    b3 = dict(base, actions=base["actions"].at[:, 1].set((base["actions"][:, 1] + 1) % A))
    loss2, _ = learner._loss(state.params, state.target_params, b3, key)
    assert float(loss2) != float(loss0)


@pytest.mark.parametrize("agent", ["entity_attend_ff", "entity_attend_rnn"])
def test_full_T_masking_equals_max_t_filled_truncation(agent):
    learner, state, batch, key = _setup(agent=agent)
    B, L, _ = batch["reward"].shape
    # all episodes end at t=2 → max_t_filled = 4 slots (0..3)
    term = jnp.zeros((B, L, 1), bool).at[:, 2].set(True)
    filled = jnp.ones((B, L, 1), bool).at[:, 4:].set(False)
    padded = dict(batch, terminated=term, filled=filled)
    max_t_filled = int(jnp.sum(filled[0, :, 0]))
    truncated = jax.tree.map(lambda x: x[:, :max_t_filled], padded)

    loss_pad, m_pad = learner._loss(state.params, state.target_params, padded, key)
    loss_tr, m_tr = learner._loss(state.params, state.target_params, truncated, key)

    np.testing.assert_allclose(
        np.asarray(loss_pad), np.asarray(loss_tr), rtol=0, atol=1e-6
    )
    for k in m_pad:
        np.testing.assert_allclose(
            np.asarray(m_pad[k]), np.asarray(m_tr[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )
