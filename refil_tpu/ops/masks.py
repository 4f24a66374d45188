"""Mask algebra for entity-set attention and REFIL's imagined factorization.

Convention (inherited from the reference): masks are *blocking* masks —
``1``/``True`` means blocked / inactive / cannot-see; ``0``/``False`` means
active / visible. Four interacting kinds:

  * ``obs_mask``    (B, T, Ne, Ne): entity i cannot see entity j
  * ``entity_mask`` (B, T, Ne):     entity slot is inactive (padding)
  * ``within`` / ``interact`` attention masks: REFIL's random bipartition
  * ``gt_mask``     (B, T, Na, Ne): ground-truth group non-co-membership

Parity targets:
  * ``entitymask2attnmask``: reference ``src/modules/agents/entity_rnn_agent.py:79-85``
    (square variant) and ``entity_ff_agent.py:72-78`` (agent-rows variant).
  * ``build_imagine_masks``: reference ``entity_rnn_agent.py:87-126`` and
    ``entity_ff_agent.py:80-135`` (random bipartition, gt/rand-gt oracle paths).

All ops are boolean; the reference's uint8 arithmetic (``1 - x``, clipped add)
is exactly NOT/OR on {0,1}.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def entitymask2attnmask(entity_mask: jnp.ndarray) -> jnp.ndarray:
    """(..., Ne) inactive-mask -> (..., Ne, Ne) attention block-mask.

    Pair (i, j) is *un*blocked iff both i and j are active; implemented as the
    boolean outer product (the reference uses a rank-1 ``bmm`` of floats,
    ``entity_rnn_agent.py:82-85``).
    """
    active = ~entity_mask
    return ~(active[..., :, None] & active[..., None, :])


def agentmask2attnmask(entity_mask: jnp.ndarray, n_agents: int) -> jnp.ndarray:
    """(..., Ne) inactive-mask -> (..., Na, Ne) agent-rows attention block-mask
    (reference ``entity_ff_agent.py:72-78``)."""
    active = ~entity_mask
    agent_active = active[..., :n_agents]
    return ~(agent_active[..., :, None] & active[..., None, :])


class ImagineMasks(NamedTuple):
    """Masks produced by the REFIL random bipartition.

    ``within``/``interact`` include the obs_mask (used for the ×3 tiled agent
    pass); ``w_noobs``/``i_noobs`` exclude it but include entity-activity
    (used by the mixer's imagined hypernetworks).
    """

    within: jnp.ndarray
    interact: jnp.ndarray
    w_noobs: jnp.ndarray
    i_noobs: jnp.ndarray


def build_imagine_masks(
    key: jax.Array,
    obs_mask: jnp.ndarray,
    entity_mask: jnp.ndarray,
    n_agents: int,
    agent_rows: bool = False,
    gt_mask: Optional[jnp.ndarray] = None,
    use_gt_factors: bool = False,
    use_rand_gt_factors: bool = False,
) -> ImagineMasks:
    """Random entity bipartition -> within/interaction attention masks.

    Matches reference semantics exactly (``entity_rnn_agent.py:87-126``):
      * one partition per *episode*: p ~ U(0,1) per batch element, then
        groupA ~ Bernoulli(p) per entity, evaluated on t=0 activity only
        (``entity_mask[:, [0]]``).
      * within  = pairs in the same group (A-A or B-B), blocked otherwise
      * interact = pairs across groups
      * oracle paths (FF agent only, ``entity_ff_agent.py:92-114``):
        ``use_gt_factors`` replaces the random partition with ``gt_mask``;
        ``use_rand_gt_factors`` ORs the random within-mask with ``gt_mask``
        (blocked if either blocks).

    Args:
      obs_mask: (B, T, Ne, Ne) bool.
      entity_mask: (B, T, Ne) bool.
      gt_mask: (B, T, Na, Ne) bool, required for the gt paths.
      agent_rows: if True produce (B, T, Na, Ne) masks (FF agent / linear
        mixer); else square (B, T, Ne, Ne) (RNN agent / FlexQMixer).

    Returns masks broadcast over the full T axis.
    """
    B, T, Ne = entity_mask.shape
    to_attn = (
        (lambda em: agentmask2attnmask(em, n_agents)) if agent_rows else entitymask2attnmask
    )

    em0 = entity_mask[:, 0:1]  # (B, 1, Ne) — t=0 activity only
    active0 = to_attn(em0)  # blocked unless both endpoints active at t=0

    if use_gt_factors:
        if gt_mask is None:
            raise ValueError("use_gt_factors requires gt_mask")
        within = gt_mask.astype(bool)
        interact = ~within
    else:
        key_p, key_b = jax.random.split(key)
        group_probs = jax.random.uniform(key_p, (B, 1, 1))
        groupA = jax.random.bernoulli(key_b, group_probs, (B, 1, Ne))
        # mark absent entities as "in" both groups => they block all pairs
        groupA_m = groupA | em0
        groupB_m = (~groupA) | em0
        maskA = to_attn(groupA_m)
        maskB = to_attn(groupB_m)
        # across-groups pairs: not within A and not within B
        interact = (~maskA) | (~maskB)
        within = ~interact
        if use_rand_gt_factors:
            if gt_mask is None:
                raise ValueError("use_rand_gt_factors requires gt_mask")
            within = within | gt_mask.astype(bool)
            interact = ~within

    # mixer masks: no obs-mask, but block inactive entities
    w_noobs = within | active0
    i_noobs = interact | active0
    # agent masks: additionally respect observability (broadcasts over T).
    # In agent-rows mode only the first Na rows of obs_mask are consumed by the
    # attention layer, so slicing here is equivalent to the reference's square
    # OR (entity_ff_agent.py:121, which relies on Na == Ne).
    obs_rows = obs_mask[:, :, :n_agents, :] if agent_rows else obs_mask
    within_obs = within | obs_rows
    interact_obs = interact | obs_rows

    # broadcast the T=1 mixer masks across the episode (reference repeats ×ts)
    tgt_rows = n_agents if agent_rows else Ne
    if use_gt_factors or use_rand_gt_factors:
        # gt masks may already carry a full T axis (reference repeats ×1)
        w_noobs = jnp.broadcast_to(w_noobs, (B, max(T, w_noobs.shape[1]), tgt_rows, Ne))
        i_noobs = jnp.broadcast_to(i_noobs, (B, max(T, i_noobs.shape[1]), tgt_rows, Ne))
    else:
        w_noobs = jnp.broadcast_to(w_noobs, (B, T, tgt_rows, Ne))
        i_noobs = jnp.broadcast_to(i_noobs, (B, T, tgt_rows, Ne))

    return ImagineMasks(within=within_obs, interact=interact_obs, w_noobs=w_noobs, i_noobs=i_noobs)


def hypernet_attn_mask(entity_mask: jnp.ndarray, n_agents: int) -> jnp.ndarray:
    """Default hypernet attention mask from the entity-activity mask
    (reference ``flex_qmix.py:44-46``): agent rows x entity cols, pair
    unblocked iff both active."""
    return agentmask2attnmask(entity_mask, n_agents)
