"""Agent Q-networks over entity sets.

Parity targets:
  * ``EntityAttentionRNNAgent``          — reference ``entity_rnn_agent.py:7-64``
  * ``ImagineEntityAttentionRNNAgent``   — reference ``entity_rnn_agent.py:67-126``
  * ``EntityAttentionFFAgent``           — reference ``entity_ff_agent.py:7-57``
  * ``ImagineEntityAttentionFFAgent``    — reference ``entity_ff_agent.py:60-135``
  * ``RNNAgent`` / ``FFAgent`` (flat)    — reference ``rnn_agent.py`` / ``ff_agent.py``

TPU-first design:
  * the whole (B, T) grid is flattened into one batched attention call — a
    single set of large MXU matmuls instead of per-step calls;
  * the GRU runs as one sequence program (``GRUSequence``: input projection
    hoisted to a single MXU matmul + ``lax.scan`` or fused Pallas recurrence)
    instead of the reference's Python loop over timesteps
    (``entity_rnn_agent.py:51-55``);
  * REFIL's ×3 [full, within-group, across-group] pass tiles the *batch* axis
    (``entity_rnn_agent.py:119-126``), which shards cleanly over a data mesh.

All masks are boolean blocking masks (True = blocked/inactive).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import build_imagine_masks
from .layers import GRUSequence, TorchLinear, make_entity_layer


# GRU: GRUSequence (modules/layers.py) replaces nn.RNN(GRUCell) — identical
# gate math, init and parameter tree, with the input projection hoisted out
# of the recurrence and an optional fused Pallas kernel (ops/pallas_gru.py)


class EntityAttentionFFAgent(nn.Module):
    """fc1 -> ReLU -> entity-attention -> ReLU -> fc2 -> Q
    (reference ``entity_ff_agent.py:7-57``).

    ``hidden`` is accepted and passed through untouched for API uniformity with
    the RNN agent (the reference FF agent also ignores it)."""

    attn_embed_dim: int
    rnn_hidden_dim: int
    n_actions: int
    n_agents: int
    attn_n_heads: int
    pooling_type: Optional[str] = None
    gt_obs_mask: bool = False
    dtype: Optional[jnp.dtype] = None
    # imagine-mask shape: agent-rows (Na, Ne) for FF (entity_ff_agent.py:72-78)
    agent_rows: bool = True

    def setup(self):
        self.fc1 = TorchLinear(self.attn_embed_dim, name="fc1")
        self.attn = make_entity_layer(
            self.attn_embed_dim,
            self.attn_embed_dim,
            self.attn_n_heads,
            self.pooling_type,
            dtype=self.dtype,
            name="attn",
        )
        self.fc2 = TorchLinear(self.n_actions, name="fc2")

    def _base_forward(self, entities, obs_mask, entity_mask, hidden, ret_attn_logits=None):
        B, T, Ne, D = entities.shape
        if self.dtype is not None:
            entities = entities.astype(self.dtype)
        x = entities.reshape(B * T, Ne, D)
        pre_mask = obs_mask.reshape(B * T, obs_mask.shape[2], Ne)
        em = entity_mask.reshape(B * T, Ne)
        agent_mask = em[:, : self.n_agents]

        x1 = nn.relu(self.fc1(x))
        attn_outs = self.attn(
            x1, pre_mask=pre_mask, post_mask=agent_mask, ret_attn_logits=ret_attn_logits
        )
        if ret_attn_logits is not None:
            x2, attn_logits = attn_outs
        else:
            x2 = attn_outs
        x2 = nn.relu(x2)
        q = self.fc2(x2)
        q = q.reshape(B, T, self.n_agents, self.n_actions)
        # zero Q of inactive agents (reference entity_ff_agent.py:52-53)
        q = jnp.where(
            agent_mask.reshape(B, T, self.n_agents, 1), jnp.zeros((), q.dtype), q
        ).astype(jnp.float32)
        if ret_attn_logits is not None:
            return q, hidden, attn_logits.reshape(B, T, self.n_agents, Ne)
        return q, hidden

    def __call__(self, entities, obs_mask, entity_mask, hidden, ret_attn_logits=None,
                 gt_mask=None, **unused):
        if self.gt_obs_mask and gt_mask is not None:
            # substitute ground-truth mask for observability (entity_ff_agent.py:34-35)
            obs_mask = gt_mask
        return self._base_forward(entities, obs_mask, entity_mask, hidden, ret_attn_logits)


class EntityAttentionRNNAgent(nn.Module):
    """fc1 -> ReLU -> entity-attention -> fc2 -> ReLU -> GRU(scan over T) -> fc3 -> Q
    (reference ``entity_rnn_agent.py:7-64``; the GRU python loop becomes
    ``lax.scan`` over the time axis in one jit)."""

    attn_embed_dim: int
    rnn_hidden_dim: int
    n_actions: int
    n_agents: int
    attn_n_heads: int
    pooling_type: Optional[str] = None
    gt_obs_mask: bool = False
    dtype: Optional[jnp.dtype] = None
    # imagine-mask shape: square (Ne, Ne) for RNN (entity_rnn_agent.py:79-85)
    agent_rows: bool = False

    def setup(self):
        self.fc1 = TorchLinear(self.attn_embed_dim, name="fc1")
        self.attn = make_entity_layer(
            self.attn_embed_dim,
            self.attn_embed_dim,
            self.attn_n_heads,
            self.pooling_type,
            dtype=self.dtype,
            name="attn",
        )
        self.fc2 = TorchLinear(self.rnn_hidden_dim, name="fc2")
        self.rnn = GRUSequence(features=self.rnn_hidden_dim, name="gru")
        self.fc3 = TorchLinear(self.n_actions, name="fc3")

    def _base_forward(self, entities, obs_mask, entity_mask, hidden, ret_attn_logits=None):
        B, T, Ne, D = entities.shape
        if self.dtype is not None:
            entities = entities.astype(self.dtype)
        x = entities.reshape(B * T, Ne, D)
        pre_mask = obs_mask.reshape(B * T, obs_mask.shape[2], Ne)
        em = entity_mask.reshape(B * T, Ne)
        agent_mask = em[:, : self.n_agents]

        x1 = nn.relu(self.fc1(x))
        attn_outs = self.attn(
            x1, pre_mask=pre_mask, post_mask=agent_mask, ret_attn_logits=ret_attn_logits
        )
        if ret_attn_logits is not None:
            x2, attn_logits = attn_outs
        else:
            x2 = attn_outs
        x3 = nn.relu(self.fc2(x2))
        # (B*T, Na, H) -> (B*Na, T, H) for the time scan
        x3 = x3.reshape(B, T, self.n_agents, self.rnn_hidden_dim)
        x3 = x3.transpose(0, 2, 1, 3).reshape(B * self.n_agents, T, self.rnn_hidden_dim)

        h0 = hidden.reshape(B * self.n_agents, self.rnn_hidden_dim)
        h_last, hs = self.rnn(x3, h0)
        hs = hs.reshape(B, self.n_agents, T, self.rnn_hidden_dim).transpose(0, 2, 1, 3)

        q = self.fc3(hs)  # (B, T, Na, A)
        # zero Q of inactive agents (reference entity_rnn_agent.py:59-60)
        q = jnp.where(
            agent_mask.reshape(B, T, self.n_agents, 1), jnp.zeros((), q.dtype), q
        ).astype(jnp.float32)
        h_out = h_last.reshape(B, self.n_agents, self.rnn_hidden_dim)
        if ret_attn_logits is not None:
            return q, h_out, attn_logits.reshape(B, T, self.n_agents, Ne)
        return q, h_out

    def __call__(self, entities, obs_mask, entity_mask, hidden, ret_attn_logits=None,
                 **unused):
        return self._base_forward(entities, obs_mask, entity_mask, hidden, ret_attn_logits)


def _imagine_forward(
    agent,
    entities,
    obs_mask,
    entity_mask,
    hidden,
    imagine_key,
    gt_mask=None,
    use_gt_factors=False,
    use_rand_gt_factors=False,
):
    """REFIL ×3 tiling shared by both imagine agents
    (reference ``entity_rnn_agent.py:87-126`` / ``entity_ff_agent.py:80-135``)."""
    masks = build_imagine_masks(
        imagine_key,
        obs_mask,
        entity_mask,
        agent.n_agents,
        agent_rows=agent.agent_rows,
        gt_mask=gt_mask,
        use_gt_factors=use_gt_factors,
        use_rand_gt_factors=use_rand_gt_factors,
    )
    # ×3 batch tiling: [full obs, within-group, across-group]
    ent3 = jnp.concatenate([entities] * 3, axis=0)
    if agent.agent_rows:
        # FF variant: agent-row pre-masks. The attention layer consumes only the
        # first Na rows of any pre-mask, so slicing obs_mask here is equivalent
        # to the reference (which relies on Na == Ne, entity_ff_agent.py:125).
        base = obs_mask[:, :, : agent.n_agents, :]
    else:
        base = obs_mask
    om3 = jnp.concatenate([base, masks.within, masks.interact], axis=0)
    em3 = jnp.concatenate([entity_mask] * 3, axis=0)
    h3 = jnp.concatenate([hidden] * 3, axis=0)
    q, h = agent._base_forward(ent3, om3, em3, h3)
    return q, h, (masks.w_noobs, masks.i_noobs)


class ImagineEntityAttentionRNNAgent(EntityAttentionRNNAgent):
    """REFIL agent: random entity bipartition, ×3 tiled forward.
    Parity: reference ``entity_rnn_agent.py:67-126``."""

    def __call__(
        self,
        entities,
        obs_mask,
        entity_mask,
        hidden,
        imagine=False,
        imagine_key=None,
        gt_mask=None,
        use_gt_factors=False,
        use_rand_gt_factors=False,
        ret_attn_logits=None,
    ):
        if not imagine:
            return self._base_forward(
                entities, obs_mask, entity_mask, hidden, ret_attn_logits
            )
        return _imagine_forward(
            self,
            entities,
            obs_mask,
            entity_mask,
            hidden,
            imagine_key,
            gt_mask=gt_mask,
            use_gt_factors=use_gt_factors,
            use_rand_gt_factors=use_rand_gt_factors,
        )


class ImagineEntityAttentionFFAgent(EntityAttentionFFAgent):
    """REFIL FF agent (Group Matching). Parity: reference
    ``entity_ff_agent.py:60-135`` incl. gt-factor oracle paths."""

    def __call__(
        self,
        entities,
        obs_mask,
        entity_mask,
        hidden,
        imagine=False,
        imagine_key=None,
        gt_mask=None,
        use_gt_factors=False,
        use_rand_gt_factors=False,
        ret_attn_logits=None,
    ):
        if self.gt_obs_mask and gt_mask is not None:
            # substitute ground-truth mask for observability (entity_ff_agent.py:34-35)
            obs_mask = gt_mask
        if not imagine:
            return self._base_forward(
                entities, obs_mask, entity_mask, hidden, ret_attn_logits
            )
        return _imagine_forward(
            self,
            entities,
            obs_mask,
            entity_mask,
            hidden,
            imagine_key,
            gt_mask=gt_mask,
            use_gt_factors=use_gt_factors,
            use_rand_gt_factors=use_rand_gt_factors,
        )


class FFAgent(nn.Module):
    """Flat-observation MLP agent (reference ``ff_agent.py``)."""

    rnn_hidden_dim: int
    n_actions: int

    @nn.compact
    def __call__(self, inputs, hidden, **unused):
        x = nn.relu(TorchLinear(self.rnn_hidden_dim, name="fc1")(inputs))
        x = nn.relu(TorchLinear(self.rnn_hidden_dim, name="fc2")(x))
        q = TorchLinear(self.n_actions, name="fc3")(x)
        return q, hidden


class RNNAgent(nn.Module):
    """Flat-observation GRU agent (reference ``rnn_agent.py``).

    ``inputs``: (B, T, Na, D); ``hidden``: (B, Na, H)."""

    rnn_hidden_dim: int
    n_actions: int

    @nn.compact
    def __call__(self, inputs, hidden, **unused):
        B, T, Na, D = inputs.shape
        x = nn.relu(TorchLinear(self.rnn_hidden_dim, name="fc1")(inputs))
        x = x.transpose(0, 2, 1, 3).reshape(B * Na, T, self.rnn_hidden_dim)
        rnn = GRUSequence(features=self.rnn_hidden_dim, name="gru")
        h_last, hs = rnn(x, hidden.reshape(B * Na, self.rnn_hidden_dim))
        hs = hs.reshape(B, Na, T, self.rnn_hidden_dim).transpose(0, 2, 1, 3)
        q = TorchLinear(self.n_actions, name="fc2")(hs)
        return q, h_last.reshape(B, Na, self.rnn_hidden_dim)


AGENT_REGISTRY = {
    "ff": FFAgent,
    "rnn": RNNAgent,
    "entity_attend_ff": EntityAttentionFFAgent,
    "entity_attend_rnn": EntityAttentionRNNAgent,
    "imagine_entity_attend_ff": ImagineEntityAttentionFFAgent,
    "imagine_entity_attend_rnn": ImagineEntityAttentionRNNAgent,
}
