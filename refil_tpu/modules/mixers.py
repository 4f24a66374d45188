"""Mixing networks (value decomposition).

Parity targets:
  * ``AttentionHyperNet``   — reference ``flex_qmix.py:7-57``
  * ``FlexQMixer``          — reference ``flex_qmix.py:60-121``
  * ``LinearFlexQMixer``    — reference ``flex_qmix.py:124-172``
  * ``QMixer`` (flat)       — reference ``qmix.py``
  * ``VDNMixer``            — reference ``vdn.py``

Shapes: ``entities`` (B, T, Ne, D); ``entity_mask`` (B, T, Ne) bool;
``agent_qs`` (B, T, Na) (or (B, T, 2·Na) on the imagined path). All mixers
return ``q_tot`` (B, T, 1).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import hypernet_attn_mask
from .layers import TorchLinear, make_entity_layer


class AttentionHyperNet(nn.Module):
    """Hypernetwork over the entity set: fc1 -> attention -> fc2, then
    agent-masked reduction per ``mode`` (reference ``flex_qmix.py:7-57``).

    mode='matrix'     -> (B', Na, E)
    mode='vector'     -> (B', E)   (mean over agents)
    mode='alt_vector' -> (B', Na)  (mean over embed dim)
    mode='scalar'     -> (B',)     (mean over both)
    """

    hypernet_embed: int
    mixing_embed_dim: int
    n_agents: int
    attn_n_heads: int
    pooling_type: Optional[str] = None
    mode: str = "matrix"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, entities, entity_mask, attn_mask=None):
        # entities: (B', Ne, D); entity_mask: (B', Ne) bool
        x1 = nn.relu(TorchLinear(self.hypernet_embed, name="fc1")(entities))
        agent_mask = entity_mask[:, : self.n_agents]
        if attn_mask is None:
            # default: agent rows attend to all active entities (flex_qmix.py:44-46)
            attn_mask = hypernet_attn_mask(entity_mask, self.n_agents)
        attn = make_entity_layer(
            self.hypernet_embed,
            self.hypernet_embed,
            self.attn_n_heads,
            self.pooling_type,
            dtype=self.dtype,
            name="attn",
        )
        x2 = attn(x1, pre_mask=attn_mask, post_mask=agent_mask)
        x3 = TorchLinear(self.mixing_embed_dim, name="fc2")(x2)
        x3 = jnp.where(agent_mask[..., None], jnp.zeros((), x3.dtype), x3)
        if self.mode == "vector":
            return x3.mean(axis=1)
        elif self.mode == "alt_vector":
            return x3.mean(axis=2)
        elif self.mode == "scalar":
            return x3.mean(axis=(1, 2))
        return x3


class FlexQMixer(nn.Module):
    """QMIX monotonic mixing with attention hypernets; on the imagined path the
    first-layer hypernet runs twice with the within/interact masks and the
    2·Na imagined Qs are mixed against the same targets
    (reference ``flex_qmix.py:60-121``)."""

    n_agents: int
    mixing_embed_dim: int
    hypernet_embed: int
    attn_n_heads: int
    softmax_mixing_weights: bool = False
    mixer_non_lin: str = "elu"
    pooling_type: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        kw = dict(
            hypernet_embed=self.hypernet_embed,
            mixing_embed_dim=self.mixing_embed_dim,
            n_agents=self.n_agents,
            attn_n_heads=self.attn_n_heads,
            pooling_type=self.pooling_type,
            dtype=self.dtype,
        )
        self.hyper_w_1 = AttentionHyperNet(mode="matrix", name="hyper_w_1", **kw)
        self.hyper_w_final = AttentionHyperNet(mode="vector", name="hyper_w_final", **kw)
        self.hyper_b_1 = AttentionHyperNet(mode="vector", name="hyper_b_1", **kw)
        self.V = AttentionHyperNet(mode="scalar", name="V", **kw)

    def __call__(self, agent_qs, entities, entity_mask, imagine_groups=None):
        B, T, Ne, D = entities.shape
        if self.dtype is not None:
            entities = entities.astype(self.dtype)
            agent_qs = agent_qs.astype(self.dtype)
        ents = entities.reshape(B * T, Ne, D)
        em = entity_mask.reshape(B * T, Ne)
        E = self.mixing_embed_dim

        if imagine_groups is not None:
            w_mask, i_mask = imagine_groups
            qs = agent_qs.reshape(B * T, 1, self.n_agents * 2)
            w1_W = self.hyper_w_1(ents, em, attn_mask=w_mask.reshape(B * T, -1, Ne))
            w1_I = self.hyper_w_1(ents, em, attn_mask=i_mask.reshape(B * T, -1, Ne))
            w1 = jnp.concatenate([w1_W, w1_I], axis=1)  # (B', 2Na, E)
        else:
            qs = agent_qs.reshape(B * T, 1, self.n_agents)
            w1 = self.hyper_w_1(ents, em)  # (B', Na, E)
        b1 = self.hyper_b_1(ents, em).reshape(B * T, 1, E)
        if self.softmax_mixing_weights:
            w1 = jax.nn.softmax(w1, axis=-1)
        else:
            w1 = jnp.abs(w1)

        non_lin = nn.elu if self.mixer_non_lin == "elu" else nn.tanh
        hidden = non_lin(jnp.einsum("bqa,bae->bqe", qs, w1) + b1)  # (B', 1, E)

        w_final = self.hyper_w_final(ents, em)  # (B', E)
        if self.softmax_mixing_weights:
            w_final = jax.nn.softmax(w_final, axis=-1)
        else:
            w_final = jnp.abs(w_final)
        v = self.V(ents, em).reshape(B * T, 1, 1)

        y = jnp.einsum("bqe,be->bq", hidden, w_final)[..., None] + v
        return y.reshape(B, T, 1).astype(jnp.float32)


class LinearFlexQMixer(nn.Module):
    """Linear mixing variant used for Group Matching: scalar weight per agent,
    ``q_tot = Σ w_i·q_i + V`` (reference ``flex_qmix.py:124-172``)."""

    n_agents: int
    mixing_embed_dim: int
    hypernet_embed: int
    attn_n_heads: int
    softmax_mixing_weights: bool = False
    pooling_type: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        kw = dict(
            hypernet_embed=self.hypernet_embed,
            mixing_embed_dim=self.mixing_embed_dim,
            n_agents=self.n_agents,
            attn_n_heads=self.attn_n_heads,
            pooling_type=self.pooling_type,
            dtype=self.dtype,
        )
        self.hyper_w_1 = AttentionHyperNet(mode="alt_vector", name="hyper_w_1", **kw)
        self.V = AttentionHyperNet(mode="scalar", name="V", **kw)

    def __call__(
        self,
        agent_qs,
        entities,
        entity_mask,
        imagine_groups=None,
        ret_ingroup_prop=False,
    ):
        B, T, Ne, D = entities.shape
        if self.dtype is not None:
            entities = entities.astype(self.dtype)
            agent_qs = agent_qs.astype(self.dtype)
        ents = entities.reshape(B * T, Ne, D)
        em = entity_mask.reshape(B * T, Ne)

        if imagine_groups is not None:
            w_mask, i_mask = imagine_groups
            qs = agent_qs.reshape(B * T, self.n_agents * 2)
            w1_W = self.hyper_w_1(
                ents, em, attn_mask=w_mask.reshape(B * T, self.n_agents, Ne)
            )
            w1_I = self.hyper_w_1(
                ents, em, attn_mask=i_mask.reshape(B * T, self.n_agents, Ne)
            )
            w1 = jnp.concatenate([w1_W, w1_I], axis=1)  # (B', 2Na)
        else:
            qs = agent_qs.reshape(B * T, self.n_agents)
            w1 = self.hyper_w_1(ents, em)  # (B', Na)
        if self.softmax_mixing_weights:
            w1 = jax.nn.softmax(w1, axis=1)
        else:
            w1 = jnp.abs(w1)
        v = self.V(ents, em)  # (B',)

        q_tot = (qs * w1).sum(axis=1) + v
        q_tot = q_tot.reshape(B, T, 1).astype(jnp.float32)
        if ret_ingroup_prop:
            # diagnostic: mean share of mixing weight on in-group Qs
            # (reference flex_qmix.py:167-171)
            ingroup_w = w1.at[:, self.n_agents :].set(0.0) if imagine_groups is not None else w1
            ingroup_prop = ingroup_w.sum(axis=1).mean()
            return q_tot, ingroup_prop
        return q_tot


class VDNMixer(nn.Module):
    """``q_tot = Σ_i q_i`` (reference ``vdn.py:9-10``)."""

    def __call__(self, agent_qs, entities=None, entity_mask=None, imagine_groups=None):
        return agent_qs.sum(axis=2, keepdims=True)


class QMixer(nn.Module):
    """Standard QMIX hypernetwork over a flat state vector (reference
    ``qmix.py``). The imagined path splits the state vector via per-entity
    ``state_masks`` provided by the env (``qmix.py:43-63``)."""

    n_agents: int
    state_dim: int
    mixing_embed_dim: int
    hypernet_layers: int = 1
    hypernet_embed: int = 64
    softmax_mixing_weights: bool = False
    mixer_non_lin: str = "elu"
    state_masks: Optional[jnp.ndarray] = None  # (Ne, state_dim) float

    @nn.compact
    def __call__(self, agent_qs, states, imagine_groups=None):
        # states: (B, T, S); agent_qs: (B, T, Na) or (B, T, 2Na)
        B, T, S = states.shape
        E = self.mixing_embed_dim
        st = states.reshape(B * T, S)

        if self.hypernet_layers > 1:
            def hyper_w(name, out):
                def f(x):
                    h = nn.relu(TorchLinear(self.hypernet_embed, name=f"{name}_0")(x))
                    return TorchLinear(out, name=f"{name}_1")(h)
                return f
            hyper_w_1 = hyper_w("hyper_w_1", E * self.n_agents)
            hyper_w_final = hyper_w("hyper_w_final", E)
        else:
            w1_layer = TorchLinear(E * self.n_agents, name="hyper_w_1")
            wf_layer = TorchLinear(E, name="hyper_w_final")
            hyper_w_1 = w1_layer
            hyper_w_final = wf_layer

        if imagine_groups is not None:
            if self.state_masks is None:
                raise ValueError("imagined flat mixing requires state_masks")
            ne = self.state_masks.shape[0]
            groupA, groupB = imagine_groups
            gA = groupA.reshape(B * T, ne, 1).astype(st.dtype)
            gB = groupB.reshape(B * T, ne, 1).astype(st.dtype)
            sm = self.state_masks.reshape(1, ne, S).astype(st.dtype)
            maskA = jnp.clip((gA * sm).sum(axis=1), max=1.0)
            maskB = jnp.clip((gB * sm).sum(axis=1), max=1.0)
            w1 = jnp.concatenate([hyper_w_1(st * maskA), hyper_w_1(st * maskB)], axis=1)
            qs = agent_qs.reshape(B * T, 1, self.n_agents * 2)
        else:
            w1 = hyper_w_1(st)
            qs = agent_qs.reshape(B * T, 1, self.n_agents)

        b1 = TorchLinear(E, name="hyper_b_1")(st).reshape(B * T, 1, E)
        w1 = w1.reshape(B * T, -1, E)
        if self.softmax_mixing_weights:
            w1 = jax.nn.softmax(w1, axis=-1)
        else:
            w1 = jnp.abs(w1)

        non_lin = nn.elu if self.mixer_non_lin == "elu" else nn.tanh
        hidden = non_lin(jnp.einsum("bqa,bae->bqe", qs, w1) + b1)

        wf = hyper_w_final(st)
        if self.softmax_mixing_weights:
            wf = jax.nn.softmax(wf, axis=-1)
        else:
            wf = jnp.abs(wf)
        v_h = nn.relu(TorchLinear(E, name="V_0")(st))
        v = TorchLinear(1, name="V_1")(v_h).reshape(B * T, 1, 1)
        y = jnp.einsum("bqe,be->bq", hidden, wf)[..., None] + v
        return y.reshape(B, T, 1)


MIXER_REGISTRY = {
    "vdn": VDNMixer,
    "qmix": QMixer,
    "flex_qmix": FlexQMixer,
    "lin_flex_qmix": LinearFlexQMixer,
}
