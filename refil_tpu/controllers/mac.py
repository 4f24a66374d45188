"""Multi-agent controllers (MACs): build model inputs from observations /
episode batches and run the shared agent network.

Parity targets: reference ``src/controllers/basic_controller.py`` and
``entity_controller.py``. Unlike the reference (which owns mutable
``hidden_states``), these controllers are stateless — parameters and hidden
state are threaded explicitly so everything jits and shards.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..modules.agents import AGENT_REGISTRY


class EntityMAC:
    """Entity-scheme controller (reference ``entity_controller.py``).

    Input building: entities, optionally concatenated with the one-hot of each
    agent's last action written into the first ``n_agents`` entity rows
    (``entity_controller.py:16-26``).
    """

    def __init__(self, args, env_info: Dict[str, Any]):
        self.args = args
        self.n_agents = env_info["n_agents"]
        self.n_actions = env_info["n_actions"]
        self.n_entities = env_info["n_entities"]
        self.entity_shape = env_info["entity_shape"]
        self.gt_mask_avail = bool(env_info.get("gt_mask_avail", False))
        self.entity_last_action = bool(getattr(args, "entity_last_action", False))
        self.input_shape = self.entity_shape + (
            self.n_actions if self.entity_last_action else 0
        )
        self.is_imagine = "imagine" in args.agent
        self.is_rnn = args.agent.endswith("rnn")

        import jax.numpy as _jnp

        compute_dtype = (
            _jnp.bfloat16
            if getattr(args, "compute_dtype", "float32") == "bfloat16"
            else None
        )
        agent_cls = AGENT_REGISTRY[args.agent]
        self.agent = agent_cls(
            dtype=compute_dtype,
            attn_embed_dim=args.attn_embed_dim,
            rnn_hidden_dim=args.rnn_hidden_dim,
            n_actions=self.n_actions,
            n_agents=self.n_agents,
            attn_n_heads=args.attn_n_heads,
            pooling_type=getattr(args, "pooling_type", None),
            gt_obs_mask=bool(getattr(args, "gt_obs_mask", False)),
        )

    # --- params / hidden ---
    def init_params(self, key: jax.Array):
        B, T = 1, 2
        ents = jnp.zeros((B, T, self.n_entities, self.input_shape), jnp.float32)
        om = jnp.zeros((B, T, self.n_entities, self.n_entities), bool)
        em = jnp.zeros((B, T, self.n_entities), bool)
        h = self.init_hidden(B)
        return self.agent.init(key, ents, om, em, h)

    def init_hidden(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros(
            (batch_size, self.n_agents, self.args.rnn_hidden_dim), jnp.float32
        )

    # --- input building ---
    def _concat_last_action(self, entities: jnp.ndarray, last_oh: jnp.ndarray):
        """entities (B, T, Ne, D); last_oh (B, T, Na, A) -> concat along features,
        zeros in non-agent rows (``entity_controller.py:17-26``)."""
        B, T, Ne, _ = entities.shape
        ent_acs = jnp.zeros((B, T, Ne, self.n_actions), entities.dtype)
        ent_acs = ent_acs.at[:, :, : self.n_agents].set(last_oh.astype(entities.dtype))
        return jnp.concatenate([entities, ent_acs], axis=3)

    def build_step_inputs(
        self, obs: Dict[str, jnp.ndarray], last_actions_onehot: Optional[jnp.ndarray]
    ):
        """Single-timestep inputs with a T=1 axis. ``obs`` fields are (B, ...);
        ``last_actions_onehot`` is (B, Na, A) (zeros at t=0)."""
        entities = obs["entities"][:, None]
        if self.entity_last_action:
            entities = self._concat_last_action(
                entities, last_actions_onehot[:, None]
            )
        om = obs["obs_mask"][:, None]
        em = obs["entity_mask"][:, None]
        gt = obs["gt_mask"][:, None] if (self.gt_mask_avail and "gt_mask" in obs) else None
        return entities, om, em, gt

    def build_episode_inputs(self, batch: Dict[str, jnp.ndarray]):
        """Whole-episode inputs from a training batch.

        last-action block at t is actions_onehot[t-1], zeros at t=0
        (``entity_controller.py:20-23``)."""
        entities = batch["entities"]
        if self.entity_last_action:
            ao = batch["actions_onehot"]
            last = jnp.concatenate([jnp.zeros_like(ao[:, :1]), ao[:, :-1]], axis=1)
            entities = self._concat_last_action(entities, last)
        gt = batch.get("gt_mask") if self.gt_mask_avail else None
        return entities, batch["obs_mask"], batch["entity_mask"], gt

    # --- forwards ---
    def forward_step(
        self,
        params,
        obs: Dict[str, jnp.ndarray],
        last_actions_onehot: Optional[jnp.ndarray],
        hidden: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One rollout step: returns (q (B, Na, A), new hidden)."""
        entities, om, em, gt = self.build_step_inputs(obs, last_actions_onehot)
        q, h = self.agent.apply(params, entities, om, em, hidden, gt_mask=gt)
        return q[:, 0], h

    def forward_episode(
        self,
        params,
        batch: Dict[str, jnp.ndarray],
        imagine: bool = False,
        imagine_key: Optional[jax.Array] = None,
        use_gt_factors: bool = False,
        use_rand_gt_factors: bool = False,
    ):
        """Whole-episode forward (learner path). With ``imagine`` returns
        (q (3B, T, Na, A), (W, I)) like the reference MAC
        (``basic_controller.py:39,65-66``); else q (B, T, Na, A)."""
        entities, om, em, gt = self.build_episode_inputs(batch)
        B = entities.shape[0]
        hidden = self.init_hidden(B)
        if imagine:
            q, _, groups = self.agent.apply(
                params,
                entities,
                om,
                em,
                hidden,
                imagine=True,
                imagine_key=imagine_key,
                gt_mask=gt,
                use_gt_factors=use_gt_factors,
                use_rand_gt_factors=use_rand_gt_factors,
            )
            return q, groups
        q, _ = self.agent.apply(params, entities, om, em, hidden, gt_mask=gt)
        return q


class BasicMAC:
    """Flat-observation controller (reference ``basic_controller.py``).

    Input building (``basic_controller.py:96-112``): obs ++ last-action onehot
    (``obs_last_action``) ++ agent-id eye (``obs_agent_id``).
    """

    def __init__(self, args, env_info: Dict[str, Any]):
        self.args = args
        self.n_agents = env_info["n_agents"]
        self.n_actions = env_info["n_actions"]
        self.obs_shape = env_info["obs_shape"]
        self.obs_last_action = bool(getattr(args, "obs_last_action", True))
        self.obs_agent_id = bool(getattr(args, "obs_agent_id", True))
        self.input_shape = (
            self.obs_shape
            + (self.n_actions if self.obs_last_action else 0)
            + (self.n_agents if self.obs_agent_id else 0)
        )
        self.is_imagine = False
        self.is_rnn = args.agent == "rnn"
        agent_cls = AGENT_REGISTRY[args.agent]
        self.agent = agent_cls(
            rnn_hidden_dim=args.rnn_hidden_dim, n_actions=self.n_actions
        )

    def init_params(self, key: jax.Array):
        inp = jnp.zeros((1, 2, self.n_agents, self.input_shape), jnp.float32)
        return self.agent.init(key, inp, self.init_hidden(1))

    def init_hidden(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros(
            (batch_size, self.n_agents, self.args.rnn_hidden_dim), jnp.float32
        )

    def _augment(self, obs: jnp.ndarray, last_oh: jnp.ndarray) -> jnp.ndarray:
        """obs (B, T, Na, O); last_oh (B, T, Na, A)."""
        B, T, Na, _ = obs.shape
        parts = [obs]
        if self.obs_last_action:
            parts.append(last_oh.astype(obs.dtype))
        if self.obs_agent_id:
            eye = jnp.broadcast_to(
                jnp.eye(Na, dtype=obs.dtype), (B, T, Na, Na)
            )
            parts.append(eye)
        return jnp.concatenate(parts, axis=3)

    def forward_step(self, params, obs, last_actions_onehot, hidden):
        inp = self._augment(obs["obs"][:, None], last_actions_onehot[:, None])
        q, h = self.agent.apply(params, inp, hidden)
        return q[:, 0], h

    def forward_episode(self, params, batch, **unused):
        obs = batch["obs"]
        ao = batch["actions_onehot"]
        last = jnp.concatenate([jnp.zeros_like(ao[:, :1]), ao[:, :-1]], axis=1)
        inp = self._augment(obs, last)
        hidden = self.init_hidden(obs.shape[0])
        q, _ = self.agent.apply(params, inp, hidden)
        return q


def pi_logits_transform(q, avail, epsilon, test_mode, mask_before_softmax=True):
    """``agent_output_type: pi_logits`` post-processing
    (reference ``basic_controller.py:43-62``): availability-masked softmax with
    an epsilon floor over available actions during training."""
    import jax.nn as jnn

    if mask_before_softmax:
        q = jnp.where(avail, q, -1e10)
    probs = jnn.softmax(q, axis=-1)
    if not test_mode:
        if mask_before_softmax:
            n_avail = avail.sum(axis=-1, keepdims=True).astype(probs.dtype)
        else:
            n_avail = jnp.asarray(q.shape[-1], probs.dtype)
        probs = (1 - epsilon) * probs + epsilon / n_avail
        if mask_before_softmax:
            probs = jnp.where(avail, probs, 0.0)
    return probs


MAC_REGISTRY = {"entity_mac": EntityMAC, "basic_mac": BasicMAC}
