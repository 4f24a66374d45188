"""Vectorized Group Matching environment (pure JAX array program).

Parity target: reference ``src/envs/group_matching/group_matching.py`` — the
paper's north-star diagnostic env. N agents on a ring of ``n_states`` cells,
actions {left, stay, right} with probability ``rand_trans`` of action
randomization; hidden random partition into ``n_groups``; reward
−0.1/step + 2.5·Δ(#groups piled on a single cell); solved when every group is
piled up.

TPU-first: the env is a batched array program — thousands of episodes step in
lockstep under one jit; there is no per-env Python object, no process pool, no
pipes (vs. ``parallel_runner.py``'s 8 forked workers).

Faithfulness notes (all checked against the reference line-by-line):
  * group construction (``group_matching.py:92-98``): agents are shuffled and
    sliced by unsorted random partition points, so groups can be EMPTY and can
    OVERLAP (when partition points are out of order). Membership is therefore
    a (N, G) boolean matrix, not a single group id.
  * empty groups count as matched (``:108-109``: ``max(sum of 0 rows) == 0``).
  * ``gt_mask`` uses each agent's FIRST containing group (``:59-64``).
  * the time-limit flag is set whether or not the episode also solved
    (``:44-52``), and ``t`` increments after the solve check.
  * dynamics consume per-agent uniform and randint draws; the transition is
    factored as a pure function of those draws so golden tests can feed both
    this env and a numpy re-implementation identical randomness.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .base import register_env, warn_unused_env_args


class GroupMatchingState(NamedTuple):
    locs: jnp.ndarray  # (B, N) int32 cell index of each agent
    member: jnp.ndarray  # (B, N, G) bool group membership (can overlap / be empty)
    prev_matches: jnp.ndarray  # (B,) int32 number of piled groups
    t: jnp.ndarray  # (B,) int32 episode step


@register_env("group_matching")
class GroupMatching:
    def __init__(
        self,
        entity_scheme: bool = True,
        n_agents: int = 4,
        n_states: int = 10,
        n_groups: int = 2,
        rand_trans: float = 0.1,
        episode_limit: int = 50,
        fixed_scen: bool = False,
        **unused,
    ):
        assert entity_scheme, "This environment only supports the entity scheme"
        warn_unused_env_args("GroupMatching", unused, accepted=("seed",))
        self.n_agents = n_agents
        self.n_states = n_states
        self.n_groups = n_groups
        self.rand_trans = rand_trans
        self.episode_limit = episode_limit
        self.fixed_scen = fixed_scen
        self.n_actions = 3  # left, stay, right

    # --- static scheme info (reference group_matching.py:120-127) ---
    def env_info(self) -> Dict[str, Any]:
        return {
            "entity_shape": self.n_states + self.n_groups + self.n_agents,
            "n_actions": self.n_actions,
            "n_agents": self.n_agents,
            "n_entities": self.n_agents,
            "gt_mask_avail": True,
            "episode_limit": self.episode_limit,
        }

    # --- pure helpers (shared with the golden-parity numpy model in tests) ---
    @staticmethod
    def membership_from_partitions(perm: jnp.ndarray, partitions: jnp.ndarray) -> jnp.ndarray:
        """perm: (B, N) shuffled agent ids; partitions: (B, G+1) slice points
        (unsorted in the middle). member[b, i, g] = agent i in group g, i.e.
        its position p in the shuffle satisfies partitions[g] <= p < partitions[g+1]
        (reference ``group_matching.py:92-98``)."""
        B, N = perm.shape
        G = partitions.shape[1] - 1
        # pos[b, i] = position of agent i in the shuffled list
        pos = jnp.zeros((B, N), jnp.int32)
        pos = pos.at[jnp.arange(B)[:, None], perm].set(
            jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        )
        lo = partitions[:, None, :-1]  # (B, 1, G)
        hi = partitions[:, None, 1:]  # (B, 1, G)
        p = pos[:, :, None]  # (B, N, 1)
        return (p >= lo) & (p < hi)

    @staticmethod
    def _matches(locs: jnp.ndarray, member: jnp.ndarray, n_states: int) -> jnp.ndarray:
        """#groups piled on one cell (reference ``_calc_group_piles``,
        ``group_matching.py:108-109``). Empty groups count as matched."""
        onehot = jax.nn.one_hot(locs, n_states, dtype=jnp.int32)  # (B, N, S)
        # counts[b, g, s] = members of g at cell s
        counts = jnp.einsum("bng,bns->bgs", member.astype(jnp.int32), onehot)
        group_size = member.sum(axis=1).astype(jnp.int32)  # (B, G)
        return (counts.max(axis=2) == group_size).sum(axis=1).astype(jnp.int32)

    @staticmethod
    def transition(
        locs: jnp.ndarray,
        actions: jnp.ndarray,
        rand_u: jnp.ndarray,
        rand_a: jnp.ndarray,
        rand_trans: float,
        n_states: int,
    ) -> jnp.ndarray:
        """Pure movement dynamics given explicit random draws.

        rand_u: (B, N) uniforms — if < rand_trans the action is replaced by
        rand_a (B, N) ∈ {0,1,2} (reference ``group_matching.py:22-35``)."""
        ac = jnp.where(rand_u < rand_trans, rand_a, actions)
        delta = ac - 1  # left=-1, stay=0, right=+1
        return jnp.mod(locs + delta, n_states)

    # --- functional API ---
    def reset(
        self,
        key: jax.Array,
        batch_size: int,
        test: bool = False,
        index: Optional[int] = None,
    ) -> Tuple[GroupMatchingState, Dict[str, jnp.ndarray]]:
        B, N, G = batch_size, self.n_agents, self.n_groups
        k_perm, k_part, k_loc = jax.random.split(key, 3)
        if not self.fixed_scen:
            perm = jax.vmap(lambda k: jax.random.permutation(k, N))(
                jax.random.split(k_perm, B)
            ).astype(jnp.int32)
            mid = jax.random.randint(k_part, (B, G - 1), 0, N, dtype=jnp.int32)
            partitions = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), mid, jnp.full((B, 1), N, jnp.int32)],
                axis=1,
            )
        else:
            perm = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
            pts = jnp.round(jnp.linspace(0, N, G + 1)).astype(jnp.int32)
            partitions = jnp.broadcast_to(pts, (B, G + 1))
        member = self.membership_from_partitions(perm, partitions)
        locs = jax.random.randint(k_loc, (B, N), 0, self.n_states, dtype=jnp.int32)
        prev = self._matches(locs, member, self.n_states)
        state = GroupMatchingState(
            locs=locs, member=member, prev_matches=prev, t=jnp.zeros((B,), jnp.int32)
        )
        return state, self.observe(state)

    def step(
        self, state: GroupMatchingState, actions: jnp.ndarray, key: jax.Array
    ) -> Tuple[GroupMatchingState, Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray, Dict]:
        B, N = state.locs.shape
        k_u, k_a = jax.random.split(key)
        rand_u = jax.random.uniform(k_u, (B, N))
        rand_a = jax.random.randint(k_a, (B, N), 0, self.n_actions, dtype=jnp.int32)
        locs = self.transition(
            state.locs, actions.astype(jnp.int32), rand_u, rand_a,
            self.rand_trans, self.n_states,
        )
        matches = self._matches(locs, state.member, self.n_states)
        # reward: time penalty + pile delta (reference group_matching.py:38-40)
        reward = -0.1 + 2.5 * (matches - state.prev_matches).astype(jnp.float32)
        solved = matches == self.n_groups
        t = state.t + 1
        at_limit = t == self.episode_limit
        done = solved | at_limit
        info = {"solved": solved, "episode_limit": at_limit}
        new_state = GroupMatchingState(
            locs=locs, member=state.member, prev_matches=matches, t=t
        )
        return new_state, self.observe(new_state), reward, done, info

    def observe(self, state: GroupMatchingState) -> Dict[str, jnp.ndarray]:
        B, N = state.locs.shape
        # entities = loc-onehot ++ group-onehot ++ agent-id (group_matching.py:66-73)
        locs_oh = jax.nn.one_hot(state.locs, self.n_states, dtype=jnp.float32)
        groups_oh = state.member.astype(jnp.float32)
        agent_ids = jnp.broadcast_to(jnp.eye(N, dtype=jnp.float32), (B, N, N))
        entities = jnp.concatenate([locs_oh, groups_oh, agent_ids], axis=2)
        # full observability; all slots active (group_matching.py:55-57)
        obs_mask = jnp.zeros((B, N, N), bool)
        entity_mask = jnp.zeros((B, N), bool)
        # gt_mask from each agent's FIRST containing group (group_matching.py:58-64)
        first_grp = jnp.argmax(state.member, axis=2)  # (B, N)
        # gt_unblocked[b, j, i] = member[b, j, first_grp[b, i]]
        gt_unblocked = jnp.take_along_axis(
            state.member, first_grp[:, None, :], axis=2
        )  # (B, N_j, N_i): member[b, j, first_grp[b, i]]
        gt_mask = ~gt_unblocked.transpose(0, 2, 1)  # (B, N_i agent rows, N_j)
        avail = jnp.ones((B, N, self.n_actions), bool)
        return {
            "entities": entities,
            "obs_mask": obs_mask,
            "entity_mask": entity_mask,
            "gt_mask": gt_mask,
            "avail_actions": avail,
        }
