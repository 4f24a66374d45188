"""Host-side RandomState-compatible GroupMatching twin.

The reference env (``src/envs/group_matching/group_matching.py``) consumes a
``np.random.RandomState(seed)`` stream in a specific, data-dependent order:

  reset (``:91-105``):
    1. ``rs.shuffle(agents)``            — one shuffle of the agent list
    2. ``rs.randint(0, N, size=(G-1,))`` — the middle partition points
    3. ``rs.randint(0, S, size=N)``      — initial agent locations
  step (``:22-35``), PER AGENT in index order:
    1. ``u = rs.uniform()``
    2. only if ``u < rand_trans``: ``ac = rs.randint(0, n_actions)``

Step 2 of the step loop makes consumption data-dependent: an agent whose
uniform does not trigger randomization consumes ONE draw, a triggered agent
consumes TWO. Any implementation that pre-draws both arrays for all agents
walks a different stream and diverges from reference trajectories after the
first trigger.

This module provides:

  * ``RandomStateGroupMatching`` — a twin that reproduces the reference's
    exact stream consumption (used to generate the committed golden files,
    cross-checked against the actual reference implementation);
  * ``reset_draws`` / ``step_draws`` — THE key->draws recipe: extract from a
    live RandomState, in the reference's exact order, the draw arrays that the
    functional JAX env (``group_matching.GroupMatching.transition`` /
    ``membership_from_partitions``) consumes. Driving the JAX env with these
    arrays yields trajectories bit-identical to the reference under the same
    seed.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def reset_draws(rs: np.random.RandomState, n_agents: int, n_groups: int,
                n_states: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Consume the reference's reset draws; returns (perm, partitions, locs).

    ``perm`` is the shuffled agent list, ``partitions`` the full (G+1,) slice
    points including the fixed 0/N endpoints, ``locs`` the initial cells.
    """
    agents = list(range(n_agents))
    rs.shuffle(agents)
    mid = rs.randint(0, n_agents, size=(n_groups - 1,)).tolist()
    partitions = np.asarray([0] + mid + [n_agents], np.int32)
    locs = rs.randint(0, n_states, size=n_agents).astype(np.int32)
    return np.asarray(agents, np.int32), partitions, locs


def step_draws(rs: np.random.RandomState, actions, rand_trans: float,
               n_actions: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Consume the reference's per-step draws; returns (rand_u, rand_a) arrays
    for the JAX ``transition``.

    The reference draws the replacement action ONLY when the uniform triggers;
    for non-triggered agents ``rand_a`` is filled with the agent's own action
    so ``transition`` (which always selects ``rand_a`` when ``u < rand_trans``)
    reproduces the identical move while the stream advances identically.
    """
    n = len(actions)
    rand_u = np.empty((n,), np.float64)
    rand_a = np.empty((n,), np.int32)
    for ia in range(n):
        u = rs.uniform()
        rand_u[ia] = u
        if u < rand_trans:
            rand_a[ia] = rs.randint(0, n_actions)
        else:
            rand_a[ia] = int(actions[ia])
    return rand_u, rand_a


class RandomStateGroupMatching:
    """Seed-faithful host twin of the reference env (no torch, no framework
    deps). Math follows reference ``group_matching.py:19-127`` exactly,
    including empty/overlapping groups from unsorted partition points and the
    first-containing-group gt_mask."""

    def __init__(self, n_agents=4, n_states=10, n_groups=2, rand_trans=0.1,
                 episode_limit=50, seed=None):
        self.n_agents = n_agents
        self.n_states = n_states
        self.n_groups = n_groups
        self.rand_trans = rand_trans
        self.episode_limit = episode_limit
        self.n_actions = 3
        self.random = np.random.RandomState(seed)

    # --- reference step (group_matching.py:19-53) ---
    def step(self, actions):
        for ia, ac in enumerate(list(actions)[: self.n_agents]):
            ac = int(ac)
            if self.random.uniform() < self.rand_trans:
                ac = int(self.random.randint(0, self.n_actions))
            if ac != 1:
                curr = int(np.where(self.agent_locs[ia])[0].item())
                self.agent_locs[ia, curr] = 0
                if ac == 0:
                    self.agent_locs[ia, curr - 1] = 1
                elif ac == 2:
                    nxt = curr + 1
                    if nxt >= self.n_states:
                        nxt -= self.n_states
                    self.agent_locs[ia, nxt] = 1
        curr_matches = self._calc_group_piles()
        rew = -0.1 + 2.5 * (curr_matches - self.prev_matches)
        self.prev_matches = curr_matches
        info = {"solved": False}
        done = False
        if curr_matches == self.n_groups:
            done = True
            info["solved"] = True
        self.t += 1
        if self.t == self.episode_limit:
            done = True
            info["episode_limit"] = True
        return rew, done, info

    # --- reference reset (group_matching.py:91-105) ---
    def reset(self):
        agents = list(range(self.n_agents))
        self.random.shuffle(agents)
        partitions = (
            [0]
            + self.random.randint(0, self.n_agents, size=(self.n_groups - 1,)).tolist()
            + [self.n_agents]
        )
        self.agent_groups = [
            agents[s:e] for s, e in zip(partitions[:-1], partitions[1:])
        ]
        self.agent_locs = np.zeros((self.n_agents, self.n_states), np.float32)
        self.agent_locs[
            range(self.n_agents),
            self.random.randint(0, self.n_states, size=self.n_agents),
        ] = 1
        self.prev_matches = self._calc_group_piles()
        self.t = 0
        return self.get_entities(), self.get_masks()

    def _calc_group_piles(self):
        return sum(
            self.agent_locs[g].sum(0).max() == len(g) for g in self.agent_groups
        )

    def get_entities(self):
        groups = np.zeros((self.n_agents, self.n_groups), np.float32)
        for ig, grp in enumerate(self.agent_groups):
            groups[grp, ig] = 1
        agent_ids = np.eye(self.n_agents, dtype=np.float32)
        return np.concatenate((self.agent_locs.copy(), groups, agent_ids), axis=1)

    def get_masks(self):
        obs_mask = np.zeros((self.n_agents, self.n_agents), np.uint8)
        entity_mask = np.zeros(self.n_agents, np.uint8)
        gt = np.ones((self.n_agents, self.n_agents), np.uint8)
        for ia in range(self.n_agents):
            for grp in self.agent_groups:
                if ia in grp:
                    gt[ia, grp] = 0
                    break
        return obs_mask, entity_mask, gt

    @property
    def locs(self) -> np.ndarray:
        return self.agent_locs.argmax(1).astype(np.int32)
