"""Golden-trajectory parity: the vectorized JAX GroupMatching env vs a numpy
re-implementation of the reference math (``src/envs/group_matching/
group_matching.py``), fed IDENTICAL random draws.

This is the BASELINE.md north-star gate: trajectories, rewards, entities and
masks must match bit-exactly given the same randomness.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from refil_tpu.envs.group_matching import GroupMatching


class NumpyGroupMatching:
    """Faithful numpy model of the reference env semantics (not a copy: the
    reference's per-agent loops re-expressed with injectable randomness)."""

    def __init__(self, n_agents, n_states, n_groups, rand_trans, episode_limit):
        self.n_agents = n_agents
        self.n_states = n_states
        self.n_groups = n_groups
        self.rand_trans = rand_trans
        self.episode_limit = episode_limit

    def reset_with(self, perm, partitions, locs):
        agents = list(perm)
        self.agent_groups = [
            agents[s:e] for s, e in zip(partitions[:-1], partitions[1:])
        ]
        self.agent_locs = np.zeros((self.n_agents, self.n_states), np.float32)
        self.agent_locs[range(self.n_agents), locs] = 1
        self.prev_matches = self._calc_group_piles()
        self.t = 0

    def _calc_group_piles(self):
        return sum(
            self.agent_locs[g].sum(0).max() == len(g) for g in self.agent_groups
        )

    def step_with(self, actions, rand_u, rand_a):
        for ia, ac in enumerate(actions[: self.n_agents]):
            ac = int(ac)
            if rand_u[ia] < self.rand_trans:
                ac = int(rand_a[ia])
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
        solved = curr_matches == self.n_groups
        done = bool(solved)
        self.t += 1
        limit = self.t == self.episode_limit
        if limit:
            done = True
        return rew, done, {"solved": bool(solved), "episode_limit": bool(limit)}

    def get_entities(self):
        groups = np.zeros((self.n_agents, self.n_groups), np.float32)
        for ig, grp in enumerate(self.agent_groups):
            groups[grp, ig] = 1
        agent_ids = np.eye(self.n_agents, dtype=np.float32)
        return np.concatenate((self.agent_locs, groups, agent_ids), axis=1)

    def get_gt_mask(self):
        gt = np.ones((self.n_agents, self.n_agents), np.uint8)
        for ia in range(self.n_agents):
            for grp in self.agent_groups:
                if ia in grp:
                    gt[ia, grp] = 0
                    break
        return gt


def _jax_state_from(env, perm, partitions, locs):
    member = env.membership_from_partitions(
        jnp.asarray(perm)[None], jnp.asarray(partitions)[None]
    )
    locs_j = jnp.asarray(locs, jnp.int32)[None]
    prev = env._matches(locs_j, member, env.n_states)
    from refil_tpu.envs.group_matching import GroupMatchingState

    return GroupMatchingState(
        locs=locs_j, member=member, prev_matches=prev, t=jnp.zeros((1,), jnp.int32)
    )


@pytest.mark.parametrize("seed,n_groups", [(0, 2), (1, 2), (2, 3), (3, 3)])
def test_trajectory_parity(seed, n_groups):
    import jax
    from functools import partial

    N, S, G = 8, 6, n_groups
    rng = np.random.RandomState(seed)
    env = GroupMatching(
        n_agents=N, n_states=S, n_groups=G, rand_trans=0.1, episode_limit=50
    )
    ref = NumpyGroupMatching(N, S, G, 0.1, 50)

    step_math = jax.jit(
        lambda locs, member, prev, a, u, ra: (
            lambda ln: (ln, env._matches(ln, member, S))
        )(env.transition(locs, a, u, ra, env.rand_trans, S))
    )
    observe_j = jax.jit(env.observe)

    perm = rng.permutation(N)
    partitions = [0] + rng.randint(0, N, size=(G - 1,)).tolist() + [N]
    locs = rng.randint(0, S, size=N)

    ref.reset_with(perm, partitions, locs)
    state = _jax_state_from(env, perm, np.array(partitions), locs)
    obs = env.observe(state)

    # reset-time observation parity
    np.testing.assert_array_equal(np.asarray(obs["entities"][0]), ref.get_entities())
    np.testing.assert_array_equal(
        np.asarray(obs["gt_mask"][0]).astype(np.uint8), ref.get_gt_mask()
    )
    assert not np.asarray(obs["obs_mask"]).any()
    assert not np.asarray(obs["entity_mask"]).any()

    for t in range(50):
        actions = rng.randint(0, 3, size=N)
        rand_u = rng.uniform(size=N)
        rand_a = rng.randint(0, 3, size=N)

        rew_ref, done_ref, info_ref = ref.step_with(actions, rand_u, rand_a)

        locs_next, matches = step_math(
            state.locs,
            state.member,
            state.prev_matches,
            jnp.asarray(actions)[None],
            jnp.asarray(rand_u)[None],
            jnp.asarray(rand_a)[None],
        )
        rew_jax = -0.1 + 2.5 * float(matches[0] - state.prev_matches[0])
        solved = int(matches[0]) == G
        from refil_tpu.envs.group_matching import GroupMatchingState

        state = GroupMatchingState(
            locs=locs_next, member=state.member, prev_matches=matches, t=state.t + 1
        )
        done_jax = solved or (int(state.t[0]) == 50)

        assert abs(rew_ref - rew_jax) < 1e-6, (t, rew_ref, rew_jax)
        assert done_ref == done_jax
        np.testing.assert_array_equal(
            np.asarray(observe_j(state)["entities"][0]), ref.get_entities()
        )
        if done_ref:
            break


def test_overlapping_and_empty_groups():
    """Unsorted partition points create empty/overlapping groups; both
    implementations must agree (reference group_matching.py:95-98 quirk)."""
    N, S, G = 6, 5, 3
    env = GroupMatching(n_agents=N, n_states=S, n_groups=G, rand_trans=0.0,
                        episode_limit=50)
    ref = NumpyGroupMatching(N, S, G, 0.0, 50)
    perm = np.array([3, 1, 5, 0, 2, 4])
    partitions = np.array([0, 4, 2, N])  # middle out of order: empty + overlap
    locs = np.array([0, 0, 0, 0, 0, 0])
    ref.reset_with(perm, partitions, locs)
    state = _jax_state_from(env, perm, partitions, locs)
    # group sizes: [0:4], [4:2]=empty, [2:6] -> overlap of positions 2,3
    member = np.asarray(state.member[0])
    sizes = member.sum(0)
    assert sizes[1] == 0  # empty group
    assert member.sum() > N  # overlap: some agent in two groups
    np.testing.assert_array_equal(
        np.asarray(env.observe(state)["entities"][0]), ref.get_entities()
    )
    np.testing.assert_array_equal(
        np.asarray(env.observe(state)["gt_mask"][0]).astype(np.uint8),
        ref.get_gt_mask(),
    )
    # all agents piled on one cell: every (non-empty and empty) group matched
    assert int(state.prev_matches[0]) == ref.prev_matches == G


def test_env_step_api():
    import jax

    env = GroupMatching(n_agents=4, n_states=6, n_groups=2, rand_trans=0.1,
                        episode_limit=5)
    state, obs = env.reset(jax.random.PRNGKey(0), batch_size=3)
    assert obs["entities"].shape == (3, 4, 6 + 2 + 4)
    for t in range(5):
        actions = jnp.ones((3, 4), jnp.int32)
        state, obs, rew, done, info = env.step(
            state, actions, jax.random.PRNGKey(t + 1)
        )
    assert bool(done.all())  # episode limit reached
    assert bool(info["episode_limit"].all())
