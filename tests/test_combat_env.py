"""Combat env contract tests: reward accounting, masks, termination, tags,
shield regeneration."""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.envs.combat.env import EntityBattle
from refil_tpu.envs.combat.scenarios import SCENARIO_REGISTRY, fixed_armies


def _mk(name="1-5m_symmetric", **kw):
    return EntityBattle(scenario_dict=SCENARIO_REGISTRY[name](), **kw)


def test_masks_and_entity_contract():
    env = _mk("3-8sz_symmetric")
    state, obs = env.reset(jax.random.PRNGKey(0), 3)
    Ne = env.max_na + env.max_ne
    assert obs["entities"].shape == (3, Ne, env.get_entity_size())
    # padding slots: entity_mask 1, fully masked rows/cols in obs_mask
    em = np.asarray(obs["entity_mask"])
    om = np.asarray(obs["obs_mask"])
    for b in range(3):
        pads = np.where(em[b])[0]
        assert om[b][pads].all() and om[b][:, pads].all()
        # zero features in padding slots
        assert not np.asarray(obs["entities"])[b][pads].any()
    # active units see themselves
    act = ~em
    for b in range(3):
        ids = np.where(act[b])[0]
        assert not om[b][ids, ids].any()


def test_tag_uniqueness_and_action_targeting():
    env = _mk("3-8m_symmetric")
    state, obs = env.reset(jax.random.PRNGKey(1), 8)
    tags_e = np.asarray(state.e_tags)
    tags_a = np.asarray(state.a_tags)
    for b in range(8):
        assert len(set(tags_e[b])) == env.max_ne  # unique
        assert len(set(tags_a[b])) == env.max_na
        assert (tags_a[b] >= env.n_tags_e).all()
    # slot lookup tables invert the tag assignment
    sot = np.asarray(state.e_slot_of_tag)
    for b in range(8):
        for slot, tag in enumerate(tags_e[b]):
            assert sot[b, tag] == slot


def test_reward_and_win():
    # 2 marines vs 1 marine at point blank: allies should win and the
    # total reward should approach max scaling (damage+kill+win)/scale
    sd = fixed_armies([(2, "Marine")], [(1, "Marine")], separation=2,
                      jitter=0, episode_limit=50)
    env = EntityBattle(scenario_dict=sd)
    state, obs = env.reset(jax.random.PRNGKey(0), 2)
    step = jax.jit(env.step)
    total = np.zeros(2)
    won = np.zeros(2, bool)
    done_any = np.zeros(2, bool)
    key = jax.random.PRNGKey(1)
    for t in range(50):
        # everyone attacks the enemy's tag (slot 0 -> tag)
        tag = state.e_tags[:, 0]
        actions = jnp.stack([6 + tag, 6 + tag], axis=1)
        avail = np.asarray(obs["avail_actions"])
        # if not yet in range, move east/west toward center: use avail action 1 (stop)
        acts = np.asarray(actions)
        for b in range(2):
            for i in range(2):
                if not avail[b, i, acts[b, i]]:
                    acts[b, i] = 1 if avail[b, i, 1] else 0
        key, k = jax.random.split(key)
        state, obs, rew, done, info = step(state, jnp.asarray(acts), k)
        total += np.asarray(rew) * ~done_any
        won |= np.asarray(info["battle_won"]) & ~done_any
        done_any |= np.asarray(done)
        if done_any.all():
            break
    assert won.all(), "2v1 focused marines must win"
    # reward scaled to ~reward_scale_rate at a clean sweep
    assert (total > 15).all() and (total <= 21).all(), total


def test_shield_regen():
    sd = fixed_armies([(1, "Stalker")], [(1, "Stalker")], separation=80,
                      jitter=0, episode_limit=200)
    env = EntityBattle(scenario_dict=sd, map_size=128.0)
    state, obs = env.reset(jax.random.PRNGKey(0), 1)
    # damage the ally shield artificially, mark hit long ago
    state = state._replace(
        a_shield=state.a_shield * 0.0,
        a_last_hit=jnp.full_like(state.a_last_hit, -1000),
    )
    s0 = float(state.a_shield[0, 0])
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    for t in range(20):
        key, k = jax.random.split(key)
        state, obs, rew, done, info = step(state, jnp.ones((1, 1), jnp.int32), k)
    s1 = float(state.a_shield[0, 0])
    assert s1 > s0 + 5.0, (s0, s1)  # regenerated while unhit


def test_timeout_sets_episode_limit():
    sd = fixed_armies([(1, "Marine")], [(1, "Marine")], separation=25,
                      jitter=0, episode_limit=5)
    env = EntityBattle(scenario_dict=sd, map_size=64.0)
    state, obs = env.reset(jax.random.PRNGKey(0), 2)
    key = jax.random.PRNGKey(1)
    for t in range(5):
        key, k = jax.random.split(key)
        state, obs, rew, done, info = env.step(
            state, jnp.ones((2, 1), jnp.int32), k
        )
    assert bool(done.all())
    assert bool(info["episode_limit"].all())
    assert not bool(info["battle_won"].any())


def test_per_group_spawn_anchors():
    """Each (count, type) group draws its own spawn jitter around the army
    anchor (reference _assign_pos per-group rs.rand(2), starcraft2custom.py:
    458-459): units of one group share an anchor (positions differ only by the
    rank spread); different groups get different anchors."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from refil_tpu.envs.combat.env import EntityBattle
    from refil_tpu.envs.combat.scenarios import SCENARIO_REGISTRY

    sd = SCENARIO_REGISTRY["3-8sz_symmetric"]()
    env = EntityBattle(scenario_dict=sd)
    assert env.n_groups_a >= 2
    B = 64
    state, _ = env.reset(jax.random.PRNGKey(11), B)
    grp = np.asarray(env.sc_j["ally_group"][state.scen])
    rank = np.asarray(env.sc_j["ally_rank"][state.scen])
    active = np.asarray(state.a_active)
    # subtract the deterministic rank spread -> remaining = anchor + group jit
    anchors = np.asarray(state.a_pos) - np.asarray(env.rank_spread)[rank]
    checked_same = checked_diff = 0
    for b in range(B):
        idx = np.where(active[b])[0]
        # positions away from map borders only (clipping breaks the identity)
        pos = np.asarray(state.a_pos)[b]
        inb = (pos > 1.5).all(-1) & (pos < env.map_size - 1.5).all(-1)
        idx = [i for i in idx if inb[i]]
        for i in idx:
            for j in idx:
                if i >= j:
                    continue
                if grp[b, i] == grp[b, j]:
                    np.testing.assert_allclose(
                        anchors[b, i], anchors[b, j], atol=1e-4
                    )
                    checked_same += 1
                elif abs(anchors[b, i] - anchors[b, j]).max() > 1e-6:
                    checked_diff += 1
    assert checked_same > 10
    assert checked_diff > 10
