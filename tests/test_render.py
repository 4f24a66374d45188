"""Renderer fidelity: facing arrows, attack lines, terrain shading
(reference ``starcraft2custom.py:1560-1633``)."""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.config import Args
from refil_tpu.controllers.mac import EntityMAC
from refil_tpu.envs.combat.env import EntityBattle
from refil_tpu.envs.combat.scenarios import fixed_armies
from refil_tpu.runners.vector_runner import VectorRunner


def _runner(episode_limit=6):
    env = EntityBattle(
        scenario_dict=fixed_armies(
            [(2, "Marine")], [(2, "Marine")], episode_limit=episode_limit
        ),
        episode_limit=episode_limit,
    )
    info = env.env_info()
    args = Args(
        batch_size_run=2, epsilon_start=1.0, epsilon_finish=1.0,
        epsilon_anneal_time=10, test_nepisode=2, runner_log_interval=10**9,
        attn_embed_dim=8, attn_n_heads=2, rnn_hidden_dim=8,
        agent="entity_attend_ff", entity_last_action=False, obs_agent_id=False,
        obs_last_action=False, pooling_type=None, double_q=True,
        agent_output_type="q", action_selector="epsilon_greedy",
        test_greedy=True,
    )
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    args.n_entities = info["n_entities"]
    args.entity_shape = info["entity_shape"]
    args.gt_mask_avail = info.get("gt_mask_avail", False)
    mac = EntityMAC(args, info)
    params = mac.init_params(jax.random.PRNGKey(0))
    return env, VectorRunner(env, mac, args, logger=None), params


def test_record_includes_targets_and_facing():
    env, runner, params = _runner()
    runner.run(params, jax.random.PRNGKey(1), record=True)
    rec = runner.last_recording
    assert rec is not None and len(rec) == env.episode_limit
    for k in ("pos", "target", "facing", "facing_valid", "cd_ratio"):
        assert k in rec[0], k
    tg = np.stack([r["target"] for r in rec])  # (T, B, N)
    N = rec[0]["pos"].shape[1]
    assert tg.min() >= -1 and tg.max() < N
    # the scripted enemies advance on the allies -> some step has a target or
    # a valid facing somewhere
    fv = np.stack([r["facing_valid"] for r in rec])
    assert fv.any()


def test_render_frame_draws_with_extras_and_geometry():
    from refil_tpu.envs.combat.flat_env import map_geometry
    from refil_tpu.envs.combat import render as crender

    env, runner, params = _runner()
    runner.run(params, jax.random.PRNGKey(2), record=True)
    geo = map_geometry("corridor", env.map_size)
    frame_geo = crender.render_frame(
        runner.last_recording[2], 0, env.map_size, geometry=geo
    )
    frame_plain = crender.render_frame(
        runner.last_recording[2], 0, env.map_size
    )
    assert frame_geo.ndim == 3 and frame_geo.shape[2] == 3
    # terrain shading must actually change the background
    assert (frame_geo != frame_plain).any()
    # corridor walls are dark: there are clearly dark background pixels
    assert (frame_geo.mean(axis=2) < 80).any()
