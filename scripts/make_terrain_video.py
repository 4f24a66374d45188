"""Generate a terrain-map eval video (VERDICT r2 item 8 'done' artifact):
a recorded rollout on the corridor map rendered with walkability shading,
facing arrows and attack lines.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/make_terrain_video.py [out]
"""
import os
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import numpy as np

    from refil_tpu.config import Args
    from refil_tpu.controllers.mac import BasicMAC
    from refil_tpu.envs.combat import render as crender
    from refil_tpu.envs.combat.flat_env import FlatBattle
    from refil_tpu.runners.vector_runner import VectorRunner

    out = sys.argv[1] if len(sys.argv) > 1 else "results/corridor_eval.mp4"
    map_name = sys.argv[2] if len(sys.argv) > 2 else "corridor"
    env = FlatBattle(map_name=map_name, episode_limit=100)
    info = env.env_info()
    args = Args(
        batch_size_run=1, epsilon_start=0.3, epsilon_finish=0.3,
        epsilon_anneal_time=10, test_nepisode=1, runner_log_interval=10**9,
        agent="rnn", rnn_hidden_dim=32, obs_agent_id=True,
        obs_last_action=True, double_q=True, agent_output_type="q",
        action_selector="epsilon_greedy", test_greedy=True,
        entity_scheme=False,
    )
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    args.state_shape = info["state_shape"]
    mac = BasicMAC(args, info)
    params = mac.init_params(jax.random.PRNGKey(0))
    runner = VectorRunner(env, mac, args, logger=None)
    runner.run(params, jax.random.PRNGKey(3), record=True)

    core = env.core
    geo = (np.asarray(core.pathing_grid), np.asarray(core.terrain_height))
    frames = crender.frames_for_env(
        runner.last_recording, 0, env.map_size, geometry=geo
    )
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    written = crender.save_video(out, frames, fps=4)
    print(f"wrote {written} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
