"""End-to-end learning smoke: the full pipeline must actually improve the
policy on a trivially learnable Group Matching task (2 agents, 3 cells, no
action noise: meet on one cell).

This is the integration gate the reference lacks entirely (it has no tests);
loss-goes-down alone does not catch sign errors in targets/masks.
"""
import numpy as np
import pytest

from refil_tpu.config import args_sanity_check, config_to_args, load_config
from refil_tpu.controllers.mac import MAC_REGISTRY
from refil_tpu.core.buffer import ReplayBuffer
from refil_tpu.envs.group_matching import GroupMatching
from refil_tpu.learners.q_learner import QLearner
from refil_tpu.run import _dummy_batch
from refil_tpu.runners.vector_runner import VectorRunner


@pytest.mark.slow
def test_qmix_atten_learns_trivial_matching():
    import jax

    cfg = load_config(alg="qmix_atten_group_matching", env="group_matching")
    cfg["env_args"].update(n_agents=2, n_states=3, episode_limit=20, rand_trans=0.0)
    cfg.update(buffer_size=500, epsilon_anneal_time=2000, test_nepisode=80)
    args = config_to_args(args_sanity_check(cfg))
    args.entity_scheme = True
    env = GroupMatching(**cfg["env_args"])
    info = env.env_info()
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    args.n_entities = info["n_entities"]
    args.entity_shape = info["entity_shape"]
    args.gt_mask_avail = info["gt_mask_avail"]

    mac = MAC_REGISTRY["entity_mac"](args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    state = learner.init_state(key, _dummy_batch(mac, info))
    runner = VectorRunner(env, mac, args, logger=None)
    buffer = None

    def test_solved():
        runner.test_stats.clear()
        runner.test_returns.clear()
        for i in range(10):
            key_t = jax.random.PRNGKey(1000 + i)
            runner.run(state.params["agent"], key_t, test_mode=True)
        return runner.test_stats["solved"] / runner.test_stats["n_episodes"]

    episode = 0
    while runner.t_env <= 15000:
        key, k_roll, k_train = jax.random.split(key, 3)
        batch = runner.run(state.params["agent"], k_roll)
        if buffer is None:
            buffer = ReplayBuffer(batch, args.buffer_size, seed=0)
        buffer.insert_episode_batch(batch)
        if buffer.can_sample(args.batch_size):
            samples = buffer.sample_many(args.training_iters, args.batch_size)
            state, _ = learner.train_iters(state, samples, k_train, runner.t_env, episode)
        episode += args.batch_size_run

    final = test_solved()
    assert final > 0.6, f"policy failed to learn: solved={final}"
