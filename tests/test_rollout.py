"""Rollout semantics: filled/terminated conventions of the reference parallel
runner (``parallel_runner.py:117-197``) reproduced by the lockstep scan."""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.config import Args
from refil_tpu.controllers.mac import EntityMAC
from refil_tpu.envs.group_matching import GroupMatching
from refil_tpu.runners.vector_runner import VectorRunner


def _setup(episode_limit=6, n_agents=3, batch_size_run=4):
    env = GroupMatching(
        n_agents=n_agents, n_states=4, n_groups=2, rand_trans=0.1,
        episode_limit=episode_limit,
    )
    info = env.env_info()
    args = Args(
        agent="entity_attend_ff",
        entity_last_action=False,
        attn_embed_dim=8,
        attn_n_heads=2,
        rnn_hidden_dim=8,
        pooling_type=None,
        gt_obs_mask=False,
        batch_size_run=batch_size_run,
        epsilon_start=1.0,
        epsilon_finish=0.05,
        epsilon_anneal_time=100,
        test_nepisode=4,
        runner_log_interval=10,
    )
    mac = EntityMAC(args, info)
    params = mac.init_params(jax.random.PRNGKey(0))
    runner = VectorRunner(env, mac, args, logger=None)
    return env, mac, params, runner


def test_batch_shapes_and_filled_semantics():
    env, mac, params, runner = _setup()
    batch = runner.run(params, jax.random.PRNGKey(1))
    L = env.episode_limit + 1
    B = 4
    assert batch["entities"].shape == (B, L, 3, env.env_info()["entity_shape"])
    assert batch["filled"].shape == (B, L, 1)

    filled = np.asarray(batch["filled"][..., 0])
    term = np.asarray(batch["terminated"][..., 0])
    # filled[0] always 1; filled is a prefix (monotone non-increasing)
    assert (filled[:, 0] == 1).all()
    assert ((filled[:, 1:] <= filled[:, :-1])).all()
    for b in range(B):
        T_f = int(filled[b].sum())
        # after a real termination at t, filled covers up to t+1 inclusive
        if term[b].any():
            t_d = int(np.argmax(term[b]))
            assert T_f == t_d + 2
            # everything after the terminal slot is zero
            assert not np.asarray(batch["entities"])[b, T_f:].any()
            assert not np.asarray(batch["actions"])[b, T_f - 1 :].any()
        else:
            # ran to the episode limit (or solved exactly at limit):
            # all slots filled, terminated never set (time-limit truncation)
            assert T_f == L


def test_time_limit_not_marked_terminated():
    # rand_trans=0 + stay actions => never solved (stat: groups apart) —
    # eps=0 greedy could still solve; instead use episode_limit=2 with random
    # policy and check: done-by-limit rows have terminated == 0 at final step
    env, mac, params, runner = _setup(episode_limit=2)
    batch = runner.run(params, jax.random.PRNGKey(3))
    filled = np.asarray(batch["filled"][..., 0])
    term = np.asarray(batch["terminated"][..., 0])
    for b in range(4):
        if filled[b].all():  # reached the limit
            assert term[b, -2] == 0  # truncation is not termination


def test_returns_accounted_only_while_alive():
    env, mac, params, runner = _setup()
    runner.logger = None
    batch = runner.run(params, jax.random.PRNGKey(2))
    rew = np.asarray(batch["reward"][..., 0])
    filled = np.asarray(batch["filled"][..., 0])
    # rewards only where a transition happened (filled shifted)
    written = np.concatenate([filled[:, 1:], np.zeros_like(filled[:, :1])], 1)
    assert (rew[written == 0] == 0).all()
    # train stats accumulated
    assert runner.train_stats["n_episodes"] == 4
    assert runner.t_env == int(np.asarray(batch["filled"]).sum() - 4)  # minus t=0 slots


def test_rnn_agent_rollout_hidden_threading():
    env = GroupMatching(n_agents=3, n_states=4, n_groups=2, rand_trans=0.1,
                        episode_limit=4)
    info = env.env_info()
    args = Args(
        agent="entity_attend_rnn",
        entity_last_action=True,
        attn_embed_dim=8,
        attn_n_heads=2,
        rnn_hidden_dim=8,
        pooling_type=None,
        gt_obs_mask=False,
        batch_size_run=2,
        epsilon_start=1.0,
        epsilon_finish=0.05,
        epsilon_anneal_time=100,
        test_nepisode=2,
        runner_log_interval=10,
    )
    mac = EntityMAC(args, info)
    params = mac.init_params(jax.random.PRNGKey(0))
    runner = VectorRunner(env, mac, args, logger=None)
    batch = runner.run(params, jax.random.PRNGKey(1))
    assert batch["entities"].shape[1] == 5


def test_cumulative_env_stats_surface():
    """The runner accumulates the reference's cumulative battle stats
    (get_stats surface, starcraft2custom.py:1865-1874): battles_won,
    battles_game, win_rate, timeouts; restarts stays 0 by construction."""
    from refil_tpu.envs.combat.scenarios import fixed_armies
    from refil_tpu.envs.combat.env import EntityBattle
    from refil_tpu.learners.q_learner import QLearner  # noqa: F401 (import path check)

    env = EntityBattle(
        scenario_dict=fixed_armies(
            [(2, "Marine")], [(2, "Marine")], episode_limit=5
        ),
        episode_limit=5,
    )
    info = env.env_info()
    args = Args(
        batch_size_run=4, epsilon_start=1.0, epsilon_finish=1.0,
        epsilon_anneal_time=10, test_nepisode=4, runner_log_interval=10**9,
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
    runner = VectorRunner(env, mac, args, logger=None)

    runner.run(params, jax.random.PRNGKey(1))
    runner.run(params, jax.random.PRNGKey(2), test_mode=True)
    st = runner.env_stats()
    # two blocks of 4 episodes each (train AND test count, like the
    # reference's env-lifetime counters)
    assert st["battles_game"] == 8
    assert 0 <= st["battles_won"] <= 8
    assert 0 <= st["timeouts"] <= 8
    assert st["win_rate"] == st["battles_won"] / 8
    assert st["restarts"] == 0.0
    # a 5-step cap on a 2v2 marine fight: most episodes time out
    assert st["timeouts"] >= 1
