"""Vectorized lockstep episode runner — one jitted ``lax.scan`` per episode block.

Replaces the reference's process-pool runner (``src/runners/parallel_runner.py``:
8 forked env workers over pipes) and episode runner with a single on-device
program: reset B envs, scan ``episode_limit`` steps, auto-masking envs that
terminate early. B is a free scaling knob (8 for parity configs, thousands on
TPU).

Filled/terminated semantics reproduce the reference exactly
(``parallel_runner.py:117-197``):
  * ``filled[0] = 1``; ``filled[t+1] = alive_t`` (env alive at start of step t),
    so the terminal observation slot is written;
  * ``terminated[t] = done_t AND NOT episode_limit_t`` (``:177-183``) — the
    time-limit truncation bootstraps through, real termination does not;
  * data for envs after termination stays zero (never written);
  * episode length axis is ``episode_limit + 1`` (``run.py:198``).

Divergence (no effect on training math): the reference selects one extra
action from the terminal observation and stores it (``parallel_runner.py:121-128``
on the final loop iteration); the learner only consumes ``actions[:, :-1]``,
so we skip that forward pass.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..components.action_selectors import epsilon_greedy, multinomial
from ..core.schedules import DecayThenFlatSchedule


def _mask_like(flag: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Zero out batch rows where ``flag`` is False (any trailing shape)."""
    f = flag.reshape(flag.shape + (1,) * (x.ndim - flag.ndim))
    return jnp.where(f, x, jnp.zeros((), x.dtype))


def _select_state(flag: jnp.ndarray, new, old):
    """Per-env select between two state pytrees (freeze finished envs)."""

    def sel(n, o):
        f = flag.reshape(flag.shape + (1,) * (n.ndim - flag.ndim))
        return jnp.where(f, n, o)

    return jax.tree.map(sel, new, old)


class VectorRunner:
    def __init__(self, env, mac, args, logger=None):
        self.env = env
        self.mac = mac
        self.args = args
        self.logger = logger
        self.batch_size = args.batch_size_run
        info = env.env_info()
        self.episode_limit = info["episode_limit"]
        self.n_agents = info["n_agents"]
        self.n_actions = info["n_actions"]
        self.t_env = 0
        self.schedule = DecayThenFlatSchedule(
            args.epsilon_start, args.epsilon_finish, args.epsilon_anneal_time,
            decay="linear",
        )
        self.epsilon = float(self.schedule.eval(0))
        # stats accumulators (reference parallel_runner.py:203-233)
        self.train_stats: Dict[str, float] = {}
        self.test_stats: Dict[str, float] = {}
        self.train_returns: list = []
        self.test_returns: list = []
        # cumulative env stats (reference get_stats surface,
        # starcraft2custom.py:1865-1874): the reference env object accumulates
        # these across its lifetime; our envs are stateless pytree programs,
        # so the runner owns the counters. ``restarts`` stays 0 by
        # construction — a pure-function env cannot crash mid-episode.
        self.battles_won = 0
        self.battles_game = 0
        self.timeouts = 0
        self.log_train_stats_t = -1000000
        # `index` is traced (scenario id as data) so per-scenario eval does not
        # recompile; batch_size/test/record change program structure and stay
        # static
        self._rollout = jax.jit(
            self._rollout_impl,
            static_argnames=("batch_size", "test", "record"),
        )
        self.last_recording = None  # render-state trajectory from record=True runs

    # ------------------------------------------------------------------
    def _rollout_impl(
        self,
        params,
        key: jax.Array,
        epsilon: jnp.ndarray,
        index: jnp.ndarray,
        batch_size: int,
        test: bool = False,
        record: bool = False,
    ):
        env, mac = self.env, self.mac
        B, T = batch_size, self.episode_limit
        k_reset, k_scan = jax.random.split(key)
        state0, obs0 = env.reset(k_reset, B, test=test, index=index)
        hidden0 = mac.init_hidden(B)
        alive0 = jnp.ones((B,), bool)
        last_oh0 = jnp.zeros((B, self.n_agents, self.n_actions), jnp.float32)

        # final-info accumulators captured at each env's termination step
        info_proto = {
            k: jnp.zeros((B,), jnp.float32)
            for k in getattr(env, "final_info_keys", ("solved",))
        }

        output_type = getattr(self.args, "agent_output_type", "q")
        selector = getattr(self.args, "action_selector", "epsilon_greedy")
        test_greedy = bool(getattr(self.args, "test_greedy", True))

        def select(k, q, avail):
            if output_type == "pi_logits":
                from ..controllers.mac import pi_logits_transform

                probs = pi_logits_transform(
                    q, avail, epsilon, test,
                    mask_before_softmax=bool(
                        getattr(self.args, "mask_before_softmax", True)
                    ),
                )
                return multinomial(k, probs, avail, test_greedy, test)
            if selector == "multinomial":
                return multinomial(k, q, avail, test_greedy, test)
            return epsilon_greedy(k, q, avail, epsilon)

        # the reference ships this knob under env_args (sc2custom.yaml);
        # honor both spellings so neither silently no-ops
        heuristic = (
            bool(getattr(self.args, "heuristic_ai", False))
            or bool(getattr(self.args, "env_args", {}).get("heuristic_ai", False))
        ) and hasattr(env, "heuristic_actions")

        def step_fn(carry, kt):
            state, obs, hidden, alive, last_oh, ep_ret, ep_len, final_info = carry
            k_act, k_env = jax.random.split(kt)
            q, hidden_new = mac.forward_step(params, obs, last_oh, hidden)
            if heuristic:
                # scripted ally policy (reference heuristic_ai); the env gates
                # the choice against avail_actions so the recorded action is
                # always one the learner's avail mask permits
                actions = env.heuristic_actions(
                    state.core if hasattr(state, "core") else state,
                    obs["avail_actions"],
                )
            else:
                actions = select(k_act, q, obs["avail_actions"])
            n_state, n_obs, rew, done, info = env.step(state, actions, k_env)
            env_term = done & ~info["episode_limit"]

            alive_f = alive
            # freeze envs that already finished
            state_next = _select_state(alive, n_state, state)
            obs_next = _select_state(alive, n_obs, obs)
            hidden_next = _select_state(alive, hidden_new, hidden)
            actions_eff = _mask_like(alive, actions)
            last_oh_next = jax.nn.one_hot(actions_eff, self.n_actions, dtype=jnp.float32)
            last_oh_next = _mask_like(alive, last_oh_next)

            ep_ret = ep_ret + _mask_like(alive, rew)
            ep_len = ep_len + alive.astype(jnp.int32)
            just_done = alive & done
            final_info = {
                k: jnp.where(just_done, info[k].astype(jnp.float32), v)
                for k, v in final_info.items()
            }

            out = {
                "actions": actions_eff,
                "reward": _mask_like(alive, rew),
                "terminated": env_term & alive,
                "filled_next": alive,
                "obs_next": {k: _mask_like(alive, v) for k, v in obs_next.items()},
            }
            if record:
                r = env.render_state(state_next)
                if "render" in info:
                    # facing/attack-line extras from the combat step
                    r = {**r, **info["render"]}
                out["render"] = r
            alive_next = alive & ~done
            return (
                state_next,
                obs_next,
                hidden_next,
                alive_next,
                last_oh_next,
                ep_ret,
                ep_len,
                final_info,
            ), out

        keys = jax.random.split(k_scan, T)
        carry0 = (
            state0,
            obs0,
            hidden0,
            alive0,
            last_oh0,
            jnp.zeros((B,), jnp.float32),
            jnp.zeros((B,), jnp.int32),
            info_proto,
        )
        carry, outs = jax.lax.scan(step_fn, carry0, keys)
        _, _, _, _, _, ep_ret, ep_len, final_info = carry

        # assemble the (B, T+1, ...) episode batch
        def t_major_to_b(x):  # (T, B, ...) -> (B, T, ...)
            return jnp.swapaxes(x, 0, 1)

        obs_seq = jax.tree.map(
            lambda o0, rest: jnp.concatenate([o0[:, None], t_major_to_b(rest)], axis=1),
            obs0,
            outs["obs_next"],
        )
        zeros_row = lambda x: jnp.zeros_like(x[:, :1])
        actions = t_major_to_b(outs["actions"])  # (B, T, Na)
        actions = jnp.concatenate([actions, zeros_row(actions)], axis=1)
        reward = t_major_to_b(outs["reward"])[..., None]  # (B, T, 1)
        reward = jnp.concatenate([reward, zeros_row(reward)], axis=1)
        terminated = t_major_to_b(outs["terminated"])[..., None]
        terminated = jnp.concatenate([terminated, zeros_row(terminated)], axis=1)
        filled = t_major_to_b(outs["filled_next"])[..., None]
        filled = jnp.concatenate(
            [jnp.ones_like(filled[:, :1]), filled], axis=1
        )  # filled[0] = 1

        # actions_onehot is zero (not onehot(0)) at never-written steps, matching
        # the reference preprocess-on-write (episode_buffer.py:107-112); actions
        # at t were written iff the env was alive at start of step t == filled[t+1]
        written_t = jnp.concatenate(
            [filled[:, 1:, 0], jnp.zeros_like(filled[:, :1, 0])], axis=1
        )  # (B, T+1)
        actions_onehot = (
            jax.nn.one_hot(actions, self.n_actions, dtype=jnp.float32)
            * written_t[:, :, None, None]
        )
        # all per-step observation fields verbatim (entity scheme: entities/
        # obs_mask/entity_mask[/gt_mask]; flat scheme: obs/state) + transitions
        batch = dict(obs_seq)
        batch.update(
            actions=actions,
            actions_onehot=actions_onehot,
            reward=reward,
            terminated=terminated,
            filled=filled,
        )
        stats = {
            "ep_returns": ep_ret,
            "ep_lengths": ep_len,
            "final_info": final_info,
        }
        if record:
            stats["render"] = outs["render"]  # (T, B, ...) pytree
        return batch, stats

    # ------------------------------------------------------------------
    def run(
        self,
        params,
        key: jax.Array,
        test_mode: bool = False,
        test_scen: Optional[bool] = None,
        index: Optional[int] = None,
        record: bool = False,
        batch_size: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Run one episode block; returns the device-resident episode batch and
        logs runner stats (reference ``parallel_runner.py:96-235``).

        ``batch_size`` overrides the config block size for this call — used by
        the fused loop to run a full ``test_nepisode`` evaluation block in ONE
        dispatch instead of ``test_nepisode // batch_size_run`` round trips."""
        if test_scen is None:
            test_scen = test_mode
        self.epsilon = self.schedule.eval_host(self.t_env)
        eps = 0.0 if test_mode else self.epsilon
        batch, stats = self._rollout(
            params,
            key,
            jnp.asarray(eps, jnp.float32),
            jnp.asarray(-1 if index is None else int(index), jnp.int32),
            batch_size=self.batch_size if batch_size is None else int(batch_size),
            test=bool(test_scen),
            record=bool(record),
        )

        # single fused device->host transfer (each sync costs a tunnel RTT)
        stats = jax.device_get(stats)
        if record:
            rec = stats.pop("render")
            T = jax.tree.leaves(rec)[0].shape[0]
            self.last_recording = [
                {k: v[t] for k, v in rec.items()} for t in range(T)
            ]
        if not test_mode:
            self.t_env += int(stats["ep_lengths"].sum())
        self.account_block(stats, test_mode=test_mode)
        return batch

    def account_block(self, stats, test_mode: bool = False) -> None:
        """Fold one episode block's host-side stats into the runner's
        accumulators and trigger cadenced logging (the bookkeeping half of
        reference ``parallel_runner.py:203-235``). ``stats`` must already be
        on host; ``self.t_env`` must already be current."""
        ep_returns = stats["ep_returns"]
        ep_lengths = stats["ep_lengths"]
        final_info = stats["final_info"]
        block_bs = int(np.asarray(ep_returns).shape[0])  # actual block size

        cur_stats = self.test_stats if test_mode else self.train_stats
        cur_returns = self.test_returns if test_mode else self.train_returns
        log_prefix = "test_" if test_mode else ""
        for k, v in final_info.items():
            cur_stats[k] = float(v.sum()) + cur_stats.get(k, 0.0)
        if "battle_won" in final_info:
            # cumulative battle stats over the run (train AND test episodes,
            # like the reference's env-lifetime counters)
            self.battles_won += int(final_info["battle_won"].sum())
            self.battles_game += block_bs
            if "episode_limit" in final_info:
                self.timeouts += int(final_info["episode_limit"].sum())
        cur_stats["n_episodes"] = block_bs + cur_stats.get("n_episodes", 0)
        cur_stats["ep_length"] = float(ep_lengths.sum()) + cur_stats.get("ep_length", 0.0)
        cur_returns.extend(ep_returns.tolist())

        if self.logger is not None:
            n_test_runs = (
                max(1, self.args.test_nepisode // self.batch_size) * self.batch_size
            )
            if test_mode and (len(self.test_returns) == n_test_runs):
                self._log(cur_returns, cur_stats, log_prefix)
            elif (
                not test_mode
                and self.t_env - self.log_train_stats_t >= self.args.runner_log_interval
            ):
                self._log(cur_returns, cur_stats, log_prefix)
                self.logger.log_stat("epsilon", self.epsilon, self.t_env)
                if self.battles_game:
                    for k, v in self.env_stats().items():
                        self.logger.log_stat(k, v, self.t_env)
                self.log_train_stats_t = self.t_env

    def env_stats(self) -> Dict[str, float]:
        """Cumulative env stats with the reference's names
        (``starcraft2custom.py:1865-1874``); ``restarts`` is structurally 0
        for the pure-function envs (parity key kept for drop-in dashboards)."""
        return {
            "battles_won": float(self.battles_won),
            "battles_game": float(self.battles_game),
            "battles_draw": float(self.timeouts),
            "win_rate": self.battles_won / max(self.battles_game, 1),
            "timeouts": float(self.timeouts),
            "restarts": 0.0,
        }

    def _log(self, returns, stats, prefix):
        self.logger.log_stat(prefix + "return_mean", float(np.mean(returns)), self.t_env)
        self.logger.log_stat(prefix + "return_std", float(np.std(returns)), self.t_env)
        returns.clear()
        for k, v in stats.items():
            if k != "n_episodes":
                self.logger.log_stat(
                    prefix + k + "_mean", v / stats["n_episodes"], self.t_env
                )
        stats.clear()


RUNNER_REGISTRY = {"vector": VectorRunner}
