"""Scripted heuristic ally policy (reference heuristic_ai stand-in)."""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.envs.combat.scenarios import SCENARIO_REGISTRY
from refil_tpu.envs.combat.env import EntityBattle


def test_heuristic_beats_random():
    sd = SCENARIO_REGISTRY["1-5m_symmetric"]()
    env = EntityBattle(scenario_dict=sd)
    key = jax.random.PRNGKey(0)
    B = 8

    def run(policy):
        k = jax.random.PRNGKey(1)
        state, obs = env.reset(jax.random.PRNGKey(2), B)
        total = np.zeros(B)
        wins = np.zeros(B, bool)
        done_all = np.zeros(B, bool)
        step = jax.jit(env.step)
        for t in range(60):
            k, k1, k2 = jax.random.split(k, 3)
            if policy == "heuristic":
                acts = env.heuristic_actions(state)
                # clamp to available (dead agents etc. already handled)
            else:
                logits = jnp.where(obs["avail_actions"], 0.0, -jnp.inf)
                acts = jax.random.categorical(k1, logits, axis=-1).astype(jnp.int32)
            state, obs, rew, done, info = step(state, acts, k2)
            total += np.asarray(rew) * (~done_all)
            wins |= np.asarray(info["battle_won"]) & ~done_all
            done_all |= np.asarray(done)
            if done_all.all():
                break
        return total.mean(), wins.mean()

    r_h, w_h = run("heuristic")
    r_r, w_r = run("random")
    # focused fire + chasing must clearly outperform random action selection
    assert r_h > r_r + 1.0, (r_h, r_r)


def test_heuristic_actions_valid():
    sd = SCENARIO_REGISTRY["3-8MMM_symmetric"]()
    env = EntityBattle(scenario_dict=sd)
    state, obs = env.reset(jax.random.PRNGKey(0), 4)
    acts = np.asarray(env.heuristic_actions(state))
    assert acts.shape == (4, env.max_na)
    assert (acts >= 0).all() and (acts < env.n_actions).all()


def test_heuristic_actions_always_legal():
    """With heuristic_rest=True every heuristic action must satisfy
    avail_actions at every step of a full rollout, Medivacs included (the
    rest branch of the reference heuristic moves instead of emitting an
    unavailable attack, starcraft2custom.py:832-845)."""
    for scen in ("3-8MMM_symmetric", "1-5m_symmetric"):
        sd = SCENARIO_REGISTRY[scen]()
        env = EntityBattle(scenario_dict=sd, heuristic_rest=True)
        B = 6
        key = jax.random.PRNGKey(5)
        state, obs = env.reset(jax.random.PRNGKey(4), B)
        step = jax.jit(env.step)
        for t in range(40):
            key, k = jax.random.split(key)
            avail = obs["avail_actions"]
            acts = env.heuristic_actions(state, avail)
            taken_ok = np.asarray(
                jnp.take_along_axis(avail, acts[..., None], axis=-1)[..., 0]
            )
            assert taken_ok.all(), (
                scen, t,
                np.argwhere(~taken_ok), np.asarray(acts)[~taken_ok],
            )
            state, obs, rew, done, info = step(state, acts, k)
            if np.asarray(done).all():
                break
