"""Generate committed golden GroupMatching trajectories for seed parity.

Runs the host RandomState twin (``tests/group_matching_host.py``)
under fixed seeds with a deterministic action policy (a SEPARATE RandomState,
so the env stream is untouched) and writes per-seed npz files to
``tests/golden/``. When the reference checkout is present it also runs the
ACTUAL reference implementation as an oracle and asserts the twin matches it
step for step — guaranteeing the committed files encode the reference's true
draw-consumption order.

Usage: python scripts/gen_group_matching_golden.py
"""
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, 'tests'))

from group_matching_host import RandomStateGroupMatching

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)
CONFIGS = [
    dict(seed=0, n_agents=8, n_states=6, n_groups=2, rand_trans=0.1, episode_limit=50),
    dict(seed=1, n_agents=8, n_states=6, n_groups=2, rand_trans=0.1, episode_limit=50),
    dict(seed=2, n_agents=6, n_states=5, n_groups=3, rand_trans=0.3, episode_limit=40),
    dict(seed=3, n_agents=4, n_states=10, n_groups=2, rand_trans=0.0, episode_limit=30),
]
N_EPISODES = 3  # consecutive episodes share one RandomState stream


def _load_reference_env():
    """Import the reference GroupMatching (oracle) if the checkout exists."""
    ref_dir = "/root/reference/src/envs/group_matching"
    if not os.path.isdir(ref_dir):
        return None
    import importlib.util
    import types

    # satisfy its relative import of ..multiagentenv without importing the
    # whole reference package
    spec = importlib.util.spec_from_file_location(
        "_ref_mae", "/root/reference/src/envs/multiagentenv.py"
    )
    mae = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mae)
    src = open(os.path.join(ref_dir, "group_matching.py")).read()
    src = src.replace("from ..multiagentenv import MultiAgentEnv", "")
    mod = types.ModuleType("_ref_gm")
    mod.MultiAgentEnv = mae.MultiAgentEnv
    mod.np = np
    exec(compile(src, "reference_group_matching.py", "exec"), mod.__dict__)
    return mod.GroupMatching


def run_twin(cfg, env_cls, policy_seed=12345):
    env = env_cls(
        n_agents=cfg["n_agents"], n_states=cfg["n_states"],
        n_groups=cfg["n_groups"], rand_trans=cfg["rand_trans"],
        episode_limit=cfg["episode_limit"], seed=cfg["seed"],
        **({"entity_scheme": True} if env_cls is not RandomStateGroupMatching else {}),
    )
    pol = np.random.RandomState(policy_seed)
    episodes = []
    for _ in range(N_EPISODES):
        env.reset()
        ep = dict(
            groups=np.asarray(env.get_entities(), np.float32),
            gt_mask=np.asarray(env.get_masks()[2], np.uint8),
            locs=[], actions=[], rewards=[], solved=None, length=0,
        )
        ep["locs"].append(np.asarray(env.agent_locs.argmax(1), np.int32))
        done = False
        while not done:
            actions = pol.randint(0, 3, size=cfg["n_agents"])
            rew, done, info = env.step(actions)
            ep["actions"].append(actions.astype(np.int32))
            ep["rewards"].append(np.float64(rew))
            ep["locs"].append(np.asarray(env.agent_locs.argmax(1), np.int32))
        ep["solved"] = bool(info.get("solved", False))
        ep["length"] = len(ep["actions"])
        episodes.append(ep)
    return episodes


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    ref_cls = _load_reference_env()
    for cfg in CONFIGS:
        eps = run_twin(cfg, RandomStateGroupMatching)
        if ref_cls is not None:
            ref_eps = run_twin(cfg, ref_cls)
            for e, r in zip(eps, ref_eps):
                np.testing.assert_array_equal(np.stack(e["locs"]), np.stack(r["locs"]))
                np.testing.assert_allclose(e["rewards"], r["rewards"], atol=1e-12)
                np.testing.assert_array_equal(e["groups"], r["groups"])
                np.testing.assert_array_equal(e["gt_mask"], r["gt_mask"])
                assert e["solved"] == r["solved"] and e["length"] == r["length"]
            print(f"seed {cfg['seed']}: twin matches the reference oracle "
                  f"({sum(e['length'] for e in eps)} steps)")
        blob = {"config": np.asarray(
            [cfg["seed"], cfg["n_agents"], cfg["n_states"], cfg["n_groups"],
             cfg["episode_limit"]], np.int64),
            "rand_trans": np.float64(cfg["rand_trans"])}
        for i, e in enumerate(eps):
            blob[f"ep{i}_locs"] = np.stack(e["locs"])
            blob[f"ep{i}_actions"] = (
                np.stack(e["actions"]) if e["actions"] else
                np.zeros((0, cfg["n_agents"]), np.int32)
            )
            blob[f"ep{i}_rewards"] = np.asarray(e["rewards"], np.float64)
            blob[f"ep{i}_groups"] = e["groups"]
            blob[f"ep{i}_gt_mask"] = e["gt_mask"]
            blob[f"ep{i}_solved"] = np.bool_(e["solved"])
        out = os.path.join(GOLDEN_DIR, f"group_matching_seed{cfg['seed']}.npz")
        np.savez_compressed(out, **blob)
        print("wrote", out)


if __name__ == "__main__":
    main()
