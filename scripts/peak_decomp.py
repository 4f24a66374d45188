"""Decompose the B=4096 combat peak (VERDICT r4 item 3): the committed peak
moved 667k (r3) -> ~600k (r4). Candidate causes: (a) the difficulty-7 enemy
AI added in r4 (tier-2 focus-fire pick loop inside the env scan; the r3 env
was tier-1 nearest-engage only), (b) the Pallas GRU kernel gating/row-tiling,
(c) ring accounting. At B=4096 the ring is 8192 slots in BOTH r3 and r4
measurements (max(5000, 2B) == max(batch, 2B)), so (c) cannot contribute at
this point; this script measures (a) and (b) directly.

Usage: python scripts/peak_decomp.py [B ...]   (default 4096)
"""
import sys
import time

import jax

sys.path.insert(0, ".")


def run_one(B, difficulty, gru_impl, n_blocks=5, dtype="bfloat16"):
    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.core.pipeline import FusedPipeline
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.ops.attention import set_attention_impl
    from refil_tpu.ops.pallas_gru import set_gru_impl
    from refil_tpu.run import _dummy_batch, build_env
    from refil_tpu.runners.vector_runner import VectorRunner

    set_attention_impl("pallas")
    set_gru_impl(gru_impl)
    cfg = load_config(alg="refil", env="sc2custom")
    cfg["scenario"] = "3-8sz_symmetric"
    cfg["batch_size_run"] = B
    cfg["compute_dtype"] = dtype
    cfg["buffer_size"] = max(cfg["buffer_size"], 2 * B)  # bench.py's shipped ring
    cfg["env_args"]["difficulty"] = difficulty
    args = config_to_args(args_sanity_check(cfg))
    args.entity_scheme = True
    env = build_env(args)
    info = env.env_info()
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    args.n_entities = info["n_entities"]
    args.entity_shape = info["entity_shape"]
    args.gt_mask_avail = info.get("gt_mask_avail", False)
    mac = MAC_REGISTRY["entity_mac"](args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    state = learner.init_state(key, _dummy_batch(mac, info))
    runner = VectorRunner(env, mac, args, logger=None)
    pipe = FusedPipeline(runner, learner, args.buffer_size, args)
    ps = pipe.init_state(state, key)
    for _ in range(pipe.warmup_blocks()):
        ps, _ = pipe.block(ps, train=False)
    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)
    t0 = int(ps.t_env)
    t = time.perf_counter()
    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)
    t1 = int(ps.t_env)
    dt = time.perf_counter() - t
    return (t1 - t0) / dt


def main():
    bs = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [4096]
    for B in bs:
        for difficulty in ("7", "4"):
            for gru in ("pallas", "xla"):
                try:
                    sps = run_one(B, difficulty, gru)
                    print(
                        f"combat B={B} difficulty={difficulty} gru={gru:6s} "
                        f"-> {sps:,.0f} env-steps/s", flush=True,
                    )
                except Exception as e:
                    print(
                        f"combat B={B} difficulty={difficulty} gru={gru:6s} "
                        f"-> FAILED {type(e).__name__}: {e}", flush=True,
                    )


if __name__ == "__main__":
    main()
