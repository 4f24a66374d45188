"""Measure end-to-end fused-pipeline throughput across perf knobs.

Usage: python scripts/perf_matrix.py [B]
Knobs: compute_dtype {float32,bfloat16} x attention impl {pallas,xla}.
"""
import sys
import time

import jax

sys.path.insert(0, ".")


def run_one(B, dtype, impl, n_blocks=30):
    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.core.pipeline import FusedPipeline
    from refil_tpu.envs.group_matching import GroupMatching
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.ops.attention import set_attention_impl
    from refil_tpu.run import _dummy_batch
    from refil_tpu.runners.vector_runner import VectorRunner

    set_attention_impl(impl)
    cfg = load_config(alg="refil_group_matching", env="group_matching")
    cfg["batch_size_run"] = B
    cfg["compute_dtype"] = dtype
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

    pipe = FusedPipeline(runner, learner, args.buffer_size, args)
    ps = pipe.init_state(state, key)
    for _ in range(pipe.warmup_blocks()):
        ps, _ = pipe.block(ps, train=False)
    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)
    ps = jax.block_until_ready(ps)
    t0 = int(ps.t_env)
    t = time.perf_counter()
    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)
    ps = jax.block_until_ready(ps)
    dt = time.perf_counter() - t
    sps = (int(ps.t_env) - t0) / dt
    loss = None
    return sps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    for dtype in ("float32", "bfloat16"):
        for impl in ("pallas", "xla"):
            try:
                sps = run_one(B, dtype, impl)
                print(f"B={B} dtype={dtype:9s} impl={impl:6s} -> {sps:,.0f} env-steps/s", flush=True)
            except Exception as e:
                print(f"B={B} dtype={dtype:9s} impl={impl:6s} -> FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
