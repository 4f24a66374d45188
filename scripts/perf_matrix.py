"""Measure end-to-end fused-pipeline throughput across perf knobs.

Usage: python scripts/perf_matrix.py [B ...] [--combat]
Knobs: compute_dtype {float32,bfloat16} x attention impl
{pallas (fused fwd+bwd), pallas_xlabwd (fused fwd, XLA-replay bwd), xla}.
--combat runs the flagship entity_battle config instead of Group Matching.
Committed results: results/perf_matrix_r2.txt
"""
import sys
import time

import jax

sys.path.insert(0, ".")


def run_one(B, dtype, impl, n_blocks=30, combat=False):
    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.core.pipeline import FusedPipeline
    from refil_tpu.envs.group_matching import GroupMatching
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.ops import pallas_attn
    from refil_tpu.ops.attention import set_attention_impl
    from refil_tpu.run import _dummy_batch, build_env
    from refil_tpu.runners.vector_runner import VectorRunner

    # impl: xla | pallas (fused fwd + fused bwd) | pallas_xlabwd
    set_attention_impl("pallas" if impl.startswith("pallas") else "xla")
    pallas_attn.set_backward_impl("xla" if impl == "pallas_xlabwd" else "pallas")
    if combat:
        cfg = load_config(alg="refil", env="sc2custom")
        cfg["scenario"] = "3-8sz_symmetric"
        cfg["buffer_size"] = max(cfg["batch_size"], 2 * B)
    else:
        cfg = load_config(alg="refil_group_matching", env="group_matching")
    cfg["batch_size_run"] = B
    cfg["compute_dtype"] = dtype
    args = config_to_args(args_sanity_check(cfg))
    args.entity_scheme = True
    if combat:
        env = build_env(args)
    else:
        env = GroupMatching(**cfg["env_args"])
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
    # value-forced timing window (CLAUDE.md axon rule): the int(ps.t_env)
    # reads are the sync points; the clock stops only after the read
    t0 = int(ps.t_env)
    t = time.perf_counter()
    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)
    t1 = int(ps.t_env)
    dt = time.perf_counter() - t
    sps = (t1 - t0) / dt
    # analytic MFU vs the chip's bf16 MXU peak (models validated against XLA
    # cost analysis, scripts/validate_flops.py)
    from bench import (_combat_flops_per_block, _gm_flops_per_block,
                       _peak_flops)

    fl = (_combat_flops_per_block if combat else _gm_flops_per_block)(
        args, info, n_blocks
    )
    mfu = fl / dt / _peak_flops()
    return sps, mfu


def main():
    combat = "--combat" in sys.argv
    bs = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [512]
    n_blocks = 10 if combat else 30
    for B in bs:
        for dtype in ("float32", "bfloat16"):
            for impl in ("pallas", "pallas_xlabwd", "xla"):
                try:
                    sps, mfu = run_one(
                        B, dtype, impl, n_blocks=n_blocks, combat=combat
                    )
                    print(
                        f"{'combat' if combat else 'gm'} B={B} dtype={dtype:9s} "
                        f"impl={impl:13s} -> {sps:,.0f} env-steps/s  "
                        f"(MFU {mfu:.3f} of bf16 peak)",
                        flush=True,
                    )
                except Exception as e:
                    print(
                        f"{'combat' if combat else 'gm'} B={B} dtype={dtype:9s} "
                        f"impl={impl:13s} -> FAILED {type(e).__name__}: {e}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
