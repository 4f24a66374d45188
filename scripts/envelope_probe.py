"""Probe the single-chip envelope past B=4096 using the buffer_dtype knob.

results/PERF_ANALYSIS.md ("Where the single-chip envelope ends"): B=8192
with the bench ring policy (16,384 f32 slots) needs 22.6G > 15.75G HBM.
The two cheap escape paths are (a) bf16 feature planes in the ring
(`buffer_dtype: bfloat16`) and (b) a shipped-size ring (8,192 slots, still
>= the configs' 5000) instead of 2B. This script measures whether those
paths actually admit B=8192 on one v5e and what it is worth, at the bench's
15-block value-forced window, against the B=4096 peak configuration.

Usage: python scripts/envelope_probe.py [n_blocks]
"""
import sys
import time

import jax

sys.path.insert(0, ".")


def run_one(B, ring, buffer_dtype, n_blocks=15, dtype="bfloat16"):
    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.core.pipeline import FusedPipeline
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.ops.attention import set_attention_impl
    from refil_tpu.ops.pallas_gru import set_gru_impl
    from refil_tpu.run import _dummy_batch, build_env
    from refil_tpu.runners.vector_runner import VectorRunner

    set_attention_impl("pallas")
    set_gru_impl("pallas")
    cfg = load_config(alg="refil", env="sc2custom")
    cfg["scenario"] = "3-8sz_symmetric"
    cfg["batch_size_run"] = B
    cfg["compute_dtype"] = dtype
    cfg["buffer_size"] = ring
    cfg["buffer_dtype"] = buffer_dtype
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
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    cases = [
        # (B, ring slots, buffer_dtype) — all rings >= the shipped 5000
        (4096, 8192, "float32"),    # the committed peak config (control)
        (4096, 8192, "bfloat16"),   # ring compression alone at the peak point
        (8192, 8192, "bfloat16"),   # past the f32 envelope: both paths
        (8192, 16384, "bfloat16"),  # bench ring policy (2B) + compression
    ]
    for B, ring, bd in cases:
        try:
            sps = run_one(B, ring, bd, n_blocks=n_blocks)
            print(
                f"combat B={B} ring={ring} buffer_dtype={bd:8s} "
                f"n_blocks={n_blocks} -> {sps:,.0f} env-steps/s", flush=True,
            )
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(
                f"combat B={B} ring={ring} buffer_dtype={bd:8s} "
                f"n_blocks={n_blocks} -> FAILED {type(e).__name__}: {msg}",
                flush=True,
            )


if __name__ == "__main__":
    main()
