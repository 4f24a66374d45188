"""Validate bench.py's analytic FLOPs model against XLA cost analysis.

ADVICE r2: the published combat MFU rests on hand-derived constants
(10*F_agent + 8.5*F_mixer per training iteration). This script compiles the
REAL training step (XLA attention, so the compiler can count inside — the
Pallas kernel is opaque to cost analysis) on CPU and compares XLA's counted
flops for one train step against the analytic model.

Expected relationship: XLA counts everything (elementwise, masks, softmax,
optimizer) while the model counts only the dominant matmuls, so
XLA >= analytic, within a modest margin. A model OVER-counting (ratio < 1)
would inflate published MFU — that is the failure mode this guards.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/validate_flops.py
"""
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import (_build, _build_combat, _combat_train_step_flops,
                       _gm_flops_model)
    from refil_tpu.ops.attention import set_attention_impl

    set_attention_impl("xla")  # cost analysis must see inside the attention
    gm = "--gm" in sys.argv
    if gm:
        args, runner, learner, state, key = _build(batch_size_run=8)
    else:
        args, runner, learner, state, key = _build_combat(batch_size_run=8)
    info = runner.env.env_info()

    # one real episode batch, tiled to the training batch size
    batch = runner.run(state.params["agent"], key)
    reps = -(-args.batch_size // args.batch_size_run)
    batch = jax.tree.map(
        lambda x: jnp.concatenate([x] * reps, 0)[: args.batch_size], batch
    )

    step = jax.jit(learner._train_step_impl)
    lowered = step.lower(state, batch, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla_flops = float(ca["flops"])

    if gm:
        F_agent, F_hyper, T = _gm_flops_model(args, info)
        model_flops = args.batch_size * T * (10 * F_agent + 14 * F_hyper)
        xla_corrected = xla_flops  # FF agent: no scan in the train step
    else:
        model_flops = _combat_train_step_flops(args, info)
        # XLA counts a lax.scan body ONCE, not x trip count (verified on a
        # toy scan), so the compiled count misses (T-1)/T of the GRU
        # time-scan's work. Add the model's GRU term back for an
        # apples-to-apples compare: 10 agent passes x batch x T x 12*Na*H^2
        # (3 scan instances' single counted bodies are negligible).
        Na = info["n_agents"]
        T = info["episode_limit"] + 1
        gru_corr = args.batch_size * T * 10 * 12 * Na * args.rnn_hidden_dim ** 2
        xla_corrected = xla_flops + gru_corr * (T - 1) / T

    ratio = xla_corrected / model_flops
    print(f"XLA counted flops (1 train step): {xla_flops/1e9:.2f} GFLOP")
    print(f"+ GRU scan trip-count correction: {xla_corrected/1e9:.2f} GFLOP")
    print(f"analytic model:                   {model_flops/1e9:.2f} GFLOP")
    print(f"ratio XLA/model:                  {ratio:.3f}")
    assert 0.90 <= ratio <= 1.25, (
        f"analytic model out of band (ratio {ratio:.3f}): "
        + ("model OVER-counts -> published MFU inflated" if ratio < 0.90
           else "model badly under-counts -> MFU overly conservative")
    )
    print("OK: analytic model matches the compiled program within ~10%")


if __name__ == "__main__":
    main()
