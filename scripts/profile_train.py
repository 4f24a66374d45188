"""Scratch: decompose one train iteration's time on TPU.

Usage: python scripts/profile_train.py [impl]
"""
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *a, n=20):
    import jax

    r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from refil_tpu.ops.attention import set_attention_impl

    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    if impl == "pallas" and jax.default_backend() == "cpu":
        # match bench._build: the Pallas kernel only runs (interpret-mode,
        # slowly) on CPU — profile the XLA path there instead
        print("CPU backend: profiling impl=xla (pallas is TPU-only)", flush=True)
        impl = "xla"
    args, runner, learner, state, key = bench._build(8)
    set_attention_impl(impl)

    batch, _ = jax.jit(
        runner._rollout_impl, static_argnames=("batch_size", "test")
    )(state.params["agent"], key, jnp.float32(0.5), jnp.int32(-1), 32, False)
    jax.block_until_ready(batch)

    mac = learner.mac

    # full train step (donation off so we can reuse inputs)
    step = jax.jit(learner._train_step_impl)
    t_step = timeit(step, state, batch, key)

    # loss forward only
    lossf = jax.jit(
        lambda p, tp, b, k: learner._loss(p, tp, b, k)[0]
    )
    t_loss = timeit(lossf, state.params, state.target_params, batch, key)

    # agent imagine forward only
    agfwd = jax.jit(
        lambda p, b, k: mac.forward_episode(p, b, imagine=True, imagine_key=k)[0]
    )
    t_ag = timeit(agfwd, state.params["agent"], batch, key)

    # target (plain) forward only
    tgfwd = jax.jit(lambda p, b: mac.forward_episode(p, b))
    t_tg = timeit(tgfwd, state.params["agent"], batch)

    # mixer apply only (non-imagine)
    m_ents, _, m_em, _ = mac.build_episode_inputs(batch)
    qs = jnp.zeros(m_ents.shape[:2] + (learner.n_agents,), jnp.float32)
    mixf = jax.jit(lambda mp, q, e, em: learner.mixer.apply(mp, q, e, em))
    t_mix = timeit(mixf, state.params["mixer"], qs[:, :-1], m_ents[:, :-1], m_em[:, :-1])

    print(
        f"impl={impl}: train_step {t_step*1e3:.2f} ms | loss-fwd {t_loss*1e3:.2f}"
        f" | agent-imagine-fwd {t_ag*1e3:.2f} | agent-plain-fwd {t_tg*1e3:.2f}"
        f" | mixer {t_mix*1e3:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
