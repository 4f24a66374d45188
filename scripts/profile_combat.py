"""Component-level profile of the flagship combat block (VERDICT r2 item 1a).

CAVEAT: on the axon tunnel platform jax.block_until_ready can return before
device execution completes, so these times are submission-contaminated and
read ~20-25% optimistic. Use them for RELATIVE structure only; value-forced
end-to-end numbers (bench.py, scripts/perf_matrix.py) are the truth. See
results/PERF_ANALYSIS.md.

Breaks one fused episode block (refil @ 3-8sz_symmetric) into its constituent
jitted programs and times each in isolation, so the dominant term is measured
rather than guessed:

  block         the production fused block (rollout+insert+sample+8 train iters)
  rollout       rollout-only block (same barrier semantics)
  env_scan      env.step scan alone (constant actions) — env share of rollout
  train_iters   the 8-iteration training scan on a fixed batch
  train_step    a single training iteration (fwd+bwd+RMSprop)
  loss_fwd      loss forward only (live imagine x3 + target + mixers)
  loss_bwd      loss value_and_grad (no optimizer)
  agent_im_fwd  agent x3-imagine whole-episode forward (B=32)
  agent_tgt_fwd agent plain whole-episode forward (B=32)
  mixer_fwd     FlexQMixer forward (live path)
  attn_alone    entity-attention layer at train shapes (B'=3*32*L)
  gru_alone     GRU time-scan at train shapes ((3*32*Na), L, H)

Usage: python scripts/profile_combat.py [batch_size_run ...] [--dtype bf16]
"""
import functools
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from bench import _build_combat
    from refil_tpu.core.pipeline import FusedPipeline

    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [512]
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32

    for bsr in batches:
        # dtype must reach the model constructors (mac/mixer read it at
        # build time): pass it through the config, not post-hoc on args
        args, runner, learner, state, key = _build_combat(
            bsr, compute_dtype=dtype.__name__
        )
        pipe = FusedPipeline(runner, learner, args.buffer_size, args)
        ps = pipe.init_state(state, key)
        # pipe.block donates its input state, which consumes `key`'s buffer
        # (it lives inside the PipelineState) — use a fresh key below
        key = jax.random.PRNGKey(1234)
        for _ in range(pipe.warmup_blocks()):
            ps, _ = pipe.block(ps, train=False)

        info = runner.env.env_info()
        Na, Ne, A = info["n_agents"], info["n_entities"], info["n_actions"]
        L = info["episode_limit"] + 1
        B = args.batch_size  # train batch (32)
        H = args.rnn_hidden_dim
        E = args.attn_embed_dim
        print(f"\n== combat bsr={bsr} dtype={dtype.__name__} "
              f"Na={Na} Ne={Ne} A={A} L={L} train_B={B} iters={args.training_iters} ==",
              flush=True)

        def block_t(train):
            def f(p):
                out, _ = pipe._block_impl(p, train)
                return out
            return jax.jit(f, static_argnums=())

        t_block = timeit(jax.jit(lambda p: pipe._block_impl(p, True)[0]), ps)
        t_roll = timeit(jax.jit(lambda p: pipe._block_impl(p, False)[0]), ps)
        steps = bsr * (L - 1)
        print(f"block        {t_block*1e3:9.1f} ms   ({steps/t_block:,.0f} env-steps/s)")
        print(f"rollout      {t_roll*1e3:9.1f} ms   (train ~{(t_block-t_roll)*1e3:.1f} ms)")

        # --- env-only scan: the env share of the rollout ---
        env = runner.env
        def env_scan(key):
            k_reset, k_scan = jax.random.split(key)
            st, obs = env.reset(k_reset, bsr, test=False, index=jnp.int32(-1))
            def step(carry, kt):
                st, _ = carry
                acts = jnp.ones((bsr, Na), jnp.int32)
                st2, obs2, rew, done, _ = env.step(st, acts, kt)
                return (st2, obs2), rew
            (_, _), rews = jax.lax.scan(step, (st, obs), jax.random.split(k_scan, L - 1))
            return rews
        t_env = timeit(jax.jit(env_scan), key)
        print(f"env_scan     {t_env*1e3:9.1f} ms")

        # --- fixed train batch: sample from the warm ring ---
        idx = jnp.arange(B) % int(ps.episodes_in_buffer)
        batch1 = jax.tree.map(lambda b: b[idx], ps.buffer)
        batches8 = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (args.training_iters,) + x.shape), batch1
        )
        st0 = ps.train

        t_iters = timeit(
            jax.jit(lambda s, b, k: learner._train_iters_impl(s, b, k)[0]),
            st0, batches8, key, n=5,
        )
        t_step = timeit(
            jax.jit(lambda s, b, k: learner._train_step_impl(s, b, k)[0]),
            st0, batch1, key,
        )
        print(f"train_iters  {t_iters*1e3:9.1f} ms   ({args.training_iters} iters)")
        print(f"train_step   {t_step*1e3:9.1f} ms   (x{args.training_iters} = {t_step*args.training_iters*1e3:.1f} ms)")

        loss_fwd = jax.jit(lambda p, tp, b, k: learner._loss(p, tp, b, k)[0])
        t_lf = timeit(loss_fwd, st0.params, st0.target_params, batch1, key)
        loss_bwd = jax.jit(
            lambda p, tp, b, k: jax.value_and_grad(learner._loss, has_aux=True)(p, tp, b, k)[1]
        )
        t_lb = timeit(loss_bwd, st0.params, st0.target_params, batch1, key)
        print(f"loss_fwd     {t_lf*1e3:9.1f} ms")
        print(f"loss_bwd     {t_lb*1e3:9.1f} ms   (fwd+bwd)")

        # --- agent passes ---
        mac = learner.mac
        agent_im = jax.jit(
            lambda p, b, k: mac.forward_episode(p, b, imagine=True, imagine_key=k)[0]
        )
        t_aim = timeit(agent_im, st0.params["agent"], batch1, key)
        agent_tgt = jax.jit(lambda p, b: mac.forward_episode(p, b))
        t_atg = timeit(agent_tgt, st0.params["agent"], batch1)
        print(f"agent_im_fwd {t_aim*1e3:9.1f} ms   (x3-tiled, B={B})")
        print(f"agent_tgt    {t_atg*1e3:9.1f} ms")

        # --- mixer ---
        m_ents, _, m_em, _ = mac.build_episode_inputs(batch1)
        qs = jnp.zeros((B, L - 1, Na), jnp.float32)
        mixer_fwd = jax.jit(
            lambda p, q, e, em: learner.mixer.apply(p, q, e, em)
        )
        t_mx = timeit(mixer_fwd, st0.params["mixer"], qs, m_ents[:, :-1], m_em[:, :-1])
        print(f"mixer_fwd    {t_mx*1e3:9.1f} ms")

        # --- attention alone at train shapes ---
        from refil_tpu.ops.attention import entity_attention
        from refil_tpu.ops.pallas_attn import pallas_entity_attention, PALLAS_AVAILABLE

        Bp = 3 * B * L
        kk = jax.random.PRNGKey(0)
        x = jax.random.normal(kk, (Bp, Ne, E), dtype)
        wqkv = jax.random.normal(kk, (E, 3 * E), dtype) * 0.02
        wo = jax.random.normal(kk, (E, E), dtype) * 0.02
        bo = jnp.zeros((E,), dtype)
        pre = jnp.zeros((Bp, Ne, Ne), bool)
        post = jnp.zeros((Bp, Na), bool)
        for name, fn in (
            ("attn_xla", entity_attention),
            ("attn_pallas", pallas_entity_attention if PALLAS_AVAILABLE else None),
        ):
            if fn is None:
                continue
            f = jax.jit(lambda *a, _fn=fn: _fn(*a, 4))
            t_fw = timeit(f, x, wqkv, wo, bo, pre, post)
            g = jax.jit(
                lambda *a, _fn=fn: jax.grad(
                    lambda xx, wi, wwo, bbo: _fn(xx, wi, wwo, bbo, a[4], a[5], 4).sum()
                )(*a[:4])
            )
            t_bw = timeit(g, x, wqkv, wo, bo, pre, post)
            print(f"{name:12s} {t_fw*1e3:9.1f} ms fwd / {t_bw*1e3:9.1f} ms fwd+bwd  (B'={Bp})")

        # --- GRU scan alone at train shapes ---
        import flax.linen as nn
        from refil_tpu.modules.agents import _torch_gru_cell

        rnn = nn.RNN(_torch_gru_cell(H, "gru"))
        xs = jax.random.normal(kk, (3 * B * Na, L, H), jnp.float32)
        h0 = jnp.zeros((3 * B * Na, H), jnp.float32)
        p_rnn = rnn.init(kk, xs, initial_carry=h0)
        gru_f = jax.jit(lambda p, xs, h0: rnn.apply(p, xs, initial_carry=h0))
        t_gf = timeit(gru_f, p_rnn, xs, h0)
        gru_g = jax.jit(
            lambda p, xs, h0: jax.grad(
                lambda q: rnn.apply(p, q, initial_carry=h0).sum()
            )(xs)
        )
        t_gb = timeit(gru_g, p_rnn, xs, h0)
        print(f"gru_alone    {t_gf*1e3:9.1f} ms fwd / {t_gb*1e3:9.1f} ms fwd+bwd  "
              f"(rows={3*B*Na}, T={L}, H={H})")


if __name__ == "__main__":
    main()
