"""Fused on-device pipeline: one-dispatch episode blocks must reproduce the
classic orchestration's semantics (insert/sample/train/target cadence)."""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.config import args_sanity_check, config_to_args, load_config
from refil_tpu.controllers.mac import MAC_REGISTRY
from refil_tpu.core.pipeline import FusedPipeline
from refil_tpu.envs.group_matching import GroupMatching
from refil_tpu.learners.q_learner import QLearner
from refil_tpu.run import _dummy_batch
from refil_tpu.runners.vector_runner import VectorRunner


def _setup(batch_size_run=4, batch_size=4, buffer_size=16, training_iters=2,
           target_update_interval=8, **extra_cfg):
    cfg = load_config(alg="refil_group_matching", env="group_matching")
    cfg["env_args"].update(n_agents=3, n_states=4, episode_limit=5)
    cfg.update(
        batch_size_run=batch_size_run,
        batch_size=batch_size,
        buffer_size=buffer_size,
        training_iters=training_iters,
        target_update_interval=target_update_interval,
        attn_embed_dim=8,
        attn_n_heads=2,
        hypernet_embed=8,
        mixing_embed_dim=8,
        **extra_cfg,
    )
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
    return pipe, runner, learner, state, args


def test_warmup_block_matches_standalone_rollout():
    pipe, runner, learner, state, args = _setup()
    key = jax.random.PRNGKey(7)
    # the pipeline derives its rollout key as split(key, 5)[1] and epsilon
    # from the pre-block t_env; reproduce both and compare buffer contents
    # (standalone rollout runs FIRST: pipe.block donates the state buffers)
    k_roll = jax.random.split(key, 5)[1]
    eps = jnp.float32(runner.schedule.eval_host(0))
    batch, roll_stats = runner._rollout(
        state.params["agent"],
        k_roll, eps, jnp.int32(-1), batch_size=args.batch_size_run, test=False,
    )
    batch = jax.device_get(batch)
    ps = pipe.init_state(state, key)
    ps2, stats = pipe.block(ps, train=False)
    B = args.batch_size_run
    for k in batch:
        np.testing.assert_array_equal(
            np.asarray(ps2.buffer[k][:B]), np.asarray(batch[k]), err_msg=k
        )
    assert int(ps2.episodes_in_buffer) == B
    assert int(ps2.buffer_index) == B % pipe.buffer_size
    assert int(ps2.t_env) == int(np.asarray(roll_stats["ep_lengths"]).sum())
    assert int(stats["t_env"]) == int(ps2.t_env)


def test_train_block_updates_params_and_counts():
    pipe, runner, learner, state, args = _setup()
    ps = pipe.init_state(state, jax.random.PRNGKey(1))
    ps, _ = pipe.block(ps, train=False)
    params_before = jax.tree.map(np.asarray, ps.train.params)
    ps, stats = pipe.block(ps, train=True)
    stats = jax.device_get(stats)
    assert np.isfinite(stats["metrics"]["loss"])
    moved = any(
        np.abs(np.asarray(a) - b).max() > 0
        for a, b in zip(jax.tree.leaves(ps.train.params), jax.tree.leaves(params_before))
    )
    assert moved
    # t_env accumulates across blocks
    assert int(ps.t_env) == int(stats["t_env"])
    assert int(ps.episode) == 2 * args.batch_size_run


def test_target_sync_cadence():
    pipe, runner, learner, state, args = _setup(target_update_interval=8)
    ps = pipe.init_state(state, jax.random.PRNGKey(2))
    ps, _ = pipe.block(ps, train=False)  # episode -> 4
    ps, _ = pipe.block(ps, train=True)  # pre-inc episode 4 < 8: no sync
    differs = any(
        np.abs(np.asarray(p) - np.asarray(t)).max() > 0
        for p, t in zip(
            jax.tree.leaves(ps.train.params), jax.tree.leaves(ps.train.target_params)
        )
    )
    assert differs, "targets must lag behind params before the sync cadence"
    ps, _ = pipe.block(ps, train=True)  # pre-inc episode 8 >= 8: sync THEN the
    # sync applies post-update params of this block
    for p, t in zip(
        jax.tree.leaves(ps.train.params), jax.tree.leaves(ps.train.target_params)
    ):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(t))
    assert int(ps.last_target_episode) == 8


def test_run_blocks_scan_matches_sequential_blocks():
    pipe, runner, learner, state, args = _setup()
    key = jax.random.PRNGKey(3)
    ps_a = pipe.init_state(state, key)
    ps_a, _ = pipe.block(ps_a, train=False)
    ps_b = jax.tree.map(jnp.copy, ps_a)

    for _ in range(3):
        ps_a, _ = pipe.block(ps_a, train=True)
    ps_b, stats = pipe.run_blocks(ps_b, 3, train=True)
    stats = jax.device_get(stats)
    assert stats["ep_returns"].shape == (3, args.batch_size_run)
    assert int(ps_a.t_env) == int(ps_b.t_env)
    for a, b in zip(jax.tree.leaves(ps_a.train.params), jax.tree.leaves(ps_b.train.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_sharded_pipeline_runs_on_mesh():
    """Fused block under an 8-device data mesh: buffer sharded on the episode
    axis, params replicated, grads psum'd by XLA from the annotations."""
    from refil_tpu.parallel.mesh import MeshContext

    mesh = MeshContext({"data": 8})
    _pipe, runner, learner, state, args = _setup(
        batch_size_run=8, batch_size=8, buffer_size=16
    )
    from refil_tpu.core.pipeline import FusedPipeline

    pipe = FusedPipeline(runner, learner, args.buffer_size, args, mesh=mesh)
    ps = pipe.init_state(state, jax.random.PRNGKey(4))
    assert ps.buffer["entities"].sharding.is_equivalent_to(
        mesh.batch_sharding, ps.buffer["entities"].ndim
    )
    ps, _ = pipe.block(ps, train=False)
    params_before = jax.tree.map(np.asarray, ps.train.params)
    ps, stats = pipe.block(ps, train=True)
    stats = jax.device_get(stats)
    assert np.isfinite(stats["metrics"]["loss"])
    moved = any(
        np.abs(np.asarray(a) - b).max() > 0
        for a, b in zip(jax.tree.leaves(ps.train.params), jax.tree.leaves(params_before))
    )
    assert moved
    # state sharding is preserved block-to-block (no silent re-layout)
    assert ps.buffer["entities"].sharding.is_equivalent_to(
        mesh.batch_sharding, ps.buffer["entities"].ndim
    )


def test_gt_diagnostics_traced_into_block():
    """test_gt_factors configs compute ingroup/gt_ingroup_prop inside the
    fused block (no host-side sample fetch)."""
    pipe, runner, learner, state, args = _setup()
    args.test_gt_factors = True
    from refil_tpu.core.pipeline import FusedPipeline

    pipe = FusedPipeline(runner, learner, args.buffer_size, args)
    ps = pipe.init_state(state, jax.random.PRNGKey(5))
    ps, _ = pipe.block(ps, train=False)
    ps, stats = pipe.block(ps, train=True)
    m = jax.device_get(stats["metrics"])
    assert "ingroup_prop" in m and "gt_ingroup_prop" in m
    assert 0.0 <= float(m["gt_ingroup_prop"]) <= 1.0


def test_sampling_only_hits_filled_slots():
    pipe, runner, learner, state, args = _setup(buffer_size=32)
    eib = jnp.int32(args.batch_size)  # exactly batch_size filled
    idx = pipe._sample_idx(jax.random.PRNGKey(9), eib)
    assert idx.shape == (args.training_iters, args.batch_size)
    assert (np.asarray(idx) < int(eib)).all()
    # without replacement within each iteration
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == len(row)


def test_bfloat16_compute_dtype_end_to_end():
    """compute_dtype=bfloat16 trains: finite losses tracking the f32 run
    (loose tolerance) over several fused blocks."""
    import jax

    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.core.pipeline import FusedPipeline
    from refil_tpu.envs.group_matching import GroupMatching
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.run import _dummy_batch
    from refil_tpu.runners.vector_runner import VectorRunner

    def run(dtype):
        cfg = load_config(alg="refil_group_matching", env="group_matching")
        cfg["env_args"].update(n_agents=4, episode_limit=8)
        cfg.update(batch_size=8, buffer_size=16, batch_size_run=8,
                   compute_dtype=dtype)
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
        ps = pipe.init_state(state, jax.random.PRNGKey(5))
        for _ in range(pipe.warmup_blocks()):
            ps, _ = pipe.block(ps, train=False)
        losses = []
        for _ in range(4):
            ps, stats = pipe.block(ps, train=True)
            losses.append(float(stats["metrics"]["loss"]))
        return losses

    l_bf16 = run("bfloat16")
    l_f32 = run("float32")
    assert all(np.isfinite(l_bf16)), l_bf16
    # same seed/trajectory structure: bf16 must track f32 loosely
    for a, b in zip(l_bf16, l_f32):
        assert abs(a - b) <= 0.25 * max(abs(b), 0.05), (l_bf16, l_f32)


def test_unaligned_ring_rounds_up_and_inserts_in_place():
    """A buffer_size that does not divide by batch_size_run rounds UP to the
    next multiple (so the insert is always one contiguous, in-place
    dynamic-update-slice); contents land at the aligned slots, including the
    cycle that crosses the configured (pre-rounding) size."""
    pipe, runner, learner, state, args = _setup(
        batch_size_run=4, batch_size=4, buffer_size=10
    )
    assert pipe.buffer_size == 12  # 10 rounded to a multiple of 4
    ps = pipe.init_state(state, jax.random.PRNGKey(11))
    assert ps.buffer["entities"].shape[0] == 12
    # starts cycle 0,4,8: the third block writes slots 8..11 (past the
    # configured 10), then the index wraps to 0
    for _ in range(2):
        ps, _ = pipe.block(ps, train=False)
    assert int(ps.buffer_index) == 8
    key_pre = jnp.asarray(ps.key)
    k_roll = jax.random.split(key_pre, 5)[1]
    eps = jnp.float32(runner.schedule.eval_host(int(ps.t_env)))
    batch, _ = runner._rollout(
        ps.train.params["agent"], k_roll, eps, jnp.int32(-1),
        batch_size=4, test=False,
    )
    batch = jax.device_get(batch)
    ps, _ = pipe.block(ps, train=False)
    assert int(ps.buffer_index) == 0
    assert int(ps.episodes_in_buffer) == 12
    for k in batch:
        got = np.asarray(ps.buffer[k])[8:12]
        np.testing.assert_array_equal(got, np.asarray(batch[k]), err_msg=k)


def test_bf16_ring_stores_features_compressed_and_learns():
    """buffer_dtype=bfloat16 compresses only the feature planes of the ring;
    samples come back in the rollout dtypes and training stays numerically
    close to the f32-ring run (identical keys, same rollout trajectories —
    the only difference is bf16 rounding of stored features)."""
    n_blocks = 3

    def run(buffer_dtype):
        pipe, runner, learner, state, args = _setup(buffer_dtype=buffer_dtype)
        ps = pipe.init_state(state, jax.random.PRNGKey(11))
        ring = ps.buffer
        for _ in range(pipe.warmup_blocks()):
            ps, _ = pipe.block(ps, train=False)
        ps, stats = pipe.run_blocks(ps, n_blocks, train=True)
        return ring, np.asarray(stats["metrics"]["loss"], np.float64)

    ring16, loss16 = run("bfloat16")
    assert ring16["entities"].dtype == jnp.bfloat16
    assert ring16["actions_onehot"].dtype == jnp.bfloat16
    assert ring16["reward"].dtype == jnp.float32  # TD math plane untouched
    assert ring16["terminated"].dtype == jnp.bool_
    assert ring16["avail_actions"].dtype == jnp.bool_

    ring32, loss32 = run("float32")
    assert ring32["entities"].dtype == jnp.float32
    assert np.isfinite(loss16).all()
    # same seeds + same rollouts: losses differ only by storage rounding
    np.testing.assert_allclose(loss16, loss32, rtol=0.15, atol=5e-3)


def test_bf16_ring_classic_buffer_roundtrip():
    from refil_tpu.core.buffer import ReplayBuffer

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    template = {
        "entities": jax.random.normal(k1, (4, 6, 3, 5), jnp.float32),
        "reward": jax.random.normal(k2, (4, 6, 1), jnp.float32),
        "filled": jnp.ones((4, 6, 1), jnp.bool_),
    }
    buf = ReplayBuffer(template, 4, seed=0, feature_dtype="bfloat16")
    assert buf.data["entities"].dtype == jnp.bfloat16
    assert buf.data["reward"].dtype == jnp.float32
    assert buf.data["filled"].dtype == jnp.bool_
    buf.insert_episode_batch(template)
    out = buf.sample(4)  # ring exactly full -> identity index order
    # interface dtypes restored
    assert out["entities"].dtype == jnp.float32
    assert out["reward"].dtype == jnp.float32
    # features equal up to one bf16 rounding; reward/filled bit-exact
    np.testing.assert_array_equal(
        np.asarray(out["entities"]),
        np.asarray(
            template["entities"].astype(jnp.bfloat16).astype(jnp.float32)
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(out["reward"]), np.asarray(template["reward"])
    )


def test_restore_casts_ring_to_configured_buffer_dtype():
    """Resuming an f32-ring checkpoint into a buffer_dtype=bfloat16 config
    converts the ring to the configured dtype (the config is authoritative,
    run.py restore_pipeline_state)."""
    from refil_tpu.run import restore_pipeline_state

    pipe, runner, learner, state, args = _setup(buffer_dtype="bfloat16")
    ps = pipe.init_state(state, jax.random.PRNGKey(21))
    # an f32-era payload: same shapes, float32 feature planes
    saved_ring = {
        k: np.asarray(
            jax.random.normal(jax.random.PRNGKey(i), v.shape), np.float32
        )
        if v.dtype == jnp.bfloat16
        else np.asarray(v)
        for i, (k, v) in enumerate(ps.buffer.items())
    }
    payload = {
        "t_env": 123,
        "episode": 8,
        "last_target_episode": 0,
        "key": np.asarray(jax.random.PRNGKey(3)),
        "buffer": saved_ring,
        "buffer_index": 4,
        "episodes_in_buffer": 8,
    }
    ps2 = restore_pipeline_state(ps, payload, mesh=None)
    assert ps2.buffer["entities"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(ps2.buffer["entities"].astype(jnp.float32)),
        saved_ring["entities"].astype(jnp.bfloat16).astype(np.float32),
    )
    assert int(ps2.t_env) == 123 and int(ps2.episodes_in_buffer) == 8
