"""Kill-and-resume: fused-pipeline checkpoints restore the FULL mutable state
(params + target + optimizer + RNG key + counters + replay ring), so a
resumed run reproduces the uninterrupted run's subsequent metrics bit-exactly.

The reference's resume is explicitly approximate (model weights only,
``q_learner.py:222-225``); round-1 here restored TrainState but rebuilt the
pipeline state from scratch. This closes that gap.
"""
import json
import os

import jax
import numpy as np
import pytest

from refil_tpu.main import main


def _losses(results_dir):
    mdir = os.path.join(results_dir, "metrics")
    rows = []
    for fn in os.listdir(mdir):
        with open(os.path.join(mdir, fn)) as f:
            rows += [json.loads(l) for l in f if l.strip()]
    return sorted(
        [(r["t"], r["value"]) for r in rows if r["key"] == "loss"]
    )


def _run(results_dir, extra):
    main([
        "--config=refil_group_matching",
        "--env-config=group_matching",
        "with",
        "seed=3",
        "env_args.n_agents=4",
        "env_args.episode_limit=10",
        "batch_size=8",
        "buffer_size=16",
        "test_nepisode=8",
        "test_interval=100000",
        "learner_log_interval=1",
        "save_model=True",
        "save_model_interval=200",
        "checkpoint_buffer=True",
        f"local_results_path={results_dir}",
    ] + extra)


def test_cli_kill_and_resume_bit_exact(tmp_path):
    a_dir = str(tmp_path / "runA")
    _run(a_dir, ["t_max=500"])
    losses_a = _losses(a_dir)
    assert losses_a, "run A logged no losses"

    # pick a mid-run checkpoint from run A and resume from it
    models_root = os.path.join(a_dir, "models")
    token = os.listdir(models_root)[0]
    ckpt_dir = os.path.join(models_root, token)
    steps = sorted(int(s) for s in os.listdir(ckpt_dir))
    assert len(steps) >= 2, steps
    resume_step = steps[len(steps) // 2]

    c_dir = str(tmp_path / "runC")
    _run(c_dir, [
        "t_max=500",
        f"checkpoint_path={ckpt_dir}",
        f"load_step={resume_step}",
    ])
    losses_c = _losses(c_dir)

    tail_a = [(t, v) for t, v in losses_a if t > resume_step]
    tail_c = [(t, v) for t, v in losses_c if t > resume_step]
    assert tail_a, f"no post-resume losses in run A (resume_step={resume_step})"
    assert [t for t, _ in tail_a] == [t for t, _ in tail_c]
    np.testing.assert_array_equal(
        np.asarray([v for _, v in tail_a]), np.asarray([v for _, v in tail_c])
    )


def test_pipeline_state_roundtrip(tmp_path):
    """Direct pipeline-level save/restore: counters, key and ring contents
    round-trip exactly; continued blocks produce identical losses."""
    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.core.pipeline import FusedPipeline
    from refil_tpu.envs.group_matching import GroupMatching
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.run import (_dummy_batch, _load_checkpoint, _save_checkpoint,
                               restore_pipeline_state)
    from refil_tpu.runners.vector_runner import VectorRunner

    def build(seed):
        cfg = load_config(alg="refil_group_matching", env="group_matching")
        cfg["env_args"].update(n_agents=4, episode_limit=8)
        cfg.update(batch_size=8, buffer_size=16, batch_size_run=8)
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
        key = jax.random.PRNGKey(seed)
        learner = QLearner(mac, args, info, key)
        state = learner.init_state(key, _dummy_batch(mac, info))
        runner = VectorRunner(env, mac, args, logger=None)
        return FusedPipeline(runner, learner, args.buffer_size, args), state

    pipe, state = build(seed=0)
    ps = pipe.init_state(state, jax.random.PRNGKey(7))
    for _ in range(pipe.warmup_blocks()):
        ps, _ = pipe.block(ps, train=False)
    ps, _ = pipe.block(ps, train=True)

    path = str(tmp_path / "ckpt")
    _save_checkpoint(path, ps.train, pstate=ps, include_buffer=True)

    # continue the original
    losses_orig = []
    for _ in range(3):
        ps, stats = pipe.block(ps, train=True)
        losses_orig.append(float(stats["metrics"]["loss"]))

    # restore into a FRESH pipeline initialised from a different seed
    pipe2, state2 = build(seed=99)
    restored_train, payload = _load_checkpoint(path, state2)
    assert payload is not None and "buffer" in payload
    ps2 = pipe2.init_state(restored_train, jax.random.PRNGKey(1234))
    ps2 = restore_pipeline_state(ps2, payload, mesh=None)

    losses_resumed = []
    for _ in range(3):
        ps2, stats = pipe2.block(ps2, train=True)
        losses_resumed.append(float(stats["metrics"]["loss"]))

    assert losses_orig == losses_resumed


def test_resume_warmup_from_partial_ring(tmp_path):
    """A checkpoint taken mid-warmup restores a partially filled ring; resume
    must derive the remaining warmup blocks from episodes_in_buffer instead
    of training immediately on unwritten slots."""
    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.core.pipeline import FusedPipeline
    from refil_tpu.envs.group_matching import GroupMatching
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.run import (_dummy_batch, _load_checkpoint, _save_checkpoint,
                               restore_pipeline_state, resume_warmup_blocks)
    from refil_tpu.runners.vector_runner import VectorRunner

    cfg = load_config(alg="refil_group_matching", env="group_matching")
    cfg["env_args"].update(n_agents=4, episode_limit=6)
    cfg.update(batch_size=8, buffer_size=16, batch_size_run=2)
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

    assert pipe.warmup_blocks() == 4  # 8 batch / 2 per block
    ps = pipe.init_state(state, jax.random.PRNGKey(7))
    ps, _ = pipe.block(ps, train=False)  # 1 of 4 warmup blocks done

    path = str(tmp_path / "ckpt")
    _save_checkpoint(path, ps.train, pstate=ps, include_buffer=True)
    restored_train, payload = _load_checkpoint(path, state)
    ps2 = pipe.init_state(restored_train, jax.random.PRNGKey(9))
    ps2 = restore_pipeline_state(ps2, payload, mesh=None)
    assert int(ps2.episodes_in_buffer) == 2
    assert resume_warmup_blocks(args, ps2) == 3

    # after a full warmup the derived count is 0 (exact-resume fast path)
    for _ in range(3):
        ps2, _ = pipe.block(ps2, train=False)
    _save_checkpoint(path, ps2.train, pstate=ps2, include_buffer=True)
    _, payload2 = _load_checkpoint(path, state)
    ps3 = pipe.init_state(restored_train, jax.random.PRNGKey(9))
    ps3 = restore_pipeline_state(ps3, payload2, mesh=None)
    assert resume_warmup_blocks(args, ps3) == 0
