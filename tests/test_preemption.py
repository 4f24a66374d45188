"""Preemption handling: SIGTERM mid-training → exact-resume checkpoint + rc 0.

Cloud TPU VMs get a SIGTERM eviction notice before preemption; the training
loop must turn that into a graceful exact-resume checkpoint (replay ring, RNG
key, counters — ``run.PreemptionGuard``) rather than dying with everything
lost. The reference has no equivalent: its only failure handling is at the
SC2-process boundary (``starcraft2custom.py:579-594``).

Protocol: launch the production CLI as a subprocess, wait for training to be
demonstrably underway (a logged loss), SIGTERM it, then resume from the
checkpoint it wrote and require further progress past the preemption point.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = [
    "--config=refil_group_matching", "--env-config=group_matching",
    "with",
    "seed=3",
    "env_args.n_agents=4",
    "env_args.episode_limit=10",
    "batch_size=8",
    "buffer_size=16",
    "test_nepisode=8",
    "test_interval=100000",
    "learner_log_interval=1",
    "log_interval=100",
    "save_model=False",
]


def _loss_rows(results_dir):
    mdir = os.path.join(results_dir, "metrics")
    if not os.path.isdir(mdir):
        return []
    rows = []
    for fn in os.listdir(mdir):
        with open(os.path.join(mdir, fn)) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    if r["key"] == "loss":
                        rows.append((r["t"], r["value"]))
    return sorted(rows)


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path):
    a_dir = str(tmp_path / "runA")
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO,
    )
    cmd = [sys.executable, "-m", "refil_tpu.main"] + BASE + [
        "t_max=1000000", f"local_results_path={a_dir}",
    ]
    proc = subprocess.Popen(cmd, cwd=REPO, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if proc.poll() is not None:
                out, _ = proc.communicate()
                pytest.fail(f"run exited early (rc={proc.returncode}):\n{out[-4000:]}")
            if _loss_rows(a_dir):
                break
            time.sleep(1.0)
        else:
            pytest.fail("training never logged a loss within 300s")

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()

    assert proc.returncode == 0, out[-4000:]
    assert "Preempted at t_env=" in out, out[-4000:]

    models_root = os.path.join(a_dir, "models")
    (token,) = os.listdir(models_root)
    ckpt_dir = os.path.join(models_root, token)
    steps = sorted(int(s) for s in os.listdir(ckpt_dir))
    assert steps, "no preemption checkpoint written"
    preempt_t = steps[-1]
    assert os.path.getsize(os.path.join(ckpt_dir, str(preempt_t), "state.msgpack")) > 0

    # resume in-process (same entry the user would use) and require progress
    from refil_tpu.main import main

    b_dir = str(tmp_path / "runB")
    main(BASE + [
        f"t_max={preempt_t + 300}",
        f"checkpoint_path={ckpt_dir}",
        f"local_results_path={b_dir}",
    ])
    tail = [t for t, _ in _loss_rows(b_dir) if t > preempt_t]
    assert tail, "resumed run made no progress past the preemption point"
