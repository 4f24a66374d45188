"""The SPMD mesh must be reachable from the REAL CLI entry point
(``python -m refil_tpu.main``), not just from library-level dry runs
(round-1 gap: ``mesh_shape`` was a dead config key).

Uses the 8 virtual CPU devices from conftest.py as the mesh.
"""
import json
import os

import jax
import pytest

import refil_tpu.core.pipeline as pipeline_mod
from refil_tpu.config import Args
from refil_tpu.main import main
from refil_tpu.parallel.mesh import maybe_init_distributed, maybe_make_mesh


def test_cli_trains_on_8_device_mesh(tmp_path, monkeypatch):
    captured = {}
    orig = pipeline_mod.FusedPipeline

    class Capture(orig):
        def __init__(self, runner, learner, buffer_size, args, mesh=None):
            super().__init__(runner, learner, buffer_size, args, mesh=mesh)
            captured["mesh"] = mesh
            captured["pipe"] = self

    monkeypatch.setattr(pipeline_mod, "FusedPipeline", Capture)

    main([
        "--config=refil_group_matching",
        "--env-config=group_matching",
        "with",
        "mesh_shape={'data': 8}",
        "t_max=300",
        "env_args.n_agents=4",
        "env_args.episode_limit=10",
        "batch_size=8",
        "buffer_size=16",
        "test_nepisode=8",
        "test_interval=100000",
        f"local_results_path={tmp_path}",
    ])

    mesh = captured["mesh"]
    assert mesh is not None and mesh.n_data == 8
    # training actually ran and logged through the sharded pipeline
    metrics_dir = os.path.join(str(tmp_path), "metrics")
    files = os.listdir(metrics_dir)
    assert files
    with open(os.path.join(metrics_dir, files[0])) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert any(r["key"] == "loss" for r in rows), rows


def test_mesh_shape_non_divisible_errors():
    args = Args(mesh_shape={"data": 8}, batch_size_run=6, batch_size=32,
                buffer_size=32)
    with pytest.raises(ValueError, match="divide"):
        maybe_make_mesh(args)


def test_mesh_shape_too_many_devices_errors():
    args = Args(mesh_shape={"data": 1024}, batch_size_run=1024,
                batch_size=1024, buffer_size=1024)
    with pytest.raises(ValueError, match="devices"):
        maybe_make_mesh(args)


def test_auto_mesh_uses_all_devices_when_divisible():
    args = Args(mesh_shape=None, batch_size_run=8, batch_size=32, buffer_size=32)
    mesh = maybe_make_mesh(args)
    assert mesh is not None and mesh.n_data == len(jax.devices())


def test_auto_mesh_falls_back_when_not_divisible():
    args = Args(mesh_shape=None, batch_size_run=3, batch_size=32, buffer_size=32)
    assert maybe_make_mesh(args) is None


def test_distributed_off_by_default():
    assert maybe_init_distributed({}) is False
    assert maybe_init_distributed({"distributed": False}) is False


def test_cli_sharded_equals_single_device(tmp_path):
    """Through the production CLI: identical config + seed trained on a
    {data: 8} mesh and on a {data: 1} mesh log the same loss trajectory
    (up to reduction order)."""
    import numpy as np

    def run(mesh, sub):
        main([
            "--config=refil_group_matching",
            "--env-config=group_matching",
            "with",
            f"mesh_shape={{'data': {mesh}}}",
            "t_max=400",
            "seed=3",
            "env_args.n_agents=4",
            "env_args.episode_limit=10",
            "batch_size=8",
            "buffer_size=16",
            "test_nepisode=8",
            "test_interval=100000",
            f"local_results_path={tmp_path / sub}",
        ])
        mdir = os.path.join(str(tmp_path / sub), "metrics")
        fname = os.listdir(mdir)[0]
        with open(os.path.join(mdir, fname)) as f:
            rows = [json.loads(l) for l in f if l.strip()]
        return [
            (r["t"], r["value"]) for r in rows if r["key"] == "loss"
        ]

    sharded = run(8, "mesh8")
    single = run(1, "mesh1")
    assert sharded and len(sharded) == len(single)
    for (t8, v8), (t1, v1) in zip(sharded, single):
        assert t8 == t1
        np.testing.assert_allclose(v8, v1, rtol=2e-4, atol=1e-6)
