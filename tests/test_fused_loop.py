"""Multi-block dispatch in the production fused loop (VERDICT r3 weak #1):
`_run_fused_loop` batches blocks between host-cadence boundaries into one
`run_blocks` dispatch. The host-visible trajectory — logged stats, their
t_env axis, test cadence — must be IDENTICAL to single-block dispatch,
because dispatch sizing uses the worst-case steps-per-block bound (a
dispatch can land on a boundary but never cross one early)."""
import json
import os

import numpy as np
import pytest

import refil_tpu.core.pipeline as pipeline_mod
from refil_tpu.main import main


# bind the true class once: monkeypatch in a prior _run call must not leak
# into the base class of the next one (it would double-count dispatches)
_ORIG_PIPELINE = pipeline_mod.FusedPipeline


def _run(tmp_path, sub, monkeypatch, max_dispatch):
    calls = []

    class Capture(_ORIG_PIPELINE):
        def run_blocks(self, ps, n_blocks, train=True):
            calls.append(n_blocks)
            return super().run_blocks(ps, n_blocks, train=train)

    monkeypatch.setattr(pipeline_mod, "FusedPipeline", Capture)
    main([
        "--config=refil_group_matching",
        "--env-config=group_matching",
        "with",
        "t_max=2000",
        "seed=5",
        "env_args.n_agents=4",
        "env_args.episode_limit=10",
        "batch_size_run=4",
        "batch_size=8",
        "buffer_size=16",
        "test_nepisode=8",
        "test_interval=1000",
        f"max_blocks_per_dispatch={max_dispatch}",
        f"local_results_path={tmp_path / sub}",
    ])
    mdir = os.path.join(str(tmp_path / sub), "metrics")
    fname = os.listdir(mdir)[0]
    with open(os.path.join(mdir, fname)) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    return rows, calls


def test_multi_block_dispatch_matches_single_block(tmp_path, monkeypatch):
    rows_multi, calls_multi = _run(tmp_path, "multi", monkeypatch, 32)
    rows_single, calls_single = _run(tmp_path, "single", monkeypatch, 1)

    # the multi-block run actually fused blocks; the control didn't
    assert max(calls_multi) > 1, calls_multi
    assert max(calls_single) == 1, calls_single
    assert len(calls_multi) < len(calls_single)

    # identical host-visible trajectory: same keys at the same t_env with
    # the same values (time_* phase timers are wall-clock, skip them)
    def series(rows):
        return [
            (r["key"], r["t"], r["value"])
            for r in rows
            if not r["key"].startswith("time_")
        ]

    sm, ss = series(rows_multi), series(rows_single)
    assert len(sm) == len(ss)
    for (k_m, t_m, v_m), (k_s, t_s, v_s) in zip(sm, ss):
        assert k_m == k_s and t_m == t_s, ((k_m, t_m), (k_s, t_s))
        np.testing.assert_allclose(v_m, v_s, rtol=1e-5, atol=1e-7,
                                   err_msg=k_m)
