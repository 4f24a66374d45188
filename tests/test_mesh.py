"""Multi-chip SPMD: the full training step over an 8-device CPU mesh."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 3 * 4  # x3 imagine tiling on batch 4


def test_sharded_equals_unsharded():
    """{data: 8} and single-device fused pipelines produce the same
    loss/metric trajectory from the same seed and global batch (VERDICT r2
    item 2: the multi-chip correctness gate, not just liveness)."""
    import __graft_entry__ as g

    g.assert_sharded_equals_unsharded(8)
