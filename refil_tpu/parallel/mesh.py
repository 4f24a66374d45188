"""Multi-chip SPMD: device mesh + sharding rules.

New capability relative to the reference (which is strictly single-GPU +
fork/pipe env workers, SURVEY §2): both the rollout and the train step run as
SPMD programs over a ``jax.sharding.Mesh``:

  * the env batch axis (``batch_size_run``) and the replay-sample batch axis
    are sharded over the ``data`` mesh axis — each chip simulates its own env
    shard and computes gradients for its batch shard;
  * parameters, optimizer and target-net state are replicated; XLA inserts the
    gradient ``psum`` over ICI automatically from the sharding annotations
    (the "let XLA insert collectives" recipe);
  * REFIL's ×3 imagine tiling concatenates along the sharded batch axis, so
    the tiled forward shards the same way.

On a single chip everything degrades to no-op shardings.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshContext:
    """Owns the mesh and the two shardings the framework needs."""

    def __init__(self, mesh_shape: Optional[Dict[str, int]] = None, devices=None):
        devices = devices if devices is not None else jax.devices()
        if mesh_shape:
            axes = tuple(mesh_shape.keys())
            sizes = tuple(int(v) for v in mesh_shape.values())
            n = int(np.prod(sizes))
            assert n <= len(devices), (
                f"mesh {mesh_shape} needs {n} devices, have {len(devices)}"
            )
            dev_array = np.asarray(devices[:n]).reshape(sizes)
        else:
            axes = ("data",)
            dev_array = np.asarray(devices)
        self.mesh = Mesh(dev_array, axes)
        self.data_axis = axes[0]
        self.n_data = dev_array.shape[0]
        self.batch_sharding = NamedSharding(self.mesh, P(self.data_axis))
        self.replicated = NamedSharding(self.mesh, P())

    def shard_batch(self, tree):
        """Place a pytree with leading batch axis on the data axis."""
        return jax.device_put(tree, self.batch_sharding)

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def wrap_train_step(self, fn):
        """jit a (state, batch, key) -> (state, metrics) step with explicit
        shardings: state replicated, batch data-sharded, outputs replicated."""
        return jax.jit(
            fn,
            in_shardings=(self.replicated, self.batch_sharding, self.replicated),
            out_shardings=(self.replicated, self.replicated),
            donate_argnums=0,
        )

    def check_divisible(self, batch_size: int) -> None:
        assert batch_size % self.n_data == 0, (
            f"batch size {batch_size} must divide over {self.n_data} data shards"
        )


def maybe_make_mesh(args) -> Optional[MeshContext]:
    """Build a mesh when configured or when >1 device is visible."""
    shape = getattr(args, "mesh_shape", None)
    if shape:
        return MeshContext(shape)
    if len(jax.devices()) > 1:
        return MeshContext()
    return None
