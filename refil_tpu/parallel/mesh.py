"""Multi-chip SPMD: device mesh + sharding rules + multi-host init.

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

Multi-host: ``maybe_init_distributed`` wires ``jax.distributed.initialize``
from config (``distributed: True`` + coordinator/process keys, or the
standard cluster auto-detect). After init the mesh spans every process's
devices and each host's env shard is the locally-addressable slice of the
same global SPMD program — the replacement for the reference's per-host
fork/pipe env workers (``parallel_runner.py:20-35``).

On a single chip everything degrades to no-op shardings.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(config: Dict[str, Any]) -> bool:
    """Call ``jax.distributed.initialize`` when configured.

    Config keys (all optional unless ``distributed`` is True):
      * ``distributed``: master switch;
      * ``coordinator_address`` / ``num_processes`` / ``process_id``: passed
        through; any of them may be None, in which case JAX's cluster
        auto-detection (TPU pod metadata, SLURM, ...) fills them in.

    Must run before the first device access. Returns True when multi-process
    mode is active. On CPU, gloo collectives are selected so the same code
    path is exercisable without TPU hardware.
    """
    if not config.get("distributed", False):
        return False
    kwargs = {}
    for ck, jk in (
        ("coordinator_address", "coordinator_address"),
        ("num_processes", "num_processes"),
        ("process_id", "process_id"),
    ):
        v = config.get(ck)
        if v is not None:
            kwargs[jk] = v
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # flag renamed/absent on some builds — TPU path unaffected
        pass
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


class MeshContext:
    """Owns the mesh and the two shardings the framework needs."""

    def __init__(self, mesh_shape: Optional[Dict[str, int]] = None, devices=None):
        devices = devices if devices is not None else jax.devices()
        if mesh_shape:
            axes = tuple(mesh_shape.keys())
            sizes = tuple(int(v) for v in mesh_shape.values())
            n = int(np.prod(sizes))
            if n > len(devices):
                raise ValueError(
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
        """Place a pytree with leading batch axis on the data axis.

        Multi-process: the host value is treated as the GLOBAL batch (every
        process holds the same array, e.g. from a replicated computation or a
        shared seed) and each process keeps its addressable slice.
        """
        if jax.process_count() == 1:
            return jax.device_put(tree, self.batch_sharding)
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), self.batch_sharding,
                lambda idx, _x=np.asarray(x): _x[idx],
            ),
            tree,
        )

    def replicate(self, tree):
        if jax.process_count() == 1:
            return jax.device_put(tree, self.replicated)
        # every process holds the same host value (same PRNG seed path), so
        # replication is just stamping the global sharding on local copies
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), self.replicated, lambda idx, _x=np.asarray(x): _x[idx]
            ),
            tree,
        )

    def zeros_sharded(self, shape_tree):
        """Allocate a zeroed pytree directly with the batch sharding (created
        inside jit, so it is multi-process-safe: no host global array needed)."""
        import jax.numpy as jnp

        fn = jax.jit(
            lambda: jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shape_tree
            ),
            out_shardings=jax.tree.map(lambda _: self.batch_sharding, shape_tree),
        )
        return fn()

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
        if batch_size % self.n_data != 0:
            raise ValueError(
                f"batch size {batch_size} must divide over {self.n_data} "
                f"data shards (mesh axes {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))})"
            )


def maybe_make_mesh(args, logger=None) -> Optional[MeshContext]:
    """Build the production mesh from ``args`` (``run.py`` entry).

    * ``mesh_shape`` set (e.g. ``{data: 8}``): the mesh is mandatory — any
      problem (too few devices, non-divisible batch/buffer) raises loudly
      rather than silently training single-device.
    * ``mesh_shape`` null with >1 visible device: auto-shard over all devices
      when the batch sizes divide; otherwise warn and run single-device.
    """
    shape = getattr(args, "mesh_shape", None)
    sizes = (
        int(getattr(args, "batch_size_run", 1)),
        int(getattr(args, "batch_size", 1)),
        int(getattr(args, "buffer_size", 1)),
    )
    if shape:
        mesh = MeshContext(shape)
        for s in sizes:
            mesh.check_divisible(s)
        return mesh
    if len(jax.devices()) > 1:
        mesh = MeshContext()
        if all(s % mesh.n_data == 0 for s in sizes):
            return mesh
        if logger is not None:
            logger.warning(
                "%d devices visible but batch_size_run/batch_size/buffer_size "
                "%s do not all divide by %d — running single-device. Set "
                "mesh_shape to force an error instead.",
                len(jax.devices()), sizes, mesh.n_data,
            )
    return None
