"""HBM-resident episode replay buffer.

Parity target: reference ``src/components/episode_buffer.py`` (EpisodeBatch +
ReplayBuffer). TPU-first re-design:

  * storage is a fixed-shape pytree ``{key: (buffer_size, T+1, ...)}`` living
    on device (HBM) — no host<->device copies on the hot path;
  * insertion is a donated jitted scatter at ``(index + arange(B)) % size``
    (the reference's recursive ring-wraparound split,
    ``episode_buffer.py:213-228``, becomes a single modular scatter);
  * sampling indices are drawn host-side without replacement — mirroring the
    reference's ``np.random.choice`` (``episode_buffer.py:239``) — and the
    gather runs jitted on device.

Unlike the reference we do NOT truncate sampled batches to ``max_t_filled``
(``run.py:269-270``): dynamic time shapes would retrigger XLA compilation; the
learner's ``filled`` masking makes the math identical, the padded tail is pure
(masked) compute.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=0)
def _scatter(data, batch, positions):
    return jax.tree.map(
        lambda buf, b: buf.at[positions].set(b.astype(buf.dtype)), data, batch
    )


# feature planes eligible for bf16 ring storage (mirrors core.pipeline)
_FEATURE_RING_KEYS = frozenset({"entities", "obs", "state", "actions_onehot"})


class ReplayBuffer:
    def __init__(self, template: Dict[str, jnp.ndarray], buffer_size: int,
                 seed: int = 0, device=None, sharding=None,
                 feature_dtype: str = "float32"):
        """``template``: one episode batch (B, T+1, ...) defining shapes/dtypes.

        ``device``: optional explicit placement for the ring storage — pass a
        CPU device to keep the buffer in host RAM (``buffer_cpu_only``,
        reference ``src/run.py:200``); samples are gathered there and moved to
        the accelerator by the learner's jit like any host input.

        ``sharding``: optional ``NamedSharding`` to spread the ring's episode
        axis over a device mesh (classic-loop SPMD path; the fused pipeline
        shards its own ring). Mutually exclusive with ``device``.

        ``feature_dtype``: ``"bfloat16"`` stores the float32 feature planes
        (entities/obs/state/actions_onehot) compressed; inserts down-cast and
        samples are cast back to the template dtypes. Reward/terminated/masks
        always keep their dtype (``buffer_dtype`` config knob).
        """
        assert device is None or sharding is None, "device and sharding conflict"
        assert feature_dtype in ("float32", "bfloat16"), feature_dtype
        self.buffer_size = buffer_size
        self.device = device
        self._out_dtypes = {k: v.dtype for k, v in template.items()}

        def store_dtype(k, dt):
            if (feature_dtype == "bfloat16" and k in _FEATURE_RING_KEYS
                    and dt == jnp.float32):
                return jnp.bfloat16
            return dt

        self.data = {
            k: jnp.zeros((buffer_size,) + x.shape[1:], store_dtype(k, x.dtype))
            for k, x in template.items()
        }
        if device is not None:
            self.data = jax.device_put(self.data, device)
        elif sharding is not None:
            self.data = jax.device_put(self.data, sharding)
        out_dtypes = self._out_dtypes
        # gather + cast back to template dtypes in ONE device op (the cast is
        # a no-op unless feature planes are stored compressed)
        self._gather = jax.jit(
            lambda data, idx: {
                k: data[k][idx].astype(out_dtypes[k]) for k in data
            }
        )
        self.index = 0
        self.episodes_in_buffer = 0
        self._rng = np.random.default_rng(seed)

    def insert_episode_batch(self, batch: Dict[str, jnp.ndarray]) -> None:
        B = jax.tree.leaves(batch)[0].shape[0]
        positions = jnp.asarray(
            (self.index + np.arange(B)) % self.buffer_size, jnp.int32
        )
        if self.device is not None:
            batch = jax.device_put(batch, self.device)
            positions = jax.device_put(positions, self.device)
        self.data = _scatter(self.data, batch, positions)
        self.index = int((self.index + B) % self.buffer_size)
        self.episodes_in_buffer = min(self.episodes_in_buffer + B, self.buffer_size)

    def can_sample(self, batch_size: int) -> bool:
        return self.episodes_in_buffer >= batch_size

    def sample(self, batch_size: int) -> Dict[str, jnp.ndarray]:
        """Uniform sample without replacement (reference ``episode_buffer.py:233-240``)."""
        assert self.can_sample(batch_size)
        if self.episodes_in_buffer == batch_size:
            idx = np.arange(batch_size)
        else:
            idx = self._rng.choice(self.episodes_in_buffer, batch_size, replace=False)
        return self._gather(self.data, jnp.asarray(idx, jnp.int32))

    def sample_many(self, n_iters: int, batch_size: int) -> Dict[str, jnp.ndarray]:
        """``n_iters`` independent uniform samples gathered in ONE device op,
        stacked on a leading axis (I, bs, ...) — feeds the learner's fused
        multi-iteration train step (one jit instead of ``training_iters``
        dispatches)."""
        assert self.can_sample(batch_size)
        if self.episodes_in_buffer == batch_size:
            idx = np.tile(np.arange(batch_size), (n_iters, 1))
        else:
            idx = np.stack(
                [
                    self._rng.choice(self.episodes_in_buffer, batch_size, replace=False)
                    for _ in range(n_iters)
                ]
            )
        return self._gather(self.data, jnp.asarray(idx, jnp.int32))
