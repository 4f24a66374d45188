"""Fused on-device training pipeline.

The reference's outer loop (``src/run.py:258-308``) interleaves host-side
orchestration between every stage: rollout -> buffer insert -> sample ->
``training_iters`` learner updates -> target sync. Our classic path
(`refil_tpu/run.py`) already jits each stage, but still pays one dispatch per
stage and one blocking device->host stats transfer per episode block — over a
tunneled TPU each of those costs a network round trip.

This module fuses the ENTIRE block into one donated jitted program:

  rollout (lax.scan over the episode)
  -> ring-buffer scatter insert
  -> uniform-without-replacement sampling of ``training_iters`` batches
     (Gumbel top-k over filled slots — the traced equivalent of the
     reference's ``np.random.choice(replace=False)``,
     ``episode_buffer.py:239``)
  -> ``training_iters`` fused learner updates (lax.scan)
  -> traced hard target sync on the reference's episode cadence
     (``q_learner.py:180-182``)

and optionally ``lax.scan``s the block itself, so N episode blocks run in ONE
dispatch with zero host involvement. All mutable state (params, target params,
optimizer state, replay buffer, RNG key, t_env / episode counters) lives in a
single donated ``PipelineState`` pytree that never leaves HBM.

Semantics parity notes:
  * epsilon is evaluated from the on-device ``t_env`` at block start — the
    same value the host loop would compute (``action_selectors.py:48``);
  * the target-update check uses the pre-increment episode counter, matching
    ``run.py``'s call order (train with ``episode``, then ``episode += B``);
  * sampling only ever picks filled slots, also while the ring is partially
    filled (the reference samples from ``episodes_in_buffer``).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


# Episode-batch planes eligible for compressed ring storage: the big float32
# feature planes the learner immediately casts to the compute dtype anyway.
# Reward/terminated/filled (the TD-math inputs) and the bool masks are never
# down-cast — see results/PERF_ANALYSIS.md "Where the single-chip envelope
# ends" for the HBM accounting that motivates this.
_FEATURE_RING_KEYS = frozenset({"entities", "obs", "state", "actions_onehot"})


class PipelineState(NamedTuple):
    train: Any  # learners.q_learner.TrainState
    buffer: Any  # pytree {key: (buffer_size, T+1, ...)}
    buffer_index: jnp.ndarray  # i32 scalar
    episodes_in_buffer: jnp.ndarray  # i32 scalar
    t_env: jnp.ndarray  # i32 scalar
    episode: jnp.ndarray  # i32 scalar
    last_target_episode: jnp.ndarray  # i32 scalar
    key: jax.Array


class FusedPipeline:
    """Owns the fused block program. ``runner``/``learner`` supply the traced
    stage implementations (``_rollout_impl`` / ``_train_iters_impl``)."""

    def __init__(self, runner, learner, buffer_size: int, args, mesh=None):
        self.runner = runner
        self.learner = learner
        self.args = args
        self.mesh = mesh  # Optional[parallel.mesh.MeshContext]
        self.batch_size_run = int(args.batch_size_run)
        # ring capacity rounds UP to the next insert-batch multiple so the
        # per-block insert is always ONE contiguous dynamic-update-slice,
        # which XLA keeps in-place on the scan-carried ring. The scatter a
        # non-aligned ring needs copies the whole ring every block (measured
        # -15% end-to-end at the combat B=512 point, -80% at B=8) and
        # aliasing does not survive a lax.cond fallback either. Capacity can
        # exceed the configured size by at most batch_size_run - 1 episodes
        # (every shipped config is already aligned: 5000 % 8 == 2000 % 8 == 0).
        self.buffer_size = -(-int(buffer_size) // self.batch_size_run) * (
            self.batch_size_run
        )
        if self.buffer_size != int(buffer_size):
            import logging

            logging.getLogger("refil_tpu").info(
                "replay ring rounded %d -> %d episodes (multiple of "
                "batch_size_run=%d keeps the insert in-place)",
                int(buffer_size), self.buffer_size, self.batch_size_run,
            )
        self.batch_size = int(args.batch_size)
        # buffer_dtype=bfloat16 stores the feature planes of the ring
        # (entities/obs/state/actions_onehot) in bf16 — halves the dominant
        # HBM cost of large rings; reward/terminated/masks keep their dtype
        # and samples are cast back to the rollout dtypes before training.
        self.buffer_dtype = str(getattr(args, "buffer_dtype", "float32"))
        assert self.buffer_dtype in ("float32", "bfloat16"), (
            f"buffer_dtype must be float32 or bfloat16, got {self.buffer_dtype}"
        )
        self.training_iters = int(args.training_iters)
        self.target_update_interval = int(args.target_update_interval)
        # gt-factor diagnostics (reference q_learner.py:98-105,138-147) are
        # pure functions of (params, batch, key) — traced into the block on
        # the last sampled batch when the config asks for them
        self.gt_diag = bool(getattr(args, "test_gt_factors", False))
        jit_kw = {}
        if mesh is not None:
            mesh.check_divisible(self.batch_size_run)
            mesh.check_divisible(self.batch_size)
            assert self.buffer_size % mesh.n_data == 0, (
                f"buffer_size {self.buffer_size} must divide over "
                f"{mesh.n_data} data shards"
            )
            # SPMD layout: replay ring sharded over the data axis on the
            # episode dim; params/opt/counters replicated. Rollout batch and
            # train samples inherit the data sharding; XLA inserts the grad
            # psum over ICI from these annotations alone.
            state_sh = PipelineState(
                train=mesh.replicated,
                buffer=mesh.batch_sharding,
                buffer_index=mesh.replicated,
                episodes_in_buffer=mesh.replicated,
                t_env=mesh.replicated,
                episode=mesh.replicated,
                last_target_episode=mesh.replicated,
                key=mesh.replicated,
            )
            jit_kw = dict(
                in_shardings=(state_sh,),
                out_shardings=(state_sh, mesh.replicated),
            )
        # static args positionally: pjit rejects kwargs when in_shardings is set
        self._block = jax.jit(
            self._block_impl, static_argnums=(1,), donate_argnums=0, **jit_kw
        )
        self._blocks = jax.jit(
            self._blocks_impl, static_argnums=(1, 2), donate_argnums=0, **jit_kw
        )

    # ------------------------------------------------------------------
    def init_state(self, train_state, key: jax.Array, t_env: int = 0,
                   episode: int = 0) -> PipelineState:
        """Allocate the HBM ring buffer by tracing one rollout's shapes
        (no device work: uses ``jax.eval_shape``)."""
        B = self.batch_size_run
        shapes = jax.eval_shape(
            functools.partial(
                self.runner._rollout_impl, batch_size=B, test=False
            ),
            train_state.params["agent"],
            jax.random.PRNGKey(0),
            jnp.float32(0.0),
            jnp.int32(-1),
        )[0]
        shapes = {
            k: jax.ShapeDtypeStruct(s.shape, self._ring_dtype(k, s.dtype))
            for k, s in shapes.items()
        }
        if self.mesh is not None:
            # allocate directly with the ring sharding (created inside jit —
            # multi-process-safe, no transient host-global array)
            buffer = self.mesh.zeros_sharded(
                jax.tree.map(
                    lambda s: jax.ShapeDtypeStruct(
                        (self.buffer_size,) + s.shape[1:], s.dtype
                    ),
                    shapes,
                )
            )
            train_state = self.mesh.replicate(train_state)
        else:
            buffer = jax.tree.map(
                lambda s: jnp.zeros((self.buffer_size,) + s.shape[1:], s.dtype),
                shapes,
            )
        counters = dict(
            buffer_index=jnp.int32(0),
            episodes_in_buffer=jnp.int32(0),
            t_env=jnp.int32(t_env),
            episode=jnp.int32(episode),
            last_target_episode=jnp.int32(episode),
            key=key,
        )
        if self.mesh is not None:
            counters = self.mesh.replicate(counters)
        return PipelineState(train=train_state, buffer=buffer, **counters)

    # ------------------------------------------------------------------
    def _ring_dtype(self, key: str, dtype) -> Any:
        """Storage dtype for one ring plane under ``buffer_dtype``."""
        if (
            self.buffer_dtype == "bfloat16"
            and key in _FEATURE_RING_KEYS
            and dtype == jnp.float32
        ):
            return jnp.bfloat16
        return dtype

    def _sample_idx(self, key: jax.Array, episodes_in_buffer) -> jnp.ndarray:
        """(training_iters, batch_size) uniform-without-replacement indices
        into the filled prefix of the ring (Gumbel top-k)."""
        g = jax.random.gumbel(
            key, (self.training_iters, self.buffer_size), jnp.float32
        )
        filled = jnp.arange(self.buffer_size) < episodes_in_buffer
        g = jnp.where(filled[None, :], g, -jnp.inf)
        _, idx = jax.lax.top_k(g, self.batch_size)
        return idx

    def _block_impl(self, pstate: PipelineState, train: bool = True):
        B = self.batch_size_run
        key, k_roll, k_sample, k_train, k_diag = jax.random.split(pstate.key, 5)
        epsilon = self.runner.schedule.eval(pstate.t_env.astype(jnp.float32))
        epsilon = epsilon.astype(jnp.float32)

        batch, roll_stats = self.runner._rollout_impl(
            pstate.train.params["agent"], k_roll, epsilon, jnp.int32(-1),
            batch_size=B, test=False,
        )
        if self.mesh is not None:
            # pin the env-batch axis to the data shards so the ring scatter
            # and the sampled train batches stay local-per-shard
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, self.mesh.batch_sharding
                ),
                batch,
            )

        # ring insert: the capacity is batch-aligned (see __init__), so the
        # insert never wraps and is ONE contiguous dynamic-update-slice —
        # the pattern XLA keeps in-place on the donated/scan-carried ring
        start = pstate.buffer_index
        buffer = jax.tree.map(
            lambda buf, b: jax.lax.dynamic_update_slice_in_dim(
                buf, b.astype(buf.dtype), start, axis=0
            ),
            pstate.buffer,
            batch,
        )
        buffer_index = (pstate.buffer_index + B) % self.buffer_size
        episodes_in_buffer = jnp.minimum(
            pstate.episodes_in_buffer + B, self.buffer_size
        )

        t_env = pstate.t_env + roll_stats["ep_lengths"].sum().astype(jnp.int32)

        train_state = pstate.train
        stats = {
            "ep_returns": roll_stats["ep_returns"],
            "ep_lengths": roll_stats["ep_lengths"],
            "final_info": roll_stats["final_info"],
            "epsilon": epsilon,
            "t_env": t_env,
        }
        if train:
            idx = self._sample_idx(k_sample, episodes_in_buffer)
            # gather + cast back to the rollout dtypes (no-op unless the ring
            # stores compressed feature planes, see _ring_dtype)
            samples = jax.tree.map(
                lambda buf, b: buf[idx].astype(b.dtype), buffer, batch
            )
            train_state, metrics = self.learner._train_iters_impl(
                train_state, samples, k_train
            )
            if self.gt_diag:
                diag = self.learner.gt_diagnostics(
                    train_state, jax.tree.map(lambda x: x[-1], samples), k_diag
                )
                if diag:
                    metrics = {**metrics, **diag}
            # hard target sync on the reference cadence (q_learner.py:180-182);
            # pre-increment episode counter, matching run.py's call order
            do_sync = (
                pstate.episode - pstate.last_target_episode
            ) >= self.target_update_interval
            target_params = jax.tree.map(
                lambda p, t: jnp.where(do_sync, p, t),
                train_state.params,
                train_state.target_params,
            )
            train_state = train_state._replace(target_params=target_params)
            last_target_episode = jnp.where(
                do_sync, pstate.episode, pstate.last_target_episode
            )
            stats["metrics"] = metrics
        else:
            last_target_episode = pstate.last_target_episode

        new_state = PipelineState(
            train=train_state,
            buffer=buffer,
            buffer_index=buffer_index,
            episodes_in_buffer=episodes_in_buffer,
            t_env=t_env,
            episode=pstate.episode + B,
            last_target_episode=last_target_episode,
            key=key,
        )
        return new_state, stats

    def _blocks_impl(self, pstate: PipelineState, n_blocks: int, train: bool = True):
        def body(st, _):
            return self._block_impl(st, train=train)

        return jax.lax.scan(body, pstate, None, length=n_blocks)

    # ------------------------------------------------------------------
    def block(self, pstate: PipelineState, train: bool = True):
        """One episode block in one dispatch. Returns (state, stats) with
        stats still on device — fetch with ``jax.device_get`` when needed."""
        return self._block(pstate, train)

    def run_blocks(self, pstate: PipelineState, n_blocks: int, train: bool = True):
        """``n_blocks`` episode blocks in ONE dispatch (lax.scan over the
        fused block). Stats leaves are stacked on a leading block axis."""
        return self._blocks(pstate, n_blocks, train)

    # ------------------------------------------------------------------
    def warmup_blocks(self) -> int:
        """Number of rollout-only blocks before the buffer can serve a full
        sample (host-deterministic: the fill level is index arithmetic)."""
        return max(1, -(-self.batch_size // self.batch_size_run))
