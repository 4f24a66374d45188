"""Environment interface for the vectorized, functional JAX envs.

Replaces the reference's duck-typed ``MultiAgentEnv`` (``src/envs/multiagentenv.py``)
with a *functional* contract: env objects are stateless holders of static
configuration; all episode state lives in an explicit pytree threaded through
``reset``/``step``. Everything is batched over a leading env axis ``B`` and
jit/vmap/shard-friendly.

Observation dict keys (the entity scheme of ``src/run.py:177-192``):
  * ``entities``     (B, Ne, D)  float32
  * ``obs_mask``     (B, Ne, Ne) bool   — True = cannot see
  * ``entity_mask``  (B, Ne)     bool   — True = inactive slot
  * ``avail_actions``(B, Na, A)  bool
  * optional ``gt_mask`` (B, Na, Ne) bool — ground-truth group non-membership

``step`` returns ``(state, obs, reward (B,), done (B,), info)`` where ``info``
is a dict of (B,) arrays; ``info['episode_limit']`` distinguishes time-limit
truncation from real termination (consumed by the runner to build the
``terminated`` flag exactly like ``parallel_runner.py:177-183``).
"""
from __future__ import annotations

from typing import Any, Dict, Protocol, Tuple

import jax


class EntityEnv(Protocol):
    """Static-config env with functional batched reset/step."""

    def env_info(self) -> Dict[str, Any]:
        """Scheme metadata: entity_shape, n_actions, n_agents, n_entities,
        episode_limit, gt_mask_avail (cf. ``multiagentenv.py:61-71``)."""
        ...

    def reset(self, key: jax.Array, batch_size: int, test: bool = False,
              index=None) -> Tuple[Any, Dict[str, jax.Array]]:
        ...

    def step(self, state: Any, actions: jax.Array, key: jax.Array):
        ...


ENV_REGISTRY: Dict[str, Any] = {}

_warned_env_args: set = set()


def warn_unused_env_args(env_name: str, unused: Dict[str, Any],
                         accepted: Tuple[str, ...] = ()) -> None:
    """Warn once per env class about ``env_args`` keys the env does not
    consume. Keys in ``accepted`` are reference config keys with no stand-in
    analogue (SC2 binary/process options etc.) and stay silent; anything else
    is surfaced so a config knob can never be silently ignored."""
    unknown = sorted(k for k in unused if k not in accepted)
    if not unknown or (env_name, tuple(unknown)) in _warned_env_args:
        return
    _warned_env_args.add((env_name, tuple(unknown)))
    import logging

    logging.getLogger("refil_tpu").warning(
        "%s: ignoring unrecognized env_args %s (accepted-but-inert reference "
        "keys are: %s)", env_name, unknown, sorted(accepted),
    )


def register_env(name: str):
    def deco(cls):
        ENV_REGISTRY[name] = cls
        return cls

    return deco
