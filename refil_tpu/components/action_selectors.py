"""Action selection (pure functions, jit-friendly).

Parity target: reference ``src/components/action_selectors.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -jnp.inf


def epsilon_greedy(
    key: jax.Array,
    agent_qs: jnp.ndarray,
    avail_actions: jnp.ndarray,
    epsilon: jnp.ndarray,
) -> jnp.ndarray:
    """Per-agent ε-greedy over available actions.

    Matches reference ``action_selectors.py:45-63``: Bernoulli(ε) per agent
    chooses between a uniform draw over available actions and the argmax of
    the availability-masked Q-values.

    Args:
      agent_qs: (B, Na, A) Q-values.
      avail_actions: (B, Na, A) bool.
      epsilon: scalar (0.0 for greedy/test mode).

    Returns (B, Na) int32 actions.
    """
    k_pick, k_rand = jax.random.split(key)
    B, Na, A = agent_qs.shape
    masked_q = jnp.where(avail_actions, agent_qs, _NEG)
    greedy = jnp.argmax(masked_q, axis=-1)
    # uniform over available: categorical on log(avail)
    rand_logits = jnp.where(avail_actions, 0.0, _NEG)
    random_actions = jax.random.categorical(k_rand, rand_logits, axis=-1)
    pick_random = jax.random.uniform(k_pick, (B, Na)) < epsilon
    return jnp.where(pick_random, random_actions, greedy).astype(jnp.int32)


def multinomial(
    key: jax.Array,
    agent_probs: jnp.ndarray,
    avail_actions: jnp.ndarray,
    test_greedy: bool = True,
    test_mode: bool = False,
) -> jnp.ndarray:
    """Sample from availability-masked policy probabilities
    (reference ``action_selectors.py:10-31``)."""
    masked = jnp.where(avail_actions, agent_probs, 0.0)
    if test_mode and test_greedy:
        return jnp.argmax(masked, axis=-1).astype(jnp.int32)
    logits = jnp.log(jnp.clip(masked, min=1e-20))
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


SELECTOR_REGISTRY = {
    "epsilon_greedy": epsilon_greedy,
    "multinomial": multinomial,
}
