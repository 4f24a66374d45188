"""RL target helpers.

Parity target: reference ``src/utils/rl_utils.py`` (``build_td_lambda_targets``
— present in the reference as an importable utility; the shipped learner uses
1-step targets only, ``q_learner.py:157``). Implemented with ``lax.scan``
(backward in time) instead of the reference's python loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_td_lambda_targets(
    rewards: jnp.ndarray,
    terminated: jnp.ndarray,
    mask: jnp.ndarray,
    target_qs: jnp.ndarray,
    gamma: float,
    td_lambda: float,
) -> jnp.ndarray:
    """TD(λ) returns.

    Args (matching the reference convention):
      rewards:    (B, T, 1) for transitions 0..T-1
      terminated: (B, T, 1) real-termination flags
      mask:       (B, T, 1) filled/valid-transition mask
      target_qs:  (B, T+1, 1) bootstrap values for states 0..T
      gamma, td_lambda: scalars.

    Returns (B, T, 1), the reference recursion verbatim (``rl_utils.py:22-32``):
      ret_T   = Q_T · (1 − Σ_t term_t)
      ret_t   = λγ·ret_{t+1} + m_t·(r_t + (1−λ)γ·Q_{t+1}·(1−term_t))
    """
    B, T, _ = rewards.shape
    terminated = terminated.astype(rewards.dtype)
    mask = mask.astype(rewards.dtype)
    ret_T = target_qs[:, -1] * (1.0 - terminated.sum(axis=1))

    def backward(ret_next, t):
        ret = td_lambda * gamma * ret_next + mask[:, t] * (
            rewards[:, t]
            + (1 - td_lambda) * gamma * target_qs[:, t + 1] * (1.0 - terminated[:, t])
        )
        return ret, ret

    _, rets = jax.lax.scan(backward, ret_T, jnp.arange(T - 1, -1, -1))
    return jnp.flip(rets, axis=0).transpose(1, 0, 2)
