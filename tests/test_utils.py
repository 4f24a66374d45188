"""TD(λ) targets vs a numpy transcription of the reference recursion
(``src/utils/rl_utils.py:22-32``), and profiling helpers."""
import numpy as np
import jax.numpy as jnp

from refil_tpu.utils.profiling import PhaseTimer
from refil_tpu.utils.rl_utils import build_td_lambda_targets


def _np_td_lambda(rewards, terminated, mask, target_qs, gamma, lam):
    B, Tp1, A = target_qs.shape
    ret = np.zeros_like(target_qs)
    ret[:, -1] = target_qs[:, -1] * (1 - terminated.sum(axis=1))
    for t in range(Tp1 - 2, -1, -1):
        ret[:, t] = lam * gamma * ret[:, t + 1] + mask[:, t] * (
            rewards[:, t] + (1 - lam) * gamma * target_qs[:, t + 1] * (1 - terminated[:, t])
        )
    return ret[:, :-1]


def test_td_lambda_matches_reference_recursion():
    rng = np.random.RandomState(0)
    B, T = 4, 7
    rewards = rng.randn(B, T, 1).astype(np.float32)
    terminated = np.zeros((B, T, 1), np.float32)
    terminated[0, 4] = 1  # one episode really terminates at t=4
    mask = np.ones((B, T, 1), np.float32)
    mask[0, 5:] = 0
    target_qs = rng.randn(B, T + 1, 1).astype(np.float32)

    for lam in (0.0, 0.5, 1.0):
        want = _np_td_lambda(rewards, terminated, mask, target_qs, 0.99, lam)
        got = build_td_lambda_targets(
            jnp.asarray(rewards), jnp.asarray(terminated), jnp.asarray(mask),
            jnp.asarray(target_qs), 0.99, lam,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_td_lambda_zero_is_one_step():
    # λ=0 on an unmasked, non-terminating stream reduces to r + γQ_{t+1}
    rng = np.random.RandomState(1)
    B, T = 2, 5
    rewards = rng.randn(B, T, 1).astype(np.float32)
    target_qs = rng.randn(B, T + 1, 1).astype(np.float32)
    got = build_td_lambda_targets(
        jnp.asarray(rewards), jnp.zeros((B, T, 1)), jnp.ones((B, T, 1)),
        jnp.asarray(target_qs), 0.9, 0.0,
    )
    want = rewards + 0.9 * target_qs[:, 1:]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.stats()
    assert "time_a_ms" in s and s["time_a_ms"] >= 0
    assert t.count["a"] == 2
