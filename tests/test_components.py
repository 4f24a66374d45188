"""Unit tests: replay buffer, epsilon schedule, action selectors."""
import jax
import jax.numpy as jnp
import numpy as np

from refil_tpu.components.action_selectors import epsilon_greedy
from refil_tpu.core.buffer import ReplayBuffer
from refil_tpu.core.schedules import DecayThenFlatSchedule


def test_schedule_linear():
    # reference epsilon_schedules.py semantics (f32 on device)
    s = DecayThenFlatSchedule(1.0, 0.05, 5000, decay="linear")
    assert float(s.eval(0)) == 1.0
    np.testing.assert_allclose(float(s.eval(2500)), 0.525, atol=1e-6)
    np.testing.assert_allclose(float(s.eval(5000)), 0.05, rtol=1e-6)
    np.testing.assert_allclose(float(s.eval(999999)), 0.05, rtol=1e-6)
    # host variant is exact python math
    assert s.eval_host(0) == 1.0
    assert s.eval_host(999999) == 0.05


def test_schedule_exp():
    s = DecayThenFlatSchedule(1.0, 0.05, 1000, decay="exp")
    assert float(s.eval(0)) == 1.0
    np.testing.assert_allclose(float(s.eval(10 ** 9)), 0.05, rtol=1e-6)
    assert s.eval_host(10 ** 9) == 0.05


def _template(B=4, L=3):
    return {
        "a": jnp.zeros((B, L, 2), jnp.float32),
        "b": jnp.zeros((B, L), jnp.int32),
    }


def test_buffer_insert_sample_wraparound():
    buf = ReplayBuffer(_template(), buffer_size=10, seed=0)
    for i in range(4):  # 16 episodes into a 10-slot ring
        batch = {
            "a": jnp.full((4, 3, 2), i, jnp.float32),
            "b": jnp.full((4, 3), i, jnp.int32),
        }
        buf.insert_episode_batch(batch)
    assert buf.episodes_in_buffer == 10
    assert buf.index == 6
    # ring content: slots 0-5 overwritten by batches 2(last 2 eps)+3; 6-9 from batch 1(2 eps)+2
    b = np.asarray(buf.data["b"][:, 0])
    assert set(b.tolist()) <= {1, 2, 3}
    s = buf.sample(10)
    assert s["a"].shape == (10, 3, 2)
    # sampling without replacement over full buffer returns each slot once
    s_sorted = np.sort(np.asarray(s["b"][:, 0]))
    np.testing.assert_array_equal(s_sorted, np.sort(b))


def test_buffer_can_sample():
    buf = ReplayBuffer(_template(), buffer_size=10)
    assert not buf.can_sample(1)
    buf.insert_episode_batch(_template())
    assert buf.can_sample(4)
    assert not buf.can_sample(5)


def test_epsilon_greedy_greedy_mode():
    q = jnp.asarray([[[0.1, 0.9, 0.2], [0.8, 0.1, 0.2]]])
    avail = jnp.ones((1, 2, 3), bool)
    a = epsilon_greedy(jax.random.PRNGKey(0), q, avail, jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(a), [[1, 0]])


def test_epsilon_greedy_respects_availability():
    q = jnp.asarray([[[5.0, 0.9, 0.2]]])
    avail = jnp.asarray([[[False, True, True]]])
    for seed in range(20):
        a = epsilon_greedy(jax.random.PRNGKey(seed), q, avail, jnp.asarray(1.0))
        assert int(a[0, 0]) != 0  # unavailable action never picked


def test_epsilon_greedy_statistics():
    # with eps=1, uniform over available actions
    q = jnp.zeros((2000, 1, 4))
    avail = jnp.ones((2000, 1, 4), bool).at[:, :, 3].set(False)
    a = np.asarray(epsilon_greedy(jax.random.PRNGKey(1), q, avail, jnp.asarray(1.0)))
    counts = np.bincount(a.ravel(), minlength=4)
    assert counts[3] == 0
    assert (np.abs(counts[:3] / 2000 - 1 / 3) < 0.05).all()
