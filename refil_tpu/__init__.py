"""refil-tpu: a TPU-native (JAX/XLA/Pallas/pjit) multi-agent RL framework with the
capabilities of REFIL (Randomized Entity-wise Factorization for Imagined Learning,
Iqbal et al., ICML 2021) / PyMARL.

Re-designed TPU-first, not a port:
  * environments are pure-JAX array programs, vectorized over thousands of
    episodes in lockstep under jit (vs. 8 forked OS processes + pipes in the
    reference, ``src/runners/parallel_runner.py``),
  * the whole-episode agent forward uses ``jax.lax.scan`` over time
    (vs. the per-timestep Python GRU loop, ``src/modules/agents/entity_rnn_agent.py:51-55``),
  * the replay buffer is an HBM-resident fixed-shape pytree ring buffer with
    donated in-place updates,
  * multi-chip scaling goes through ``jax.sharding.Mesh`` + jit shardings with
    XLA collectives over ICI (new capability; the reference is single-GPU).
"""

__version__ = "0.1.0"
