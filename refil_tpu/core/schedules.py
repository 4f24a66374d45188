"""Exploration schedules.

Parity target: ``src/components/epsilon_schedules.py`` (DecayThenFlatSchedule).
Implemented as a pure function of the timestep so it can be evaluated either
host-side or inside jit (epsilon is passed into the jitted rollout as a scalar).
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DecayThenFlatSchedule:
    """Linear (or exponential) decay from ``start`` to ``finish`` over
    ``time_length`` steps, then flat.

    Matches reference ``epsilon_schedules.py:3-24`` semantics exactly.
    """

    start: float
    finish: float
    time_length: int
    decay: str = "linear"

    @property
    def delta(self) -> float:
        return (self.start - self.finish) / self.time_length

    @property
    def exp_scaling(self) -> float:
        if self.finish > 0:
            return -1.0 * self.time_length / math.log(self.finish)
        return 1.0

    def eval(self, t):
        """Evaluate the schedule at timestep ``t``.

        Works on python ints/floats and on jnp scalars (traceable).
        """
        if self.decay == "linear":
            return jnp.maximum(self.finish, self.start - self.delta * t)
        elif self.decay == "exp":
            return jnp.minimum(
                self.start, jnp.maximum(self.finish, jnp.exp(-t / self.exp_scaling))
            )
        raise ValueError(f"Unknown decay {self.decay}")

    def eval_host(self, t: float) -> float:
        """Pure-python evaluation (no device round trip) for the host loop."""
        if self.decay == "linear":
            return max(self.finish, self.start - self.delta * t)
        elif self.decay == "exp":
            return min(self.start, max(self.finish, math.exp(-t / self.exp_scaling)))
        raise ValueError(f"Unknown decay {self.decay}")
