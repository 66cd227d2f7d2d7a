"""Abstract SDE contract.

Parity with the reference abstract base (main/models/sde/base.py:5-64) but as
a stateless functional core: methods are pure jnp functions, random draws take
explicit PRNG keys, and image tensors are NHWC with the phase-space state
``z = concat([x, m], axis=-1)`` on the trailing channel axis.
"""

from __future__ import annotations

import abc

import jax


class SDE(abc.ABC):
    """A forward-time Ito SDE dz = f(z,t) dt + g(t) dW on t in [0, T]."""

    def __init__(self, n_timesteps: int):
        self.N = n_timesteps  # reference: main/models/sde/base.py:8-10

    @property
    def T(self) -> float:
        return 1.0

    @property
    @abc.abstractmethod
    def type(self) -> str:
        ...

    @abc.abstractmethod
    def sde(self, z, t):
        """Forward drift and diffusion ``(f, g)`` at (z, t)."""

    @abc.abstractmethod
    def reverse_sde(self, z, t, score_fn, probability_flow=False):
        """Reverse drift/diffusion in flipped time (t measured from T)."""

    @abc.abstractmethod
    def perturb_data(self, *args, **kwargs):
        """Sample from the perturbation kernel p(z_t | z_0)."""

    @abc.abstractmethod
    def prior_sampling(self, key: jax.Array, shape):
        """Sample z_T from the equilibrium prior."""

    @abc.abstractmethod
    def prior_logp(self, z):
        """Log-density of the prior at z."""
