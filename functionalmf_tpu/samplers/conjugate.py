"""Conjugate inverse-gamma precision prior.

Functional, key-passing reimplementation of ConjugateInverseGammaPrior
(reference functionalmf/genlasso.py:139-171): the posterior of a shared
precision given Gaussian residuals, with NaN masking.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["ConjugateInverseGammaPrior", "resample_precision"]


def resample_precision(key, means, obs, shape: float = 0.1, rate: float = 0.1,
                       mask=None):
    """Draw precision ~ Gamma(shape + n/2, rate + sqerr/2) (genlasso.py:149-168).

    `obs` may contain NaNs (masked out). `mask`, if given, overrides the
    NaN mask (1.0 = observed); use it inside jit where data has been
    zero-filled already.
    """
    means = jnp.asarray(means)
    obs = jnp.asarray(obs)
    if mask is None:
        mask = (~jnp.isnan(obs)).astype(means.dtype)
        obs = jnp.where(jnp.isnan(obs), 0.0, obs)
    diff = (means - obs) * mask
    sqerr = jnp.sum(diff * diff)
    n_obs = jnp.sum(mask)
    a_post = shape + n_obs / 2.0
    b_post = rate + sqerr / 2.0
    # numpy scale parameterization: Gamma(a, scale=1/b) == Gamma(a, rate=b).
    return jax.random.gamma(key, a_post) / b_post


@dataclasses.dataclass(frozen=True)
class ConjugateInverseGammaPrior:
    """API-compatible wrapper (genlasso.py:139-171), key-passing.

    N = 1 returns a scalar precision; N > 1 broadcasts the shared draw.
    """

    N: int = 1
    shape: float = 0.1
    rate: float = 0.1

    def resample(self, key, data, mask=None):
        means, obs = data
        prec = resample_precision(key, means, obs, self.shape, self.rate, mask=mask)
        if self.N == 1:
            return prec
        return jnp.full((self.N,), prec)

    def draw_from_prior(self, key, size=()):
        return jax.random.gamma(key, jnp.asarray(self.shape), shape=size) / self.rate
