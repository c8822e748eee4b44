"""Elliptical slice sampling (Murray, Adams & MacKay 2010) in pure JAX.

Reimplements the reference's elliptical_slice
(functionalmf/elliptical_slice.py:52-124) with the bracket-shrinking loop as
a `lax.while_loop` (data-dependent iteration count, bounded by `max_iters`),
counter-based keys, and a jit/vmap-compatible log-likelihood contract:
``loglik(x) -> scalar`` on a single point (close over any extra args).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["elliptical_slice"]


def elliptical_slice(key, x, prior_sample, loglik, cur_ll=None, mu=None,
                     angle_range: float = 0.0, max_iters: int = 100):
    """One ESS update. Returns (x_new, ll_new).

    Args mirror elliptical_slice_ (elliptical_slice.py:59-124):
      prior_sample: a draw nu ~ N(0, Sigma) with x's shape (the reference
        also accepts chol(Sigma); here callers draw nu themselves, which is
        the batched-friendly form).
      mu: optional mean offset; the ellipse is traced around mu.
      angle_range: 0 => full ellipse with shrinkage at first rejection;
        > 0 => bracket of that width centred at random.

    Termination is guaranteed in exact arithmetic (phi -> 0 recovers x with
    ll = cur_ll > h); `max_iters` bounds the loop for jit, falling back to
    the current state if exhausted.
    """
    x = jnp.asarray(x)
    nu = jnp.asarray(prior_sample)
    if mu is None:
        mu = jnp.zeros_like(x)
    if cur_ll is None:
        cur_ll = loglik(x)

    k_h, k_phi, k_loop = jax.random.split(key, 3)
    h = jnp.log(jax.random.uniform(k_h)) + cur_ll

    two_pi = 2.0 * jnp.pi
    if angle_range <= 0:
        phi = jax.random.uniform(k_phi) * two_pi
        phi_min = phi - two_pi
        phi_max = phi
    else:
        phi_min = -angle_range * jax.random.uniform(k_phi)
        phi_max = phi_min + angle_range
        phi = jax.random.uniform(jax.random.fold_in(k_phi, 1)) * (phi_max - phi_min) + phi_min

    x0 = x - mu

    def propose(phi):
        return x0 * jnp.cos(phi) + nu * jnp.sin(phi) + mu

    def cond(carry):
        _, _, _, _, _, done, it = carry
        return (~done) & (it < max_iters)

    def body(carry):
        phi, phi_min, phi_max, xp, llp, done, it = carry
        xp = propose(phi)
        llp = loglik(xp)
        accept = llp >= h
        # shrink bracket toward 0 on rejection (elliptical_slice.py:111-122)
        phi_max = jnp.where(~accept & (phi > 0), phi, phi_max)
        phi_min = jnp.where(~accept & (phi < 0), phi, phi_min)
        u = jax.random.uniform(jax.random.fold_in(k_loop, it))
        phi_next = jnp.where(accept, phi, u * (phi_max - phi_min) + phi_min)
        return (phi_next, phi_min, phi_max, xp, llp, accept, it + 1)

    init = (phi, phi_min, phi_max, x, cur_ll, jnp.asarray(False), jnp.asarray(0))
    _, _, _, xp, llp, done, _ = jax.lax.while_loop(cond, body, init)
    x_new = jnp.where(done, xp, x)
    ll_new = jnp.where(done, llp, cur_ll)
    return x_new, ll_new
