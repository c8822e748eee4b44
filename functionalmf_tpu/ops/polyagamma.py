"""Pure-JAX Polya-Gamma sampler.

TPU-native replacement for the reference's native pypolyagamma dependency
(C++/Cython, used at functionalmf/factor.py:431-432, 458-460 for the
Binomial / Negative-Binomial augmentation). The reference draws from a
single seeded sequential-stream RNG (`PyPolyaGamma(seed)`); here every draw
is counter-based (`jax.random`), fully vectorized over the whole tensor,
and jit/vmap-compatible.

Method: truncated sum-of-gammas representation with an exact tail-mean
correction. PG(b, c) is an infinite convolution (Polson, Scott & Windle
2013, eq. 3):

    omega = (1 / (2 pi^2)) * sum_{k>=1} g_k / ((k - 1/2)^2 + c^2 / (4 pi^2)),
    g_k ~ Gamma(b, 1)  independent.

We draw the first `num_terms` terms exactly and add the *expected value* of
the discarded tail, computed in closed form from E[PG(b, c)] =
b / (2c) * tanh(c / 2). The mean is therefore exact for every (b, c); the
variance is short by the tail variance, which decays like sum_{k>K} k^-4 —
~1e-4 relative at the default K = num_terms = 16 (KS-validated against an
exact Devroye sampler in tests/pg_exact.py), < 3e-7 at K=64 for callers
that want the slack below f32 noise. This family of truncation samplers
has data-independent shapes and one batched Gamma draw — exactly what the
TPU wants — unlike Devroye's rejection sampler with data-dependent loop
lengths.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["polya_gamma", "pg_mean", "pg_var"]

_TWO_PI_SQ = 2.0 * jnp.pi**2


def _tanh_half_over(c):
    """tanh(c/2) / c with the c -> 0 limit (= 1/2) handled.

    The series branch is wide (|c/2| < 0.05): TPU transcendentals carry a
    few hundred ulp of error, so a tight cutoff leaves a band where the
    direct ratio is much less accurate than the series.
    """
    x = 0.5 * c
    x2 = x * x
    small = jnp.abs(x) < 0.05
    safe = jnp.where(small, 1.0, x)
    ratio = jnp.where(small, 1.0 - x2 / 3.0 + 2.0 * x2 * x2 / 15.0,
                      jnp.tanh(safe) / safe)
    return 0.5 * ratio


def pg_mean(b, c):
    """E[PG(b, c)] = b / (2 c) tanh(c / 2), with the c->0 limit b/4."""
    return 0.5 * b * _tanh_half_over(c)


def pg_var(b, c):
    """Var[PG(b, c)] = b / (4 c^3) (sinh(c) - c) sech^2(c / 2).

    sinh(c) - c cancels catastrophically for small |c| — in f32 the naive
    form loses ALL significant bits below |c| ~ 0.01 and on TPU (whose
    transcendentals carry a few hundred ulp of error) it can even go
    NEGATIVE, which poisoned the Binomial/NegBinom normal-approximation
    branch with sqrt(<0) = NaN and silently froze whole chains behind the
    nan_guard. Use the series (sinh c - c)/c^3 = (1/6)(1 + c^2/20 +
    c^4/840 + ...) on a wide |c| < 0.5 window (truncation error < 3e-7
    relative there), and clamp the result nonnegative.
    """
    c = jnp.asarray(c, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    c2 = c * c
    small = jnp.abs(c) < 0.5
    safe = jnp.where(small, 1.0, c)
    series = (1.0 + c2 / 20.0 + c2 * c2 / 840.0) / 24.0
    direct = (jnp.sinh(safe) - safe) / (4.0 * safe**3)
    v = jnp.where(small, series, direct) / jnp.cosh(c / 2.0) ** 2
    return jnp.maximum(b * v, 0.0)


def polya_gamma(key, b, c, num_terms: int = 16, use_mt: bool = True,
                normal_approx_above: float = 50.0):
    """Draw omega ~ PG(b, c), elementwise over broadcast(b, c).

    b may be any nonnegative real (b = 0 returns exactly 0, used for
    missing cells); c any real. Replaces `PyPolyaGamma.pgdrawv`
    (factor.py:458-460).

    num_terms=16 with the tail-mean correction leaves a relative variance
    deficit of ~1e-4 (the discarded terms' variance decays as k^-4) —
    far below MC noise. use_mt selects the fixed-round Marsaglia-Tsang
    gamma sampler (ops/gamma.py), much faster on TPU than
    jax.random.gamma's all-lanes-until-converged while_loop.

    Cells with b >= `normal_approx_above` use the moment-matched normal
    approximation instead (PG(b, c) is a sum of b PG(1, c) variables, so it
    is asymptotically normal with relative skew O(b^-1/2); the native
    pypolyagamma makes the same switch for large b). Set it to jnp.inf to
    force the gamma-sum everywhere.
    """
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    shape = jnp.broadcast_shapes(b.shape, c.shape)
    dtype = jnp.result_type(b, c, jnp.float32)
    b = jnp.broadcast_to(b, shape).astype(dtype)
    c = jnp.broadcast_to(c, shape).astype(dtype)

    pos = b > 0
    big = b >= normal_approx_above
    b_safe = jnp.where(pos & ~big, b, 1.0)  # skip gamma work for big-b lanes

    ks = (jnp.arange(num_terms, dtype=dtype) + 0.5) ** 2  # (K,)
    denom = ks.reshape((num_terms,) + (1,) * len(shape)) + (c / (2.0 * jnp.pi)) ** 2

    k_g, k_n = jax.random.split(key)
    if use_mt:
        from functionalmf_tpu.ops.gamma import gamma_mt
        g = gamma_mt(k_g, b_safe, shape=(num_terms,) + shape, dtype=dtype)
    else:
        g = jax.random.gamma(k_g, b_safe, shape=(num_terms,) + shape, dtype=dtype)
    trunc = jnp.sum(g / denom, axis=0) / _TWO_PI_SQ

    mean_full = pg_mean(b, c).astype(dtype)
    mean_trunc = b_safe * jnp.sum(1.0 / denom, axis=0) / _TWO_PI_SQ
    tail = jnp.maximum(mean_full - mean_trunc, 0.0)
    gamma_draw = trunc + tail

    z = jax.random.normal(k_n, shape, dtype)
    normal_draw = jnp.maximum(
        mean_full + z * jnp.sqrt(pg_var(b, c).astype(dtype)), 1e-12)

    return jnp.where(pos, jnp.where(big, normal_draw, gamma_draw), 0.0)
