"""Polya-Gamma sampler moment identities (SURVEY.md §4: E[w] = b/(2c) tanh(c/2))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from functionalmf_tpu.ops.polyagamma import pg_mean, pg_var, polya_gamma


@pytest.mark.parametrize("b,c", [(1.0, 0.5), (1.0, 2.0), (3.0, 1.0),
                                 (50.0, 0.1), (200.0, 3.0)])
def test_pg_moments(key, b, c):
    n = 8000
    draws = polya_gamma(key, jnp.full((n,), b), jnp.full((n,), c))
    draws = np.asarray(draws)
    m_true = float(pg_mean(b, c))
    v_true = float(pg_var(b, c))
    assert abs(draws.mean() - m_true) < 5 * np.sqrt(v_true / n) + 1e-4
    # variance: truncation loses a tiny tail; allow 3% + MC error
    assert abs(draws.var() - v_true) < 0.03 * v_true + 6 * v_true * np.sqrt(2.0 / n)


def test_pg_zero_b(key):
    out = polya_gamma(key, jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 1.0]))
    assert float(out[0]) == 0.0
    assert float(out[1]) > 0.0


def test_pg_c_zero_limit(key):
    # PG(b, 0) has mean b/4
    draws = np.asarray(polya_gamma(key, jnp.full((20000,), 2.0), jnp.zeros(20000)))
    np.testing.assert_allclose(draws.mean(), 0.5, rtol=0.03)


def test_pg_symmetric_in_c(key):
    # PG(b, c) == PG(b, -c) in distribution
    d1 = np.asarray(polya_gamma(key, jnp.full((20000,), 1.0), jnp.full((20000,), 2.0)))
    d2 = np.asarray(polya_gamma(key, jnp.full((20000,), 1.0), jnp.full((20000,), -2.0)))
    assert abs(d1.mean() - d2.mean()) < 0.01


def test_pg_var_small_c_f32():
    """Regression: pg_var must stay accurate (and nonnegative) through the
    sinh(c) - c cancellation zone in f32. The naive form lost all bits
    below |c| ~ 0.01 and went *negative* on TPU, NaN-ing the large-b
    normal-approximation draw and silently freezing Binomial/NegBinom
    chains behind the nan_guard (round-2 diagnosis of VERDICT item 10)."""
    cs = np.concatenate([np.logspace(-6, 1, 200), -np.logspace(-6, 1, 200),
                         [0.0]])
    got = np.asarray(pg_var(1.0, jnp.asarray(cs, jnp.float32)))
    # f64 reference via the numerically safe mpmath-free route: series for
    # small |c|, naive form elsewhere (safe in f64 down to ~1e-4)
    c = cs.astype(np.float64)
    safe = np.where(np.abs(c) < 1e-3, 1.0, c)
    ref = np.where(np.abs(c) < 1e-3,
                   (1.0 + c**2 / 20.0) / 24.0,
                   (np.sinh(safe) - safe) / (4.0 * safe**3))
    ref = ref / np.cosh(c / 2.0) ** 2
    assert np.all(got >= 0.0)
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_pg_large_b_small_c_finite(key):
    """The exact (b, c) regime that froze NB chains: b > 50 (normal branch)
    with |c| in the old cancellation band."""
    b = jnp.full((1000,), 50.6)
    c = jnp.full((1000,), -0.0117)
    draws = polya_gamma(key, b, c)
    assert bool(jnp.all(jnp.isfinite(draws)))
    m = float(pg_mean(50.6, -0.0117))
    assert abs(float(draws.mean()) - m) < 0.05 * m


def test_pg_jit_vmap(key):
    f = jax.jit(lambda k, b, c: polya_gamma(k, b, c))
    out = f(key, jnp.ones((4, 5)), jnp.zeros((4, 5)))
    assert out.shape == (4, 5)
    assert bool(jnp.all(jnp.isfinite(out)))
