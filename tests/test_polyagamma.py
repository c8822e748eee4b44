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


def test_pg_jit_vmap(key):
    f = jax.jit(lambda k, b, c: polya_gamma(k, b, c))
    out = f(key, jnp.ones((4, 5)), jnp.zeros((4, 5)))
    assert out.shape == (4, 5)
    assert bool(jnp.all(jnp.isfinite(out)))
