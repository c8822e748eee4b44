"""Fixed-round Marsaglia-Tsang gamma sampler moment tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from functionalmf_tpu.ops.gamma import gamma_mt


@pytest.mark.parametrize("a", [0.3, 0.9, 1.0, 2.5, 30.0, 300.0])
def test_gamma_mt_moments(key, a):
    n = 50000
    draws = np.asarray(gamma_mt(key, jnp.full((n,), a)))
    assert np.all(draws > 0)
    # Gamma(a,1): mean a, var a
    assert abs(draws.mean() - a) < 6 * np.sqrt(a / n) + 1e-3
    assert abs(draws.var() - a) < 0.05 * a + 6 * a * np.sqrt(3.0 / n)


def test_gamma_mt_mixed_shapes(key):
    a = jnp.asarray([[0.5, 5.0], [50.0, 1.0]])
    out = gamma_mt(key, a, shape=(3, 2, 2))
    assert out.shape == (3, 2, 2)
    assert bool(jnp.all(out > 0))


def test_gamma_mt_zero(key):
    out = gamma_mt(key, jnp.asarray([0.0, 1.0]))
    assert float(out[0]) == 0.0
