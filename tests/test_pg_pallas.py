"""Pallas PG kernel tests (TPU-only; skipped on the CPU test mesh)."""
import jax
import numpy as np
import pytest

if jax.default_backend() == "cpu":
    pytest.skip("pg_pallas requires a TPU backend", allow_module_level=True)

import jax.numpy as jnp
from functionalmf_tpu.ops.pg_pallas import pg_pallas
from functionalmf_tpu.ops.polyagamma import pg_mean, pg_var


@pytest.mark.parametrize("b,c", [(1.0, 0.5), (3.0, 1.0), (0.5, 2.0)])
def test_pg_pallas_moments(b, c):
    key = jax.random.PRNGKey(0)
    n = 100000
    draws = np.asarray(pg_pallas(key, jnp.full((n,), b), jnp.full((n,), c)))
    m, v = float(pg_mean(b, c)), float(pg_var(b, c))
    assert abs(draws.mean() - m) < 6 * np.sqrt(v / n) + 1e-4
    assert abs(draws.var() - v) < 0.05 * v + 6 * v * np.sqrt(2.0 / n)


def test_pg_pallas_zero_and_shape():
    key = jax.random.PRNGKey(1)
    out = np.asarray(pg_pallas(key, jnp.asarray([[0.0, 2.0]] * 3),
                               jnp.ones((3, 2))))
    assert out.shape == (3, 2)
    assert np.all(out[:, 0] == 0) and np.all(out[:, 1] > 0)
