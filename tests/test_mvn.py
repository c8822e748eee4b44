"""Moment tests for the batched MVN samplers against closed forms
(replacing the reference's visual fast_mvn.py:182-267 self-test)."""
import jax
import jax.numpy as jnp
import numpy as np

from functionalmf_tpu.ops.mvn import (
    cholesky_psd,
    sample_mvn,
    sample_mvn_from_covariance,
    sample_mvn_from_precision,
)

Q = np.array([[1.0, 0.4], [0.4, 1.0]])
Q_inv = np.linalg.inv(Q)


def _moments(samples):
    return samples.mean(axis=0), np.cov(np.asarray(samples).T)


def _draws(fn, key, n=20000):
    keys = jax.random.split(key, n)
    return np.asarray(jax.vmap(fn)(keys))


def test_precision_no_mean(key):
    X = _draws(lambda k: sample_mvn_from_precision(k, jnp.asarray(Q)), key)
    m, C = _moments(X)
    np.testing.assert_allclose(m, 0, atol=0.05)
    np.testing.assert_allclose(C, Q_inv, atol=0.05)


def test_precision_mu_part(key):
    mu_part = jnp.asarray([1.0, -2.0])
    X = _draws(lambda k: sample_mvn_from_precision(k, jnp.asarray(Q), mu_part=mu_part), key)
    m, C = _moments(X)
    np.testing.assert_allclose(m, Q_inv @ np.asarray(mu_part), atol=0.05)
    np.testing.assert_allclose(C, Q_inv, atol=0.05)


def test_precision_equilibrated_matches(key):
    # badly scaled precision: equilibration must not change the distribution
    Qb = jnp.asarray([[1e5, 30.0], [30.0, 1e-2]])
    mu_part = jnp.asarray([2.0, 0.1])
    X = _draws(lambda k: sample_mvn_from_precision(k, Qb, mu_part=mu_part,
                                                   equilibrate=True), key)
    m, C = _moments(X)
    Qinv = np.linalg.inv(np.asarray(Qb, dtype=np.float64))
    np.testing.assert_allclose(m, Qinv @ np.asarray(mu_part), rtol=0.05, atol=1e-4)
    np.testing.assert_allclose(C, Qinv, rtol=0.08, atol=1e-5)


def test_covariance_paths(key):
    mu = jnp.asarray([0.5, -0.5])
    X = _draws(lambda k: sample_mvn_from_covariance(k, jnp.asarray(Q), mu=mu), key)
    m, C = _moments(X)
    np.testing.assert_allclose(m, mu, atol=0.05)
    np.testing.assert_allclose(C, Q, atol=0.05)

    # mu_part => mean is S @ mu_part (fast_mvn.py:111-114)
    mu_part = jnp.asarray([1.0, 1.0])
    X = _draws(lambda k: sample_mvn_from_covariance(k, jnp.asarray(Q), mu_part=mu_part), key)
    m, _ = _moments(X)
    np.testing.assert_allclose(m, Q @ np.asarray(mu_part), atol=0.05)


def test_chol_factor_paths(key):
    L = jnp.asarray(np.linalg.cholesky(Q))
    X = _draws(lambda k: sample_mvn_from_covariance(k, L, chol_factor=True), key)
    _, C = _moments(X)
    np.testing.assert_allclose(C, Q, atol=0.05)

    Lp = jnp.asarray(np.linalg.cholesky(Q_inv))
    X = _draws(lambda k: sample_mvn_from_precision(k, Lp, chol_factor=True), key)
    _, C = _moments(X)
    np.testing.assert_allclose(C, Q, atol=0.05)


def test_scalar_vector_promotion(key):
    # scalar covariance -> Q * I (fast_mvn.py:159-165)
    mu = jnp.asarray([0.5, -0.5])
    X = _draws(lambda k: sample_mvn(k, 0.4, mu=mu), key)
    _, C = _moments(X)
    np.testing.assert_allclose(C, 0.4 * np.eye(2), atol=0.05)


def test_force_psd_jitter(key):
    # singular matrix: jitter retries must yield finite samples
    S = jnp.asarray([[1.0, 1.0], [1.0, 1.0]])
    x = sample_mvn_from_precision(key, S, force_psd=True, force_psd_eps=0.1)
    assert np.all(np.isfinite(x))
    L = cholesky_psd(S, eps=0.1)
    assert np.all(np.isfinite(np.asarray(L)))


def test_batched(key):
    Qs = jnp.stack([jnp.asarray(Q), 4.0 * jnp.eye(2)])
    x = sample_mvn_from_precision(key, Qs)
    assert x.shape == (2, 2)
