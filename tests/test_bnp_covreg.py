"""BNP-CovReg baseline (apps/flutrends/bnp_covreg.py) vs dense math.

The sampler replaces the MATLAB information form chol(invK + diag(A))
(reference flutrends/BNP_covreg_varinds.m:341-346) with the pathwise
(Matheron) rule through B = S K S + I. These tests pin that equivalence
algebraically and check end-to-end mean recovery.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from functionalmf_tpu.apps.flutrends.bnp_covreg import (
    fit_bnp_covreg, se_kernel, _sample_gp_conditional)


def test_matheron_matches_information_form(rng):
    """Mean/cov of the pathwise draw equal (invK + diag(A))^{-1} applied
    to the information vector — computed densely in float64."""
    N = 40
    K = se_kernel(N, c=100.0, d=1.0, r=1e-5)
    A = np.abs(rng.normal(size=N)) * (rng.random(N) > 0.2)  # some zeros
    h = rng.normal(size=N) * (A > 0)

    invK = np.linalg.inv(K)
    Sig = np.linalg.inv(invK + np.diag(A))
    mean_dense = Sig @ h

    # the draw is f0 + K S B^{-1} (h/S - S f0 - z): a linear map of
    # (f0, z); its mean and covariance are closed-form
    S = np.sqrt(A)
    B = S[:, None] * K * S[None, :] + np.eye(N)
    Binv = np.linalg.inv(B)
    hS = np.where(A > 0, h / np.maximum(S, 1e-300), 0.0)
    mean_path = K @ (S * (Binv @ hS))
    C1 = np.eye(N) - K @ (S[:, None] * Binv * S[None, :])
    C2 = K @ (S[:, None] * Binv)
    cov_path = C1 @ K @ C1.T + C2 @ C2.T

    np.testing.assert_allclose(mean_path, mean_dense, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(cov_path, Sig, rtol=1e-7, atol=1e-9)


def test_gp_conditional_sample_moments(rng):
    """The float32 jax draw matches the dense posterior moments by MC."""
    N = 25
    K = se_kernel(N, c=30.0, d=1.0, r=1e-4)
    A = np.abs(rng.normal(size=N)) + 0.5
    h = rng.normal(size=N)
    Sig = np.linalg.inv(np.linalg.inv(K) + np.diag(A))
    mean_dense = Sig @ h

    Kd, Ad, hd = (jnp.asarray(x, jnp.float32) for x in (K, A, h))
    cholKd = jnp.asarray(np.linalg.cholesky(K), jnp.float32)
    draws = jax.vmap(
        lambda k: _sample_gp_conditional(k, Ad, hd, Kd, cholKd))(
            jax.random.split(jax.random.PRNGKey(0), 4000))
    draws = np.asarray(draws, np.float64)
    se = np.sqrt(np.diag(Sig) / draws.shape[0])
    assert np.all(np.abs(draws.mean(0) - mean_dense) < 5 * se + 1e-4)
    np.testing.assert_allclose(draws.var(0), np.diag(Sig),
                               rtol=0.25, atol=1e-5)


@pytest.mark.slow
def test_bnp_covreg_recovers_mean(rng):
    """End-to-end: smooth low-rank mean with missing blocks is recovered
    well below the observation noise level."""
    p, N = 8, 60
    x = np.linspace(0, 1, N)
    basis = np.stack([np.sin(2 * np.pi * x), np.cos(3 * np.pi * x)])
    loadings = rng.normal(size=(p, 2))
    mu_true = loadings @ basis                       # (p, N)
    sd = 0.3
    y = mu_true + rng.normal(0, sd, size=(p, N))
    inds = np.ones((p, N), bool)
    inds[0, 10:25] = False                           # held-out block
    inds[3, 40:55] = False
    y_obs = np.where(inds, y, np.nan)

    out = fit_bnp_covreg(y_obs, L=4, k=4, niter=600, store_every=10,
                         nburn=200, c=30.0, seed=1, chunk=50)
    mu_mean = out["mu"].mean(axis=0)
    err_obs = np.sqrt(np.mean((mu_mean - mu_true)[inds] ** 2))
    err_miss = np.sqrt(np.mean((mu_mean - mu_true)[~inds] ** 2))
    assert err_obs < 0.5 * sd, err_obs
    assert err_miss < 2.0 * sd, err_miss
    # predictive variance should be on the order of the noise variance
    med_var = np.median(out["var_diag"].mean(axis=0))
    assert 0.25 * sd ** 2 < med_var < 10 * sd ** 2, med_var
