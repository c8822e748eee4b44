"""Tests for the native PGDS baseline (models/pgds.py, ops/crt.py).

Reference behavior: functionalmf/pgds.py:19-75 (apf-backed wrapper);
model = Schein, Wallach & Zhou, NeurIPS 2016.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from functionalmf_tpu.ops.crt import (chinese_restaurant_table,
                                      multinomial_split)
from functionalmf_tpu.pgds import fit_pgds


def _crt_exact(rng, n, r, size):
    i = np.arange(1, n + 1)
    p = r / (r + i - 1)
    return (rng.random((size, n)) < p).sum(1)


@pytest.mark.parametrize("n,r", [
    (5, 1.0),          # all-exact branch
    (50, 3.0),         # all-exact branch
    (500, 2.0),        # Poisson tail (small r)
    (5000, 10.0),      # Poisson tail, long
    (300, 200.0),      # normal tail (large r)
    (2000, 500.0),     # normal tail, long
])
def test_crt_matches_exact_sampler(n, r):
    """Hybrid CRT vs brute-force Bernoulli sum: KS at alpha=1e-3."""
    rng = np.random.default_rng(0)
    S = 4000
    ours = np.asarray(chinese_restaurant_table(
        jax.random.PRNGKey(7), jnp.full((S,), float(n)), jnp.full((S,), r)))
    exact = _crt_exact(rng, n, r, S)
    # two-sample KS on the (discrete) table counts; the tail approximation
    # must be indistinguishable at this sample size
    ks = stats.ks_2samp(ours, exact)
    assert ks.pvalue > 1e-3, (n, r, ks)
    assert abs(ours.mean() - exact.mean()) < 4 * exact.std() / np.sqrt(S)


def test_crt_edge_cases():
    k = jax.random.PRNGKey(0)
    n = jnp.array([0.0, 1.0, 1.0, 10.0])
    r = jnp.array([5.0, 5.0, 1e-8, 0.0])
    out = np.asarray(chinese_restaurant_table(k, n, r))
    assert out[0] == 0.0          # no customers, no tables
    assert out[1] == 1.0          # first customer always opens a table
    assert out[2] == 1.0
    assert 0 <= out[3] <= 10


def test_multinomial_split_exactness():
    k = jax.random.PRNGKey(1)
    S = 5000
    n = jnp.full((S,), 50.0)
    p = jnp.tile(jnp.array([0.1, 0.2, 0.3, 0.4]), (S, 1))
    c = np.asarray(multinomial_split(k, n, p))
    assert (c.sum(-1) == 50).all()
    assert (c >= 0).all()
    # cell means within 4 sigma of Binomial(50, p_k)
    for j, pj in enumerate([0.1, 0.2, 0.3, 0.4]):
        se = np.sqrt(50 * pj * (1 - pj) / S)
        assert abs(c[:, j].mean() - 50 * pj) < 4 * se, j


def test_multinomial_split_zero_and_degenerate():
    k = jax.random.PRNGKey(2)
    c = np.asarray(multinomial_split(k, jnp.array([0.0, 7.0]),
                                     jnp.array([[0.5, 0.5], [1.0, 0.0]])))
    assert (c[0] == 0).all()
    assert c[1, 0] == 7 and c[1, 1] == 0


def test_pgds_schema_and_finiteness():
    """fit_pgds returns the reference wrapper's shapes and finite draws."""
    rng = np.random.default_rng(0)
    Y = rng.poisson(3.0, (5, 4, 12)).astype(float)
    Y[0, 0] = np.nan
    Mu, (W, V, U) = fit_pgds(Y, 2, nburn=30, nthin=1, nsamples=20, seed=0)
    assert Mu.shape == (20, 5, 4, 12)
    assert W.shape == (20, 5, 2) and V.shape == (20, 4, 2)
    assert U.shape == (20, 12, 2)
    assert np.isfinite(Mu).all() and (Mu >= 0).all()
    # Dirichlet factor columns sum to one
    assert np.allclose(W.sum(1), 1.0, atol=1e-4)
    assert np.allclose(V.sum(1), 1.0, atol=1e-4)


def test_pgds_recovers_rates():
    """Posterior mean tracks the true rate on model-generated data."""
    rng = np.random.default_rng(3)
    N, M, T, K = 8, 7, 20, 2
    A = rng.dirichlet(np.ones(N) * 2, size=K).T
    B = rng.dirichlet(np.ones(M) * 2, size=K).T
    U = np.abs(np.cumsum(rng.normal(0, 1, (T, K)), axis=0)) + 5
    Mu = np.einsum("ik,jk,tk->ijt", A, B, U) * 8
    Y = rng.poisson(Mu).astype(float)
    Mud, _ = fit_pgds(Y, 3, nburn=400, nthin=1, nsamples=200, seed=0)
    rel = np.sqrt(np.mean((Mud.mean(0) - Mu) ** 2)) / np.sqrt((Mu**2).mean())
    assert rel < 0.25, rel


@pytest.mark.slow
def test_pgds_calibration_on_generative_truth():
    """Coverage of the true rate is nominal when the truth is drawn from
    the PGDS generative model itself (cells with non-negligible truth;
    near-zero cells make percentile coverage meaningless)."""
    K, N, M, T = 3, 10, 9, 25
    covs = {50: [], 90: []}
    for seed in range(2):
        rng = np.random.default_rng(seed)
        nu = rng.gamma(10 / K, 1.0, K)
        Pi = np.stack([rng.dirichlet(nu * nu[k]) for k in range(K)], axis=1)
        th = np.zeros((T, K))
        th[0] = rng.gamma(nu, 1.0)
        for t in range(1, T):
            th[t] = rng.gamma(Pi @ th[t - 1] + 1e-9, 1.0)
        A = rng.dirichlet(np.full(N, 0.1), size=K).T
        B = rng.dirichlet(np.full(M, 0.1), size=K).T
        Mu = 40.0 * np.einsum("ik,jk,tk->ijt", A, B, th)
        Y = rng.poisson(Mu).astype(float)
        Mud, _ = fit_pgds(Y, K, gam=10, tau=1.0, nburn=1000, nthin=2,
                          nsamples=400, seed=seed + 100, stationary=True)
        sel = Mu > 0.5
        for lvl in (50, 90):
            lo, hi = np.percentile(Mud, [50 - lvl / 2, 50 + lvl / 2], axis=0)
            covs[lvl].append((((Mu >= lo) & (Mu <= hi))[sel]).mean() * 100)
    assert abs(np.mean(covs[50]) - 50) < 10, covs
    assert abs(np.mean(covs[90]) - 90) < 7, covs


def test_pgds_binary_mode():
    rng = np.random.default_rng(5)
    P = rng.uniform(0.05, 0.9, (6, 5, 10))
    Y = (rng.random(P.shape) < P).astype(float)
    Mu, _ = fit_pgds(Y, 2, binary=True, nburn=50, nthin=1, nsamples=30,
                     seed=1)
    assert np.isfinite(Mu).all() and (Mu >= 0).all()
