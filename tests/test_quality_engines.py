"""CPU anchor engines (bench/quality_cpu.py): PG sampler fidelity and
Binomial/NegBinom engine recovery. These engines are the reference-
algorithm side of the examples head-to-head (bench/examples_cpu.py)."""
import os
import sys

import numpy as np
import pytest
from scipy.stats import ks_2samp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "bench"))
sys.path.insert(0, os.path.dirname(__file__))

from quality_cpu import pg_draw_np, BinomialCPU, NegBinomCPU  # noqa: E402
from pg_exact import exact_pg  # noqa: E402

from functionalmf_tpu.utils import ilogit  # noqa: E402


def test_pg_draw_matches_exact_devroye(rng):
    n = 4000
    a = pg_draw_np(rng, np.full(n, 3.0), np.full(n, 1.3))
    b = exact_pg(rng, 3, 1.3, n)
    stat, p = ks_2samp(a, b)
    assert p > 1e-3, (stat, p)


def test_pg_draw_moments_fractional_b(rng):
    # E[PG(b,z)] = b tanh(z/2) / (2z) holds for non-integer b too
    n = 60000
    b, z = 2.7, 0.9
    d = pg_draw_np(rng, np.full(n, b), np.full(n, z))
    m = b * np.tanh(z / 2) / (2 * z)
    assert abs(d.mean() - m) < 4 * d.std() / np.sqrt(n) + 1e-4


def test_pg_draw_nan_propagates(rng):
    out = pg_draw_np(rng, np.array([np.nan, 2.0]), np.array([1.0, 1.0]))
    assert np.isnan(out[0]) and np.isfinite(out[1])


@pytest.mark.slow
def test_binomial_cpu_recovers_probability(rng):
    nrows, ncols, ndepth, k = 6, 5, 8, 2
    W = rng.normal(size=(nrows, k))
    W[np.triu_indices(k, 1)] = 0
    V = np.repeat(rng.normal(0, 0.8, size=(ncols, 1, k)), ndepth, axis=1)
    P = ilogit(np.einsum("nk,mtk->nmt", W, V))
    N = np.full(P.shape, 25.0)
    Y = rng.binomial(25, P).astype(float)
    model = BinomialCPU(Y, N, nembeds=k, tf_order=1, sigma2_init=0.5,
                        lam2_init=0.1, nu2_init=1.0, seed=0)
    res = model.run_gibbs(400, 1, 400)
    P_hat = ilogit(np.clip(
        np.einsum("znk,zmtk->znmt", res["W"], res["V"]), -10, 10)).mean(0)
    rmse = np.sqrt(np.mean((P_hat - P) ** 2))
    assert rmse < 0.08, rmse


@pytest.mark.slow
def test_negbinom_cpu_recovers_mean(rng):
    nrows, ncols, ndepth, k = 6, 5, 8, 2
    W = rng.gamma(1, 1, size=(nrows, k))
    W[np.triu_indices(k, 1)] = 0
    V = np.repeat(rng.gamma(1, 1, size=(ncols, 1, k)), ndepth, axis=1)
    Mu = np.einsum("nk,mtk->nmt", W, V)
    R = 5.0 * np.ones((nrows, 1, 1))
    Pnb = Mu / (Mu + R)
    Y = rng.negative_binomial(R, 1 - Pnb).astype(float)
    model = NegBinomCPU(Y, nembeds=k, tf_order=1, sigma2_init=0.5,
                        lam2_init=0.1, nu2_init=1.0, rdims=(1, 2), seed=0)
    res = model.run_gibbs(400, 1, 300)
    Ps = ilogit(np.clip(
        np.einsum("znk,zmtk->znmt", res["W"], res["V"]), -10, 10))
    Rs = res["R"].reshape(res["R"].shape[0], nrows, 1, 1)
    Mu_hat = (Rs * Ps / (1 - Ps)).mean(0)
    rel = np.abs(Mu_hat - Mu) / (Mu + 1)
    assert np.median(rel) < 0.35, np.median(rel)
