"""End-to-end recovery tests for the PG-augmented models, mirroring
examples/binomial_tensor_filtering.py and examples/negbinom_tensor_filtering.py
at reduced scale."""
import pytest
import numpy as np

from functionalmf_tpu import (
    BinomialBayesianTensorFiltering,
    NegativeBinomialBayesianTensorFiltering,
)


def ilogit(x):
    return 1.0 / (1.0 + np.exp(-x))


def _truth(rng, nrows, ncols, ndepth, nembeds, scale=1.0):
    W = rng.normal(size=(nrows, nembeds))
    W[np.triu_indices(nembeds, k=1)] = 0
    V = rng.normal(size=(ncols, ndepth, nembeds)) * scale
    return W, V, np.einsum("nk,mtk->nmt", W, V)


@pytest.mark.slow
def test_binomial_recovery(rng):
    nrows, ncols, ndepth, nembeds, nrep = 8, 6, 10, 2, 20
    W, V, Mu = _truth(rng, nrows, ncols, ndepth, nembeds)
    N = np.full((nrows, ncols, ndepth), float(nrep))
    Y = rng.binomial(nrep, ilogit(Mu)).astype(float)
    Ym = Y.copy()
    Ym[:2, :2] = np.nan
    Nm = N.copy()
    Nm[np.isnan(Ym)] = np.nan

    model = BinomialBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=nembeds, sigma2_init=0.5,
        lam2_init=0.1, seed=0)
    res = model.run_gibbs((Ym, Nm), nburn=500, nthin=1, nsamples=500, verbose=False)

    P_hat = ilogit(np.clip(np.einsum("znk,zmtk->znmt", res["W"], res["V"]), -10, 10)).mean(0)
    P_true = ilogit(Mu)
    fit_mae = np.mean(np.abs(P_hat[2:, 2:] - P_true[2:, 2:]))
    ho_mae = np.mean(np.abs(P_hat[:2, :2] - P_true[:2, :2]))
    assert fit_mae < 0.08, fit_mae
    assert ho_mae < 0.25, ho_mae
    # nu2 is the PG latent tensor now
    assert res["nu2"].shape == (500, nrows, ncols, ndepth)


@pytest.mark.slow
def test_negbinom_recovery(rng):
    nrows, ncols, ndepth, nembeds, nrep = 8, 6, 8, 2, 4
    # gamma-Poisson truth with logit link on P (negbinom example:44-64)
    W = rng.gamma(1, 1, size=(nrows, nembeds))
    W[np.triu_indices(nembeds, k=1)] = 0
    V = np.zeros((ncols, ndepth, nembeds))
    for j in range(ncols):
        V[j, -1] = rng.gamma(1, 1, size=nembeds)
        for k in range(ndepth - 2, -1, -1):
            V[j, k] = V[j, k + 1] + (rng.gamma(1, 1, size=nembeds)
                                     if rng.random() < 0.2 else 0)
    Mu = np.einsum("nk,mtk->nmt", W, V)
    Var = rng.gamma(1, 1, size=(nrows, 1, 1)) * Mu**2 + Mu
    P = 1 - Mu / Var
    R = Mu * (1 - P) / np.clip(P, 1e-6, 1)
    Y = rng.poisson(rng.gamma(np.maximum(R[..., None], 1e-3),
                              (P / (1 - P))[..., None],
                              size=(nrows, ncols, ndepth, nrep))).astype(float)
    Ym = Y.copy()
    Ym[:2, :2] = np.nan

    model = NegativeBinomialBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=nembeds, tf_order=0,
        sigma2_init=1.0, lam2_init=0.1, rdims=(1, 2), seed=0)
    res = model.run_gibbs(Ym, nburn=400, nthin=1, nsamples=300, verbose=False)

    assert res["R"].shape == (300, nrows, 1, 1)
    Ps = ilogit(np.clip(np.einsum("znk,zmtk->znmt", res["W"], res["V"]), -10, 10))
    Mu_hat = (res["R"] * Ps / (1 - Ps)).mean(0)
    # fitted-region correlation with the truth should be strong
    corr = np.corrcoef(Mu_hat[2:, 2:].ravel(), Mu[2:, 2:].ravel())[0, 1]
    assert corr > 0.7, corr
    assert np.all(np.asarray(res["R"]) > 1.0)  # r_min gate preserved


@pytest.mark.slow
def test_negbinom_r_fixed(rng):
    Y = rng.poisson(3.0, size=(4, 3, 5)).astype(float)
    R_true = np.full((1, 1, 1), 2.5)
    model = NegativeBinomialBayesianTensorFiltering(
        4, 3, 5, nembeds=2, R_true=R_true, seed=0)
    res = model.run_gibbs(Y, nburn=10, nthin=1, nsamples=5, verbose=False)
    assert np.allclose(res["R"], 2.5)
