"""Gaussian BTF correctness tests.

Sharp conditional checks: with everything but one block fixed at the truth,
the Gibbs draws for that block are exact conjugate posteriors with closed
forms (factor.py:313-409), so posterior means must match to MC error.
Plus an end-to-end recovery smoke test mirroring
examples/gaussian_tensor_filtering.py.
"""
import numpy as np
import pytest

from functionalmf_tpu import GaussianBayesianTensorFiltering


def _make_data(rng, nrows=6, ncols=5, ndepth=8, nembeds=2, nu2=0.25, nrep=2):
    W = rng.normal(size=(nrows, nembeds))
    W[np.triu_indices(nembeds, k=1)] = 0
    V = rng.normal(size=(ncols, ndepth, nembeds))
    Mu = np.einsum("nk,mtk->nmt", W, V)
    Y = rng.normal(Mu[..., None], np.sqrt(nu2), size=(nrows, ncols, ndepth, nrep))
    return W, V, Mu, Y


def test_w_conditional_posterior_mean(rng):
    nrows, ncols, ndepth, nembeds, nu2 = 6, 5, 8, 2, 0.25
    W, V, Mu, Y = _make_data(rng, nrows, ncols, ndepth, nembeds, nu2)
    Y[0, :2] = np.nan  # missing block
    sigma2 = 0.7

    model = GaussianBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=nembeds,
        V_true=V, Tau2_true=np.ones((ncols, model_nd(ndepth))), lam2_true=1.0,
        sigma2_true=sigma2, nu2_true=nu2, seed=3)
    res = model.run_gibbs(Y, nburn=50, nthin=1, nsamples=3000, verbose=False)
    Ws = res["W"]

    # closed-form ridge posterior per row (factor.py:349-362)
    obs = ~np.isnan(Y)
    counts = obs.sum(-1)
    ymean = np.where(counts > 0, np.nansum(np.nan_to_num(Y), -1) / np.maximum(counts, 1), 0)
    for i in range(nrows):
        nd = min(i + 1, nembeds)
        Vf = V.reshape(-1, nembeds)[:, :nd]
        w8 = (counts[i] / nu2).reshape(-1)
        Q = (Vf * w8[:, None]).T @ Vf + np.eye(nd) / sigma2
        mu = np.linalg.solve(Q, Vf.T @ (w8 * ymean[i].reshape(-1)))
        se = np.sqrt(np.diag(np.linalg.inv(Q)) / Ws.shape[0]) * 6 + 1e-3
        np.testing.assert_array_less(np.abs(Ws[:, i, :nd].mean(0) - mu), se)
        # masked entries exactly zero
        assert np.all(Ws[:, i, nd:] == 0)


def model_nd(ndepth, tf_order=2):
    from functionalmf_tpu.ops.penalty import num_penalty_rows
    return num_penalty_rows(ndepth, tf_order)


def test_v_conditional_posterior_mean(rng):
    nrows, ncols, ndepth, nembeds, nu2 = 6, 4, 6, 2, 0.25
    W, V, Mu, Y = _make_data(rng, nrows, ncols, ndepth, nembeds, nu2)
    Y[1, 0] = np.nan
    nD = model_nd(ndepth)
    Tau2 = np.ones((ncols, nD))
    lam2 = 0.5

    model = GaussianBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=nembeds,
        W_true=W, Tau2_true=Tau2, lam2_true=lam2,
        sigma2_true=1.0, nu2_true=nu2, seed=4)
    res = model.run_gibbs(Y, nburn=50, nthin=1, nsamples=3000, verbose=False)
    Vs = res["V"]

    # closed-form GLS posterior per column (factor.py:394-409)
    from functionalmf_tpu.ops.penalty import bayes_grid_penalty
    Delta = bayes_grid_penalty(ndepth, 2)
    obs = ~np.isnan(Y)
    counts = obs.sum(-1)
    ymean = np.where(counts > 0, np.nansum(np.nan_to_num(Y), -1) / np.maximum(counts, 1), 0)
    I_T = np.eye(ndepth)
    X = np.kron(W, I_T)  # (n*T, k*T) embed-major columns
    for j in range(ncols):
        w8 = (counts[:, j] / nu2).reshape(-1)
        Q_lik = (X * w8[:, None]).T @ X
        DtLD = Delta.T @ np.diag(1.0 / (lam2 * Tau2[j])) @ Delta
        Q = Q_lik + np.kron(np.eye(nembeds), DtLD)
        mu = np.linalg.solve(Q, X.T @ (w8 * ymean[:, j].reshape(-1)))
        mu_V = mu.reshape(nembeds, ndepth).T
        sd = np.sqrt(np.diag(np.linalg.inv(Q))).reshape(nembeds, ndepth).T
        se = sd / np.sqrt(Vs.shape[0]) * 6 + 2e-3
        np.testing.assert_array_less(np.abs(Vs[:, j].mean(0) - mu_V), se)


@pytest.mark.slow
def test_end_to_end_recovery(rng):
    nrows, ncols, ndepth, nembeds, nu2 = 8, 6, 10, 2, 0.5
    W, V, Mu, Y = _make_data(rng, nrows, ncols, ndepth, nembeds, nu2, nrep=3)
    Ym = Y.copy()
    Ym[:2, :2] = np.nan  # hold out a block

    model = GaussianBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=nembeds, sigma2_init=0.5,
        lam2_init=0.1, nu2_init=1.0, seed=0)
    res = model.run_gibbs(Ym, nburn=400, nthin=1, nsamples=400, verbose=False)

    Mu_hat = np.einsum("znk,zmtk->znmt", res["W"], res["V"]).mean(0)
    # fitted cells should be close; held-out block should still track truth
    fit_rmse = np.sqrt(np.mean((Mu_hat[2:, 2:] - Mu[2:, 2:]) ** 2))
    hold_rmse = np.sqrt(np.mean((Mu_hat[:2, :2] - Mu[:2, :2]) ** 2))
    base = np.sqrt(np.mean(Mu**2))
    assert fit_rmse < 0.35 * base, (fit_rmse, base)
    assert hold_rmse < 0.9 * base, (hold_rmse, base)
    # noise variance recovered
    nu2_hat = res["nu2"].mean()
    assert 0.5 * nu2 < nu2_hat < 2.0 * nu2

    # results dict matches the reference's key set and shapes
    assert res["W"].shape == (400, nrows, nembeds)
    assert res["V"].shape == (400, ncols, ndepth, nembeds)
    assert res["lam2"].shape == (400, 1)
    assert res["sigma2"].shape == (400, 1)
    assert res["Tau2"].shape[1:] == (ncols, model_nd(ndepth))


@pytest.mark.slow
def test_heteroskedastic_nu2(rng):
    """Fixed per-cell observation variances (factor.py:343-346, 388-391):
    high-noise cells should shrink harder toward the prior."""
    nrows, ncols, ndepth, nembeds = 5, 4, 6, 2
    W, V, Mu, Y = _make_data(rng, nrows, ncols, ndepth, nembeds, nu2=1.0)
    nu2 = np.full((nrows, ncols, ndepth), 0.25)
    nu2[0] = 100.0  # row 0 nearly uninformative
    model = GaussianBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=nembeds, nu2_true=nu2,
        sigma2_true=1.0, lam2_true=1.0,
        Tau2_true=np.ones((ncols, model_nd(ndepth))), seed=0)
    res = model.run_gibbs(Y, nburn=100, nthin=1, nsamples=300, verbose=False)
    assert np.isfinite(res["W"]).all()
    # noisy row's posterior sd close to the prior sd (= 1); informative rows
    # much tighter
    sd_noisy = res["W"][:, 0, 0].std()
    sd_info = res["W"][:, 4, 0].std()
    assert sd_noisy > 3 * sd_info, (sd_noisy, sd_info)
    # sampling with an array init is rejected (reference silently replaces
    # the array with a scalar draw)
    import pytest
    with pytest.raises(AssertionError):
        GaussianBayesianTensorFiltering(nrows, ncols, ndepth, nembeds=2,
                                        nu2_init=nu2, seed=0)


@pytest.mark.slow
def test_multichain_shapes(rng):
    _, _, _, Y = _make_data(rng, 4, 3, 5, 2)
    model = GaussianBayesianTensorFiltering(4, 3, 5, nembeds=2, nchains=3, seed=1)
    res = model.run_gibbs(Y, nburn=10, nthin=1, nsamples=5, verbose=False)
    assert res["W"].shape == (15, 4, 2)
    assert res["sigma2"].shape == (15, 1)
    # chains differ (independent inits / keys)
    assert not np.allclose(res["W"][0], res["W"][5])


@pytest.mark.slow
def test_callback_path(rng):
    _, _, _, Y = _make_data(rng, 4, 3, 5, 2)
    model = GaussianBayesianTensorFiltering(4, 3, 5, nembeds=2, seed=1)
    steps = []
    res = model.run_gibbs(Y, nburn=4, nthin=2, nsamples=3, verbose=False,
                          callback=lambda m, d, s: steps.append(s))
    assert steps == list(range(4 + 2 * 3))
    assert res["W"].shape == (3, 4, 2)


@pytest.mark.slow
def test_nu2_row_mode_recovery(rng):
    """nu2_mode='row' (framework extension): per-row observation variances
    are recovered; scalar mode is the reference-parity default."""
    nrows, ncols, ndepth, k = 8, 6, 10, 2
    W = rng.normal(size=(nrows, k)); W[np.triu_indices(k, 1)] = 0
    V = rng.normal(size=(ncols, ndepth, k))
    Mu = np.einsum("nk,mtk->nmt", W, V)
    nu2_true = np.linspace(0.05, 2.0, nrows)
    Y = Mu + rng.normal(0, np.sqrt(nu2_true)[:, None, None], size=Mu.shape)

    model = GaussianBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=k, tf_order=1, seed=0, nu2_mode="row",
        W_true=W, V_true=V)
    res = model.run_gibbs(Y, nburn=200, nthin=1, nsamples=400, verbose=False)
    assert res["nu2"].shape == (400, nrows, 1, 1)
    nu2_hat = res["nu2"].mean(0)[:, 0, 0]
    # with W,V fixed at truth the per-row IG posterior concentrates around
    # the per-row truth (60 obs per row)
    rel = np.abs(nu2_hat - nu2_true) / nu2_true
    assert np.all(rel < 0.6), (nu2_hat, nu2_true)
    # rows must differ (a shared scalar could not satisfy both ends)
    assert nu2_hat[-1] > 4 * nu2_hat[0]
