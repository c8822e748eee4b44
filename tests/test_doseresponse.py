"""Dose-response application pipeline tests (reference doseresponse/)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from functionalmf_tpu.apps.doseresponse.empirical_bayes import (
    GammaGridLikelihood, estimate_likelihood, poisson_glm_fit)
from functionalmf_tpu.apps.doseresponse.sim import simulate, write_csv


def test_gamma_grid_likelihood_matches_scipy():
    from scipy.stats import gamma
    from scipy.special import logsumexp
    mean_grid = np.array([0.8, 1.0, 1.2])
    probs = np.array([0.25, 0.5, 0.25])
    var = 0.05
    lik = GammaGridLikelihood(mean_grid, probs, var)

    y = np.array([[0.9, 1.1, np.nan], [0.5, 0.6, 0.7]])  # (T=2, R=3)
    effect = np.array([1.0, 0.6])

    ours = np.asarray(lik.logpdf(jnp.asarray(y), jnp.asarray(effect)))

    shapes = mean_grid**2 / var
    scales = var / mean_grid
    ref = np.zeros(2)
    for t in range(2):
        comp = np.zeros(3)
        for g in range(3):
            comp[g] = np.nansum(gamma.logpdf(y[t], shapes[g],
                                             scale=scales[g] * effect[t]))
        ref[t] = logsumexp(comp, b=probs)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_gamma_grid_sample(rng):
    lik = GammaGridLikelihood(np.array([1.0]), np.array([1.0]), 0.01)
    draws = lik.sample(np.ones(5000), size=5000, rng=rng)
    np.testing.assert_allclose(draws.mean(), 1.0, rtol=0.05)


def test_poisson_glm_fit():
    rng = np.random.default_rng(0)
    x = np.arange(25)
    mu = np.exp(1.0 + 0.2 * x - 0.01 * x**2)
    counts = rng.poisson(mu)
    fitted = poisson_glm_fit(counts)
    # fitted curve should track the truth reasonably
    assert np.corrcoef(fitted, mu)[0, 1] > 0.95


def test_sim_and_estimate_likelihood(tmp_path):
    sim = simulate(k=2, n=5, m=4, t=5, r=3, p=6, n_missing=1, p_missing=1, seed=0)
    write_csv(sim, str(tmp_path))
    assert os.path.exists(tmp_path / "data.csv")
    import pandas as pd
    df = pd.read_csv(tmp_path / "data.csv", header=0)
    Y, lik, cells, drugs, concs, controls = estimate_likelihood(
        df, nbins=10, tensor_outcomes=True, verbose=False)
    assert Y.shape == (4, 4, 5, 3)  # n - n_missing cells, m drugs, t concs
    assert len(concs) == 5
    # likelihood evaluates finitely on the data
    ll = np.asarray(lik.logpdf(jnp.asarray(Y[0, 0][None]), jnp.ones((1,)) * 0.9))
    assert np.all(np.isfinite(ll))


@pytest.mark.slow
def test_fit_pipeline_end_to_end(tmp_path):
    """Miniature end-to-end run of the fit CLI (reference fit.py:214-439)."""
    from functionalmf_tpu.apps.doseresponse import fit as fit_mod
    sim = simulate(k=2, n=5, m=4, t=5, r=3, p=6, n_missing=1, p_missing=1, seed=0)
    write_csv(sim, str(tmp_path))
    out = tmp_path / "out"
    fit_mod.main([
        "--data", str(tmp_path / "data.csv"),
        "--outdir", str(out),
        "--nembeds", "2", "--nburn", "40", "--nsamples", "40",
        "--nholdout", "2", "--seed", "0", "--nbins", "10",
    ])
    Mu_hat = np.load(out / "btf.npy")
    assert Mu_hat.shape[0] == 40
    assert np.isfinite(Mu_hat).all()
    # [0,1] constraints respected by every posterior draw
    assert Mu_hat.min() >= -1e-4 and Mu_hat.max() <= 1 + 1e-4
    assert os.path.exists(out / "btf_mono.npy")


def _run_features_pipeline(tmp_path, extra_args=()):
    from functionalmf_tpu.apps.doseresponse import fit as fit_mod
    sim = simulate(k=2, n=5, m=4, t=5, r=3, p=6, n_missing=1, p_missing=1, seed=0)
    write_csv(sim, str(tmp_path))
    out = tmp_path / "out"
    fit_mod.main([
        "--data", str(tmp_path / "data.csv"),
        "--outdir", str(out),
        "--features", str(tmp_path / "features.csv"),
        "--sample_features",
        "--nembeds", "2", "--nburn", "10", "--nsamples", "10",
        "--seed", "0", "--nbins", "10", *extra_args,
    ])
    U = np.load(out / "btf_u.npy")
    assert U.shape[0] == 10
    assert np.isfinite(U).all()
    # U actually moved from its NMF init across samples
    assert not np.allclose(U[0], U[-1])
    return U


@pytest.mark.slow
def test_fit_pipeline_with_features_traced(tmp_path):
    """Row-feature path with the U step compiled into the Gibbs loop
    (run_gibbs traced_callback; reference semantics of fit.py:102-150
    with zero per-sweep host dispatch)."""
    _run_features_pipeline(tmp_path)


@pytest.mark.slow
def test_fit_pipeline_with_features_host_callback(tmp_path):
    """Same pipeline through the reference-contract host callback
    (one dispatch per sweep; kept for non-traceable user hooks)."""
    _run_features_pipeline(tmp_path, ("--host-callback",))
