"""Flu-trends benchmark pieces (reference flutrends/benchmark.py)."""
import numpy as np

from functionalmf_tpu.apps.flutrends.benchmark import predictive_bands


def test_predictive_bands_are_per_cell(rng):
    """Regression for the round-3 band-pooling bug: each cell's band must
    be built ONLY from that cell's (draw, simulation) values. Cells are
    separated by ~1000 along the time axis, so any leakage of neighboring
    time points into a cell's percentile pool (the old trailing-sim-axis
    reshape) blows the check by orders of magnitude."""
    S, n, m, T = 40, 3, 1, 12
    centers = 1000.0 * np.arange(T)
    Mu_hat = centers[None, None, None, :] + rng.normal(0, 0.5, (S, n, m, T))
    nu2s = np.full((S, 1, 1, 1), 0.25)  # sd 0.5
    lo, hi = predictive_bands(Mu_hat, nu2s, rng, nsim=200)
    assert lo.shape == (n, m, T) and hi.shape == (n, m, T)
    # bands hug their own cell's center...
    assert np.max(np.abs((lo + hi) / 2 - centers[None, None, :])) < 10.0
    # ...with width ~ 2 * 1.96 * sqrt(0.5^2 + 0.5^2) ~ 2.77
    width = hi - lo
    assert 1.5 < width.mean() < 4.5

    # and the total mixture quantiles match a direct per-cell computation
    direct = Mu_hat[..., None] + rng.normal(0, 0.5, Mu_hat.shape + (200,))
    direct = np.moveaxis(direct, -1, 0).reshape(-1, n, m, T)
    np.testing.assert_allclose(lo, np.percentile(direct, 2.5, axis=0),
                               atol=0.35)
    np.testing.assert_allclose(hi, np.percentile(direct, 97.5, axis=0),
                               atol=0.35)
