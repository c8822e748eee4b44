"""Horseshoe ladder and conjugate IG prior moment/posterior checks."""
import jax
import jax.numpy as jnp
import numpy as np

from functionalmf_tpu.samplers.conjugate import ConjugateInverseGammaPrior, resample_precision
from functionalmf_tpu.samplers.horseshoe import (
    resample_lam2,
    resample_tau2_ladder,
    sample_horseshoe,
    sample_horseshoe_plus,
)


def test_horseshoe_ladder_shapes(key):
    d, c, b, a = sample_horseshoe_plus(key, size=(7, 3))
    for x in (d, c, b, a):
        assert x.shape == (7, 3)
        assert np.all(np.asarray(x) > 0)
    hs, aux = sample_horseshoe(key, size=(5,))
    assert hs.shape == (5,)


def test_horseshoe_matches_numpy_construction(key):
    # The ladder is nested inverse-gammas with the previous draw as *scale*
    # (utils.py:115-120). Check the conditional: given a, median of b should
    # match IG(1/2, scale=a)'s median across many draws.
    n = 200000
    d, c, b, a = sample_horseshoe_plus(key, size=(n,))
    a_np = np.asarray(a)
    b_np = np.asarray(b)
    # b | a ~ 1/Gamma(0.5, scale=1/a)... reference: 1/np.random.gamma(0.5, a)
    # => b = 1/g where g ~ Gamma(0.5) * a. So b*a ~ 1/Gamma(0.5).
    ratio = b_np * a_np
    ref = 1.0 / np.random.default_rng(0).gamma(0.5, size=n)
    assert abs(np.median(ratio) - np.median(ref)) < 0.1


def test_conjugate_ig_posterior_mean(key):
    # Known residuals: precision posterior Gamma(a + n/2, b + sqerr/2)
    obs = jnp.asarray([1.0, -1.0, 2.0, jnp.nan])
    means = jnp.zeros(4)
    prior = ConjugateInverseGammaPrior(1, shape=2.0, rate=3.0)
    keys = jax.random.split(key, 30000)
    draws = np.asarray(jax.vmap(lambda k: prior.resample(k, (means, obs)))(keys))
    a_post = 2.0 + 3 / 2
    b_post = 3.0 + (1 + 1 + 4) / 2
    np.testing.assert_allclose(draws.mean(), a_post / b_post, rtol=0.03)
    np.testing.assert_allclose(draws.var(), a_post / b_post**2, rtol=0.1)


def test_resample_precision_mask(key):
    obs = jnp.asarray([1.0, 0.0, 2.0])
    mask = jnp.asarray([1.0, 0.0, 1.0])
    p1 = resample_precision(key, jnp.zeros(3), obs, mask=mask)
    obs2 = jnp.asarray([1.0, jnp.nan, 2.0])
    p2 = resample_precision(key, jnp.zeros(3), obs2)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5)


def test_tau2_ladder_stationarity(key):
    # With lam2=1 and zero deltas, tau2 update must stay positive & finite
    ncols, nD = 4, 9
    t2 = jnp.ones((ncols, nD))
    out = resample_tau2_ladder(key, jnp.zeros((ncols, nD)), 1.0,
                               t2, t2, t2, t2, nembeds=3)
    for x in out:
        assert x.shape == (ncols, nD)
        assert np.all(np.isfinite(np.asarray(x)))
        assert np.all(np.asarray(x) > 0)


def test_lam2_posterior_concentration(key):
    # Large deltas^2/tau2 sum should push lam2 up to soak up the signal:
    # E[1/lam2] = shape/rate, so lam2 ~ rate/shape roughly.
    nD, ncols, k = 5, 10, 3
    s = 5000.0
    keys = jax.random.split(key, 5000)
    draws = np.asarray(jax.vmap(
        lambda kk: resample_lam2(kk, s, 1.0, nD, ncols, k)[0])(keys))
    shape = (nD * ncols * k + 1) / 2
    rate = 1.0 + s / 2
    # mean of IG(shape, rate) = rate/(shape-1)
    np.testing.assert_allclose(draws.mean(), rate / (shape - 1), rtol=0.05)
