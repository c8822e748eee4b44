"""Support-utility tests: PAV, factor PAV, NMF, EP, metrics, holdouts."""
import numpy as np

from functionalmf_tpu.utils import (
    binary_mf,
    coverage_at,
    cross_entropy,
    ep_from_mf,
    factor_pav,
    grid_ep_approx,
    ilogit,
    mae,
    moving_average,
    mse,
    pav,
    random_holdouts,
    tensor_nmf,
)


def ref_pav(y):
    """Reference PAV transliteration (utils.py:458-492)."""
    y = np.asarray(y, dtype=float)
    v = y.copy()
    lvls = np.arange(len(y))
    lvlsets = np.c_[lvls, lvls]
    while True:
        deriv = np.diff(v)
        if np.all(deriv >= 0):
            break
        viol = np.where(deriv < 0)[0]
        start = lvlsets[viol[0], 0]
        last = lvlsets[viol[0] + 1, 1]
        s = v[start:last + 1].sum()
        n = last - start + 1
        v[start:last + 1] = s / n
        lvlsets[start:last + 1, 0] = start
        lvlsets[start:last + 1, 1] = last
    return v


def test_pav_matches_reference(rng):
    for _ in range(20):
        y = rng.normal(size=rng.integers(2, 30))
        np.testing.assert_allclose(pav(y), ref_pav(y), atol=1e-10)
    out = pav(np.array([3.0, 2.0, 1.0]))
    np.testing.assert_allclose(out, [2.0, 2.0, 2.0])


def test_factor_pav_monotone(rng):
    W = rng.gamma(1, 1, size=(4, 3))
    V = rng.gamma(1, 1, size=(10, 3))
    Vp = factor_pav(W, V)
    M = W.dot(Vp.T)
    assert np.all(M[:, :-1] - M[:, 1:] >= -1e-9)
    # in_place flag
    V2 = V.copy()
    factor_pav(W, V2, in_place=True)
    np.testing.assert_allclose(V2, Vp)


def test_tensor_nmf_reconstruction(rng):
    W = rng.gamma(2, 1, size=(6, 2))
    W[np.triu_indices(2, k=1)] = 0
    V = rng.gamma(2, 1, size=(5, 7, 2))
    Y = np.einsum("nk,mtk->nmt", W, V) + rng.normal(0, 0.05, size=(6, 5, 7))
    Y[0, 0, 2] = np.nan
    W_hat, V_hat = tensor_nmf(Y, 2, rng=rng)
    rec = np.einsum("nk,mtk->nmt", W_hat, V_hat)
    assert np.all(W_hat >= 0) and np.all(V_hat >= 0)
    assert np.sqrt(mse(Y, rec)) < 0.25
    # lower-triangular W preserved
    assert W_hat[0, 1] <= 1e-3 + 1e-9


def test_tensor_nmf_monotone(rng):
    W = rng.gamma(2, 1, size=(4, 2))
    W[np.triu_indices(2, k=1)] = 0
    V = np.cumsum(rng.gamma(1, 1, size=(3, 8, 2)), axis=1)[:, ::-1]
    Y = np.einsum("nk,mtk->nmt", W, V)
    W_hat, V_hat = tensor_nmf(Y, 2, monotone=True, rng=rng)
    M = np.einsum("nk,mtk->nmt", W_hat, V_hat)
    assert np.all(M[..., :-1] - M[..., 1:] >= -1e-6)


def test_grid_ep_approx_gaussian():
    from scipy.stats import norm
    mu, sigma = 0.6, 0.1
    mu_hat, sigma_hat = grid_ep_approx(lambda x: norm.pdf(x, mu, sigma))
    assert abs(mu_hat - mu) < 0.02
    # The adaptive grid treats points as equal-width bins (as the reference
    # does, utils.py:139-188), which biases the spread estimate low around
    # peaked likelihoods; only order-of-magnitude accuracy is guaranteed.
    assert 0.4 * sigma < sigma_hat < 1.6 * sigma


def test_ep_from_mf(rng):
    W = rng.gamma(1, 1, size=(4, 2))
    V = rng.gamma(1, 1, size=(3, 5, 2))
    Y = np.einsum("nk,mtk->nmt", W, V)[..., None] + rng.normal(0, 0.3, (4, 3, 5, 2))
    M, S = ep_from_mf(Y, W, V, mode="multiplier", multiplier=3, verbose=False)
    assert M.shape == (4, 3, 5) and S.shape == (4, 3, 5)
    assert np.all(S > 0.3)  # overestimate


def test_metrics():
    assert mse([1.0, np.nan], [0.0, 5.0]) == 1.0
    assert mae([1.0, np.nan], [0.0, 5.0]) == 1.0
    np.testing.assert_allclose(ilogit(0.0), 0.5)
    np.testing.assert_allclose(moving_average(np.arange(5.0), 3), [1, 2, 3])
    assert cross_entropy(np.array([1.0]), np.array([0.5])) < 0
    samples = np.random.default_rng(0).normal(size=(500, 3))
    assert 80 < coverage_at(np.zeros(3), samples, 90) <= 100


def test_random_holdouts(rng):
    Y = rng.normal(size=(6, 5, 4, 2))
    sel = random_holdouts(Y, 3, rng=rng, verbose=False)
    assert sel.shape == (3, 2)
    Yc = Y.copy()
    Yc[sel[:, 0], sel[:, 1]] = np.nan
    assert not np.any(np.all(np.isnan(Yc), axis=(1, 2, 3)))
    assert not np.any(np.all(np.isnan(Yc), axis=(0, 2, 3)))


def test_binary_mf(rng):
    W = rng.normal(0, 1, size=(20, 3))
    V = rng.normal(0, 1, size=(15, 3))
    Y = (rng.random((20, 15)) <= ilogit(W.dot(V.T))).astype(float)
    W_hat, V_hat = binary_mf(Y, 3, lam=0.5, rng=rng)
    Mu = ilogit(W.dot(V.T))
    Mu_hat = ilogit(W_hat.dot(V_hat.T))
    # better than the constant predictor
    base = np.mean((Mu - Y.mean()) ** 2)
    assert np.mean((Mu - Mu_hat) ** 2) < base
