"""Constrained/nonconjugate model tests: the reference's flagship Poisson
path (examples/poisson_tensor_filtering.py) at reduced scale, plus the
unconstrained ESS model."""
import pytest
import jax.numpy as jnp
import numpy as np

from functionalmf_tpu import (
    ConstrainedNonconjugateBayesianTensorFiltering,
    NonconjugateBayesianTensorFiltering,
)

NROWS, NCOLS, NDEPTH = 6, 5, 8


def poisson_loglik(Y, WV, W, V, row=None, col=None):
    """jax-traceable version of the example's rowcol_loglikelihood
    (poisson example:25-36): nansum of Poisson logpmf over the row/col slice."""
    from jax.scipy.special import gammaln
    if row is not None:
        Y = Y[row]
    if col is not None:
        Y = Y[:, col] if row is None else Y[col]
    if Y.ndim > WV.ndim:
        WV = WV[..., None]
    rate = jnp.clip(WV, 1e-8, None)
    Y0 = jnp.where(jnp.isnan(Y), 0.0, Y)
    ll = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.0)
    return jnp.sum(jnp.where(jnp.isnan(Y), 0.0, ll))


def _piecewise_truth(rng, ndims=2):
    W = rng.gamma(1, 1, size=(NROWS, ndims))
    W[np.triu_indices(ndims, k=1)] = 0
    V = np.zeros((NCOLS, NDEPTH, ndims))
    for j in range(NCOLS):
        V[j, -1] = rng.gamma(1, 1, size=ndims)
        for t in range(NDEPTH - 2, -1, -1):
            V[j, t] = V[j, t + 1] + (rng.gamma(1, 1, size=ndims)
                                     if rng.random() < 0.2 else 0)
    return W, V


@pytest.mark.slow
def test_constrained_poisson(rng):
    nembeds = 2
    W_true, V_true = _piecewise_truth(rng, nembeds)
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    Y = rng.poisson(Mu[..., None], size=Mu.shape + (1,)).astype(float)
    Ym = Y.copy()
    Ym[:2, :2] = np.nan

    # positivity constraints (poisson example:42)
    Constraints = np.concatenate([np.eye(NDEPTH), np.zeros((NDEPTH, 1))], axis=1)

    # feasible warm start (the example uses NMF; here scaled-positive init)
    W0 = np.abs(rng.normal(1.0, 0.2, size=(NROWS, nembeds)))
    W0[np.triu_indices(nembeds, k=1)] = 0
    V0 = np.abs(rng.normal(1.0, 0.2, size=(NCOLS, NDEPTH, nembeds)))

    model = ConstrainedNonconjugateBayesianTensorFiltering(
        NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
        nembeds=nembeds, tf_order=0, sigma2_init=0.5, lam2_init=0.1,
        W_init=W0, V_init=V0, gass_ngrid=50, seed=0)
    assert model.check_constraints()
    res = model.run_gibbs(Ym, nburn=500, nthin=1, nsamples=500, verbose=False)
    model.shutdown()

    Mu_hat = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
    # every posterior draw satisfies the positivity constraints
    assert Mu_hat.min() >= -1e-5, Mu_hat.min()
    mean = Mu_hat.mean(0)
    fit_rmse = np.sqrt(np.mean((mean[2:, 2:] - Mu[2:, 2:]) ** 2))
    scale = np.sqrt(np.mean(Mu ** 2))
    assert fit_rmse < 0.45 * scale, (fit_rmse, scale)
    # held-out block should still track the truth through the factorization
    ho_rmse = np.sqrt(np.mean((mean[:2, :2] - Mu[:2, :2]) ** 2))
    assert ho_rmse < 1.0 * scale, (ho_rmse, scale)


@pytest.mark.slow
def test_constrained_monotone(rng):
    """Positivity + monotone-decreasing constraints (poisson example:44-47):
    every posterior draw must be monotone in depth."""
    nembeds = 2
    W0 = np.abs(rng.normal(1.0, 0.1, size=(NROWS, nembeds)))
    W0[np.triu_indices(nembeds, k=1)] = 0
    # monotone-decreasing positive V
    V0 = np.cumsum(np.abs(rng.normal(0.3, 0.1, size=(NCOLS, NDEPTH, nembeds))), axis=1)[:, ::-1]
    Mu0 = np.einsum("nk,mtk->nmt", W0, V0)
    Y = rng.poisson(Mu0[..., None]).astype(float)

    C_pos = np.concatenate([np.eye(NDEPTH), np.zeros((NDEPTH, 1))], axis=1)
    C_mono = np.array([np.concatenate([np.zeros(i), [1, -1],
                                       np.zeros(NDEPTH - i - 2), [-1e-2]])
                       for i in range(NDEPTH - 1)])
    Constraints = np.concatenate([C_pos, C_mono], axis=0)

    model = ConstrainedNonconjugateBayesianTensorFiltering(
        NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
        nembeds=nembeds, tf_order=0, sigma2_init=0.5, lam2_init=0.1,
        W_init=W0, V_init=np.ascontiguousarray(V0), gass_ngrid=50, seed=0)
    assert model.check_constraints()
    res = model.run_gibbs(Y, nburn=100, nthin=1, nsamples=100, verbose=False)

    Mu_hat = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
    assert Mu_hat.min() >= -1e-5
    diffs = Mu_hat[..., :-1] - Mu_hat[..., 1:]
    assert diffs.min() >= -1e-2 - 1e-4, diffs.min()


@pytest.mark.slow
def test_constrained_row_constraints(rng):
    """Fixed Row_constraints are honored (factor.py:722-724): W entries
    bounded above elementwise."""
    nembeds = 2
    W0 = np.full((NROWS, nembeds), 0.5)
    W0[np.triu_indices(nembeds, k=1)] = 0
    V0 = np.abs(rng.normal(1.0, 0.2, size=(NCOLS, NDEPTH, nembeds)))
    Y = rng.poisson(np.einsum("nk,mtk->nmt", W0, V0)[..., None]).astype(float)

    C_pos = np.concatenate([np.eye(NDEPTH), np.zeros((NDEPTH, 1))], axis=1)
    # -w_a >= -2  <=>  w_a <= 2
    Row_constraints = np.concatenate([-np.eye(nembeds), np.full((nembeds, 1), -2.0)],
                                     axis=1)
    model = ConstrainedNonconjugateBayesianTensorFiltering(
        NROWS, NCOLS, NDEPTH, poisson_loglik, C_pos,
        Row_constraints=Row_constraints,
        nembeds=nembeds, tf_order=0, sigma2_init=2.0, lam2_init=0.1,
        W_init=W0, V_init=V0, gass_ngrid=50, seed=0)
    res = model.run_gibbs(Y, nburn=100, nthin=1, nsamples=200, verbose=False)
    assert res["W"].max() <= 2.0 + 1e-5, res["W"].max()


@pytest.mark.slow
def test_blocked_v_update_posterior(rng):
    """Multi-block V GASS must target the same posterior as the joint
    update: with a Gaussian likelihood and non-binding constraints the V
    posterior mean has a closed form."""
    nrows, ncols, ndepth, nembeds, nu2 = 5, 3, 12, 2, 0.3
    W_true = rng.normal(size=(nrows, nembeds))
    W_true[np.triu_indices(nembeds, 1)] = 0
    V_true = rng.normal(size=(ncols, ndepth, nembeds))
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    Y = rng.normal(Mu, np.sqrt(nu2)).astype(np.float32)

    def gauss_ll(data, WV, W, V, row=None, col=None):
        Yd = data
        if row is not None:
            Yd = Yd[row]
        if col is not None:
            Yd = Yd[:, col]
        return jnp.sum(-0.5 * (Yd - WV) ** 2 / nu2)

    # constraints that never bind
    Constraints = np.concatenate([np.eye(ndepth), np.full((ndepth, 1), -1e6)],
                                 axis=1)
    from functionalmf_tpu.ops.penalty import bayes_grid_penalty, num_penalty_rows
    nD = num_penalty_rows(ndepth, 2)
    Tau2 = np.ones((ncols, nD))
    lam2 = 0.5
    model = ConstrainedNonconjugateBayesianTensorFiltering(
        nrows, ncols, ndepth, gauss_ll, Constraints,
        nembeds=nembeds, W_true=W_true, Tau2_true=Tau2, lam2_true=lam2,
        sigma2_true=1.0, v_block_size=4, gass_ngrid=64, seed=0)
    res = model.run_gibbs(Y, nburn=500, nthin=4, nsamples=1500, verbose=False)
    Vs = res["V"]

    # closed-form posterior mean per column
    Delta = bayes_grid_penalty_dense = bayes_grid_penalty(ndepth, 2)
    I_T = np.eye(ndepth)
    X = np.kron(W_true, I_T)  # embed-major design
    for j in range(ncols):
        DtLD = Delta.T @ np.diag(1.0 / (lam2 * Tau2[j])) @ Delta
        Q = X.T @ X / nu2 + np.kron(np.eye(nembeds), DtLD)
        mu = np.linalg.solve(Q, X.T @ Y[:, j].reshape(-1) / nu2)
        mu_V = mu.reshape(nembeds, ndepth).T
        sd = np.sqrt(np.diag(np.linalg.inv(Q))).reshape(nembeds, ndepth).T
        # generous tolerance: blocked-Gibbs + slice autocorrelation inflates
        # MC error (the *exactness* of the conditional draws is unit-tested
        # in test_banded.py::test_conditional_block_draw)
        err = np.abs(Vs[:, j].mean(0) - mu_V)
        assert np.all(err < 0.5 * sd + 0.05), (j, err / sd)


@pytest.mark.slow
def test_ep_centering_posterior_invariance(rng):
    """EP centering recenters the GASS proposal but divides itself back out
    of the likelihood (factor.py:677-683, 754-756): posterior means with and
    without EP must agree within MC error."""
    nembeds = 2
    W_true, V_true = _piecewise_truth(rng, nembeds)
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    Y = rng.poisson(Mu).astype(float)
    Constraints = np.concatenate([np.eye(NDEPTH), np.zeros((NDEPTH, 1))], axis=1)
    W0 = np.abs(rng.normal(1.0, 0.2, size=(NROWS, nembeds)))
    W0[np.triu_indices(nembeds, k=1)] = 0
    V0 = np.abs(rng.normal(1.0, 0.2, size=(NCOLS, NDEPTH, nembeds)))
    # The EP variance must be OVERestimated (the reference's ep_from_mf
    # exists to do exactly this, utils.py:423-438): an overconfident EP
    # traps any EP-centered GASS chain in the correction's tails — the
    # subtracted EP logpdf grows quadratically and swamps the likelihood.
    ep = (Mu + rng.normal(0, 0.1, Mu.shape), np.full(Mu.shape, 8.0))

    means = []
    for ep_approx in (None, ep):
        model = ConstrainedNonconjugateBayesianTensorFiltering(
            NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
            nembeds=nembeds, tf_order=0, sigma2_init=0.5, lam2_init=0.1,
            W_init=W0, V_init=V0, gass_ngrid=64, ep_approx=ep_approx, seed=3)
        res = model.run_gibbs(Y, nburn=1200, nthin=2, nsamples=400, verbose=False)
        means.append(np.einsum("znk,zmtk->znmt", res["W"], res["V"]).mean(0))
    scale = np.sqrt((Mu ** 2).mean())
    rel = np.abs(means[0] - means[1]).mean() / scale
    assert rel < 0.2, rel
    # both track the truth
    for mu_hat in means:
        assert np.sqrt(((mu_hat - Mu) ** 2).mean()) < 0.5 * scale


def test_nonconjugate_ess_exact_posterior(rng):
    """Sharp ESS correctness check: with V fixed at the truth and a Gaussian
    likelihood, the W posterior is exactly the conjugate ridge posterior
    (the ESS chain must reproduce its mean). Exercises the
    loglikelihood(W, V, data) contract (factor.py:567-607)."""
    nrows, ncols, ndepth, nembeds, nu2 = 4, 3, 5, 2, 0.25
    sigma2 = 1.0
    W_true = rng.normal(size=(nrows, nembeds))
    W_true[np.triu_indices(nembeds, k=1)] = 0
    V_true = rng.normal(size=(ncols, ndepth, nembeds))
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    Y = rng.normal(Mu, np.sqrt(nu2))

    def loglik(W, V, data):
        mu = jnp.einsum("nk,mtk->nmt", W, V)
        return jnp.sum(-0.5 * (data - mu) ** 2 / nu2)

    from functionalmf_tpu.ops.penalty import num_penalty_rows
    nD = num_penalty_rows(ndepth, 2)
    model = NonconjugateBayesianTensorFiltering(
        nrows, ncols, ndepth, loglik, nembeds=nembeds,
        V_true=V_true, sigma2_true=sigma2, lam2_true=1.0,
        Tau2_true=np.ones((ncols, nD)), seed=0)
    res = model.run_gibbs(Y, nburn=500, nthin=2, nsamples=2000, verbose=False)
    Ws = res["W"]

    # closed-form ridge posterior per row
    Vf = V_true.reshape(-1, nembeds)
    for i in range(nrows):
        nd = min(i + 1, nembeds)
        A = Vf[:, :nd]
        Q = A.T @ A / nu2 + np.eye(nd) / sigma2
        mu_post = np.linalg.solve(Q, A.T @ Y[i].reshape(-1) / nu2)
        sd = np.sqrt(np.diag(np.linalg.inv(Q)))
        # ESS autocorrelation inflates MC error; allow a generous multiple
        tol = 12 * sd / np.sqrt(Ws.shape[0] / 10) + 5e-3
        assert np.all(np.abs(Ws[:, i, :nd].mean(0) - mu_post) < tol), \
            (i, Ws[:, i, :nd].mean(0), mu_post, tol)
        assert np.all(Ws[:, i, nd:] == 0)


@pytest.mark.slow
def test_block_loglikelihood_equivalence(rng):
    """The depth-decomposable `loglikelihood_block` fast path must target the
    same posterior as the full likelihood: out-of-block terms are constant
    within a block update, so the slice test is unchanged."""
    nembeds = 2
    W_true, V_true = _piecewise_truth(rng, nembeds)
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    Y = rng.poisson(Mu).astype(float)
    Constraints = np.concatenate([np.eye(NDEPTH), np.zeros((NDEPTH, 1))], axis=1)
    W0 = np.abs(rng.normal(1.0, 0.2, size=(NROWS, nembeds)))
    W0[np.triu_indices(nembeds, k=1)] = 0
    V0 = np.abs(rng.normal(1.0, 0.2, size=(NCOLS, NDEPTH, nembeds)))

    def poisson_ll_block(Yd, WV, W, V, row=None, col=None, tslice=None):
        from jax.scipy.special import gammaln
        s0, e0 = tslice
        Yb = Yd[:, col, s0:e0]
        rate = jnp.clip(WV, 1e-8, None)
        Y0 = jnp.where(jnp.isnan(Yb), 0.0, Yb)
        ll = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.0)
        return jnp.sum(jnp.where(jnp.isnan(Yb), 0.0, ll))

    means = []
    for blk_ll in (None, poisson_ll_block):
        model = ConstrainedNonconjugateBayesianTensorFiltering(
            NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
            nembeds=nembeds, tf_order=0, sigma2_init=0.5, lam2_init=0.1,
            W_init=W0, V_init=V0, gass_ngrid=50, v_block_size=3,
            loglikelihood_block=blk_ll, seed=11)
        res = model.run_gibbs(Y, nburn=800, nthin=1, nsamples=800,
                              verbose=False)
        mu_hat = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
        assert mu_hat.min() >= -1e-5  # feasibility of every draw
        means.append(mu_hat.mean(0))
    scale = np.sqrt((Mu ** 2).mean())
    rel = np.abs(means[0] - means[1]).mean() / scale
    assert rel < 0.15, rel
    for mu_hat in means:
        assert np.sqrt(((mu_hat - Mu) ** 2).mean()) < 0.5 * scale


@pytest.mark.slow
def test_redblack_matches_sequential_posterior(rng):
    """The two-color blocked-V schedule (v_schedule='redblack') must target
    the same posterior as the sequential schedule: same-color blocks are
    conditionally independent (prior bandwidth <= block size, constraint
    support <= block size + 1, depth-factorizing likelihood), so batching
    them is exact Gibbs. Also checks per-draw feasibility and that the
    eligibility validation rejects a non-decomposable setup."""
    nembeds = 2
    n_, m_, T_ = 6, 5, 11
    rng = np.random.default_rng(5)
    W = rng.gamma(1, 1, (n_, nembeds)); W[np.triu_indices(nembeds, 1)] = 0
    V = np.abs(rng.normal(1, .3, (m_, T_, nembeds)))
    Mu = np.einsum("nk,mtk->nmt", W, V)
    Y = rng.poisson(Mu).astype(float); Y[0, 0] = np.nan

    def pcells(Yd, WV, Wm, Vb, col=None, t0=None, size=None):
        import jax
        from jax.scipy.special import gammaln
        Yb = jax.lax.dynamic_slice_in_dim(Yd[:, col], t0, size, axis=1)
        rate = jnp.clip(WV, 1e-8, None)
        Y0 = jnp.where(jnp.isnan(Yb), 0.0, Yb)
        lp = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.)
        return jnp.sum(jnp.where(jnp.isnan(Yb), 0.0, lp))

    C = np.concatenate([np.eye(T_), np.zeros((T_, 1))], axis=1)
    W0 = np.abs(rng.normal(1, .2, (n_, nembeds)))
    W0[np.triu_indices(nembeds, 1)] = 0
    V0 = np.abs(rng.normal(1, .2, (m_, T_, nembeds)))
    means = {}
    for sched in ("seq", "redblack"):
        kw = dict(v_schedule=sched)
        if sched == "redblack":
            kw["loglikelihood_cells"] = pcells
        mod = ConstrainedNonconjugateBayesianTensorFiltering(
            n_, m_, T_, poisson_loglik, C, nembeds=nembeds, tf_order=0,
            sigma2_init=0.5, lam2_init=0.1, W_init=W0, V_init=V0,
            gass_ngrid=40, v_block_size=3, seed=7, **kw)
        res = mod.run_gibbs(Y, nburn=600, nthin=1, nsamples=600,
                            verbose=False)
        mu = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
        assert mu.min() >= -1e-5
        means[sched] = mu.mean(0)
    rel = np.abs(means["seq"] - means["redblack"]).mean() / np.sqrt((Mu ** 2).mean())
    assert rel < 0.12, rel

    with pytest.raises(ValueError, match="loglikelihood_cells"):
        ConstrainedNonconjugateBayesianTensorFiltering(
            n_, m_, T_, poisson_loglik, C, nembeds=nembeds, tf_order=0,
            v_block_size=3, v_schedule="redblack", seed=0)


def test_redblack_with_ep_centering(rng):
    """Regression: the red-black EP branch built its coupled (size*k) block
    precision with an einsum that reused the block index as an embedding
    index ('mbts,ab->mbtasb'), which failed at trace time — so EP-centered
    runs (the politics configuration, reference politics/benchmark.py:84-97)
    could never use the red-black schedule. Runs a short EP-centered
    red-black chain and checks feasibility/finiteness of every draw."""
    nembeds = 2
    n_, m_, T_ = 5, 4, 9
    rng = np.random.default_rng(9)
    W = rng.gamma(1, 1, (n_, nembeds)); W[np.triu_indices(nembeds, 1)] = 0
    V = np.abs(rng.normal(1, .3, (m_, T_, nembeds)))
    Mu = np.einsum("nk,mtk->nmt", W, V)
    Y = rng.poisson(Mu).astype(float)

    def pcells(Yd, WV, Wm, Vb, col=None, t0=None, size=None):
        import jax
        from jax.scipy.special import gammaln
        Yb = jax.lax.dynamic_slice_in_dim(Yd[:, col], t0, size, axis=1)
        rate = jnp.clip(WV, 1e-8, None)
        Y0 = jnp.where(jnp.isnan(Yb), 0.0, Yb)
        lp = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.)
        return jnp.sum(jnp.where(jnp.isnan(Yb), 0.0, lp))

    C = np.concatenate([np.eye(T_), np.zeros((T_, 1))], axis=1)
    W0 = np.abs(rng.normal(1, .2, (n_, nembeds)))
    W0[np.triu_indices(nembeds, 1)] = 0
    V0 = np.abs(rng.normal(1, .2, (m_, T_, nembeds)))
    ep = (Mu + rng.normal(0, 0.1, Mu.shape), np.full(Mu.shape, 8.0))
    mod = ConstrainedNonconjugateBayesianTensorFiltering(
        n_, m_, T_, poisson_loglik, C, nembeds=nembeds, tf_order=0,
        sigma2_init=0.5, lam2_init=0.1, W_init=W0, V_init=V0,
        gass_ngrid=32, v_block_size=3, v_schedule="redblack",
        loglikelihood_cells=pcells, ep_approx=ep, seed=13)
    res = mod.run_gibbs(Y, nburn=40, nthin=1, nsamples=40, verbose=False)
    mu = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
    assert np.isfinite(mu).all()
    assert mu.min() >= -1e-5  # feasibility of every draw


@pytest.mark.slow
def test_redblack_ep_matches_sequential_ep_posterior(rng):
    """With EP centering the red-black block precision is the coupled
    (size*k) system kron(DtLD_blk, I_k) + diag_t(G) — a (t,a)-major packing
    error there would sample wrong-but-finite conditionals that the
    trace-time regression test cannot catch. Check posterior means of
    seq+EP vs redblack+EP agree within MC error."""
    nembeds = 2
    n_, m_, T_ = 6, 5, 11
    rng = np.random.default_rng(17)
    W = rng.gamma(1, 1, (n_, nembeds)); W[np.triu_indices(nembeds, 1)] = 0
    V = np.abs(rng.normal(1, .3, (m_, T_, nembeds)))
    Mu = np.einsum("nk,mtk->nmt", W, V)
    Y = rng.poisson(Mu).astype(float)

    def pcells(Yd, WV, Wm, Vb, col=None, t0=None, size=None):
        import jax
        from jax.scipy.special import gammaln
        Yb = jax.lax.dynamic_slice_in_dim(Yd[:, col], t0, size, axis=1)
        rate = jnp.clip(WV, 1e-8, None)
        Y0 = jnp.where(jnp.isnan(Yb), 0.0, Yb)
        lp = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.)
        return jnp.sum(jnp.where(jnp.isnan(Yb), 0.0, lp))

    C = np.concatenate([np.eye(T_), np.zeros((T_, 1))], axis=1)
    W0 = np.abs(rng.normal(1, .2, (n_, nembeds)))
    W0[np.triu_indices(nembeds, 1)] = 0
    V0 = np.abs(rng.normal(1, .2, (m_, T_, nembeds)))
    ep = (Mu + rng.normal(0, 0.1, Mu.shape), np.full(Mu.shape, 8.0))
    means = {}
    for sched in ("seq", "redblack"):
        kw = dict(v_schedule=sched)
        if sched == "redblack":
            kw["loglikelihood_cells"] = pcells
        mod = ConstrainedNonconjugateBayesianTensorFiltering(
            n_, m_, T_, poisson_loglik, C, nembeds=nembeds, tf_order=0,
            sigma2_init=0.5, lam2_init=0.1, W_init=W0, V_init=V0,
            gass_ngrid=40, v_block_size=3, ep_approx=ep, seed=7, **kw)
        res = mod.run_gibbs(Y, nburn=600, nthin=1, nsamples=600,
                            verbose=False)
        mu = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
        assert mu.min() >= -1e-5
        means[sched] = mu.mean(0)
    rel = (np.abs(means["seq"] - means["redblack"]).mean()
           / np.sqrt((Mu ** 2).mean()))
    assert rel < 0.12, rel


@pytest.mark.slow
def test_feasibility_invariant_every_draw(rng):
    """Every stored draw must satisfy the constraints. Regression test for a
    precision bug: the W-update constraint matrix A_w = CA (x) V built with
    a default-precision einsum rounds V to bfloat16 inside the contraction,
    so accepted W draws violated the true constraints by up to ~1e-3
    whenever the subsequent blocked-V GASS stayed put on the now-infeasible
    point. All constraint/proposal einsums must run at Precision.HIGHEST."""
    nrows_, ncols_, ndepth_, k = 6, 5, 8, 2
    rng = np.random.default_rng(3)
    W = rng.gamma(1, 1, size=(nrows_, k)); W[np.triu_indices(k, 1)] = 0
    V = np.abs(rng.normal(1, .3, size=(ncols_, ndepth_, k)))
    Mu = np.einsum("nk,mtk->nmt", W, V)
    Y = rng.poisson(Mu).astype(float)
    Y[0, 0] = np.nan

    def ll(Yd, WV, Wm, Vm, row=None, col=None):
        from jax.scipy.special import gammaln
        if row is not None:
            Yd = Yd[row]
        if col is not None:
            Yd = Yd[:, col]
        if Yd.ndim > WV.ndim:
            WV = WV[..., None]
        rate = jnp.clip(WV, 1e-8, None)
        Y0 = jnp.where(jnp.isnan(Yd), 0.0, Yd)
        lp = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.0)
        return jnp.sum(jnp.where(jnp.isnan(Yd), 0.0, lp))

    C = np.concatenate([np.eye(ndepth_), np.zeros((ndepth_, 1))], axis=1)
    W0 = np.abs(rng.normal(1, .2, size=(nrows_, k)))
    W0[np.triu_indices(k, 1)] = 0
    V0 = np.abs(rng.normal(1, .2, size=(ncols_, ndepth_, k)))
    model = ConstrainedNonconjugateBayesianTensorFiltering(
        nrows_, ncols_, ndepth_, ll, C, nembeds=k, tf_order=0,
        sigma2_init=0.5, lam2_init=0.1, W_init=W0, V_init=V0,
        gass_ngrid=50, v_block_size=3, seed=0)
    res = model.run_gibbs(Y, nburn=400, nthin=1, nsamples=400, verbose=False)
    Mu_hat = np.einsum("znk,zmtk->znmt",
                       np.asarray(res["W"], np.float64),
                       np.asarray(res["V"], np.float64))
    assert Mu_hat.min() >= -1e-5, Mu_hat.min()


@pytest.mark.slow
def test_gass_repeats_mix_faster(rng):
    """gass_w_repeats/gass_v_repeats run extra GASS updates per sweep:
    draws stay feasible and per-sweep movement increases."""
    import jax.numpy as jnp
    from jax.scipy.special import gammaln

    n, m, T, k = 6, 5, 12, 2

    def loglik(Y, WV, W, V, row=None, col=None):
        if row is not None:
            Y = Y[row]
        if col is not None:
            Y = Y[:, col]
        rate = jnp.clip(WV, 1e-8, None)
        return jnp.sum(Y * jnp.log(rate) - rate - gammaln(Y + 1.0))

    W0 = np.abs(rng.normal(1, 0.2, size=(n, k)))
    W0[np.triu_indices(k, k=1)] = 0
    V0 = np.abs(rng.normal(1, 0.2, size=(m, T, k)))
    Y = rng.poisson(np.einsum("nk,mtk->nmt", W0, V0)).astype(float)
    C = np.concatenate([np.eye(T), np.zeros((T, 1))], axis=1)

    # interweave off: the round-5 scale moves rescale W every sweep in
    # BOTH arms, diluting the repeats ratio this test isolates
    common = dict(nembeds=k, tf_order=1, sigma2_init=0.5, lam2_init=0.1,
                  W_init=W0, V_init=V0, gass_ngrid=16, seed=2,
                  interweave=False)
    moves = {}
    for reps in (1, 3):
        mod = ConstrainedNonconjugateBayesianTensorFiltering(
            n, m, T, loglik, C, gass_w_repeats=reps, gass_v_repeats=reps,
            **common)
        res = mod.run_gibbs(Y, nburn=0, nthin=1, nsamples=12, verbose=False)
        assert np.isfinite(res["W"]).all() and np.isfinite(res["V"]).all()
        assert np.einsum("znk,zmtk->znmt", res["W"], res["V"]).min() >= -1e-5
        dW = np.abs(np.diff(res["W"], axis=0)).mean()
        moves[reps] = dW
    assert moves[3] > moves[1] * 1.15, moves


@pytest.mark.slow
def test_shrink_matches_grid_posterior(rng):
    """Model-level kernel equivalence: the shrink and grid GASS kernels are
    both valid transition kernels for the same stationary distribution, so
    long-run posterior means of Mu = W V^T must agree (catches integration
    bugs in the blocked-V operator path that sampler-level tests miss)."""
    nembeds = 2
    W_true, V_true = _piecewise_truth(rng, nembeds)
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    Y = rng.poisson(Mu).astype(float)
    Constraints = np.concatenate([np.eye(NDEPTH), np.zeros((NDEPTH, 1))],
                                 axis=1)
    W0 = np.abs(rng.normal(1.0, 0.2, size=(NROWS, nembeds)))
    W0[np.triu_indices(nembeds, k=1)] = 0
    V0 = np.abs(rng.normal(1.0, 0.2, size=(NCOLS, NDEPTH, nembeds)))

    est = {}
    for method in ("grid", "shrink"):
        mod = ConstrainedNonconjugateBayesianTensorFiltering(
            NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
            nembeds=nembeds, tf_order=1, sigma2_init=0.5, lam2_init=0.1,
            W_init=W0, V_init=V0, gass_ngrid=24, seed=5, gass_method=method)
        res = mod.run_gibbs(Y, nburn=600, nthin=2, nsamples=400,
                            verbose=False)
        Mu_hat = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
        assert Mu_hat.min() >= -1e-5
        est[method] = Mu_hat.mean(0)

    # same posterior up to MC error: mean absolute difference well under
    # the data scale
    mad = np.abs(est["grid"] - est["shrink"]).mean()
    assert mad < 0.25 * Mu.std(), (mad, Mu.std())
