"""Fused candidate-likelihood kernels vs the einsum reference
(ops/fused_ll.py; interpret mode on the CPU mesh)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from functionalmf_tpu.ops.fused_ll import fused_row_ll, fused_col_block_ll


def poisson_cell(y, tau, *extras):
    rate = jnp.clip(tau, 1e-8, None)
    y0 = jnp.where(jnp.isnan(y), 0.0, y)
    ll = y0 * jnp.log(rate) - rate - jax.scipy.special.gammaln(y0 + 1.0)
    if extras:
        mu, sig = extras
        ep = jax.scipy.stats.norm.logpdf(tau, mu, sig)
        ll = ll - jnp.where(jnp.isnan(mu), 0.0, ep)
    return jnp.where(jnp.isnan(y), 0.0, ll)


@pytest.mark.parametrize("G,k,C", [(12, 5, 300), (100, 16, 1000)])
def test_fused_row_ll_matches_einsum(rng, G, k, C):
    cands = jnp.asarray(rng.gamma(2, 1, size=(G, k)), jnp.float32)
    B = jnp.asarray(rng.gamma(1, 0.5, size=(k, C)), jnp.float32)
    y = rng.poisson(2.0, size=C).astype(np.float32)
    y[rng.random(C) < 0.1] = np.nan
    y = jnp.asarray(y)

    got = fused_row_ll(cands, B, y, poisson_cell, interpret=True)
    tau = cands @ B
    want = poisson_cell(y[None], tau).sum(axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)


def test_fused_row_ll_with_ep_extras(rng):
    G, k, C = 20, 4, 257
    cands = jnp.asarray(rng.gamma(2, 1, size=(G, k)), jnp.float32)
    B = jnp.asarray(rng.gamma(1, 0.5, size=(k, C)), jnp.float32)
    y = jnp.asarray(rng.poisson(2.0, size=C), jnp.float32)
    mu = rng.normal(2, 1, size=C).astype(np.float32)
    mu[rng.random(C) < 0.2] = np.nan
    sig = np.abs(rng.normal(1, 0.2, size=C)).astype(np.float32) + 0.5
    muj, sigj = jnp.asarray(mu), jnp.asarray(sig)

    got = fused_row_ll(cands, B, y, poisson_cell, extras=(muj, sigj),
                       interpret=True)
    tau = cands @ B
    want = poisson_cell(y[None], tau, muj[None], sigj[None]).sum(axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("G,Tb,k,n", [(12, 4, 5, 70), (64, 8, 16, 128)])
def test_fused_col_block_ll_matches_einsum(rng, G, Tb, k, n):
    cands3 = jnp.asarray(rng.gamma(2, 1, size=(G, Tb, k)), jnp.float32)
    Wn = jnp.asarray(rng.gamma(1, 0.5, size=(n, k)), jnp.float32)
    y = rng.poisson(2.0, size=(Tb, n)).astype(np.float32)
    y[rng.random((Tb, n)) < 0.1] = np.nan
    yj = jnp.asarray(y)

    got = fused_col_block_ll(cands3, Wn, yj, poisson_cell, interpret=True)
    tau = jnp.einsum("gtk,nk->gtn", cands3, Wn)
    want = poisson_cell(yj[None], tau).sum(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-3)


@pytest.mark.slow
def test_cellfn_y_only_terms_cancel(rng):
    """Dropping candidate-independent terms (functions of y alone, e.g.
    the Poisson -gammaln(y+1)) from the cellfn leaves the GASS draw
    stream bit-identical: cur_ll and every candidate are evaluated with
    the same function (samplers/gass.py:96), so the constant cancels
    from the slice test. This is the documented contract that makes
    cellfns lower through Pallas TPU (no lgamma primitive)."""
    from functionalmf_tpu import ConstrainedNonconjugateBayesianTensorFiltering

    def cell_no_const(y, tau, *extras):
        rate = jnp.clip(tau, 1e-8, None)
        y0 = jnp.where(jnp.isnan(y), 0.0, y)
        ll = y0 * jnp.log(rate) - rate
        return jnp.where(jnp.isnan(y), 0.0, ll)

    nr, nc, nd, k = 4, 3, 6, 2
    W0 = np.abs(rng.normal(1, 0.3, size=(nr, k)))
    W0[np.triu_indices(k, 1)] = 0
    V0 = np.abs(rng.normal(1, 0.3, size=(nc, nd, k)))
    Y = rng.poisson(np.einsum("nk,mtk->nmt", W0, V0)).astype(float)
    Con = np.concatenate([np.eye(nd), np.zeros((nd, 1))], axis=1)

    def loglik(Yd, WV, W, V, row=None, col=None):
        if row is not None:
            Yd = Yd[row]
        if col is not None:
            Yd = Yd[:, col]
        rate = jnp.clip(WV, 1e-8, None)
        Y0 = jnp.where(jnp.isnan(Yd), 0.0, Yd)
        ll = Y0 * jnp.log(rate) - rate
        return jnp.sum(jnp.where(jnp.isnan(Yd), 0.0, ll))

    draws = {}
    for tag, fn in (("full", poisson_cell), ("noconst", cell_no_const)):
        model = ConstrainedNonconjugateBayesianTensorFiltering(
            nr, nc, nd, loglik, Con, nembeds=k, W_init=W0, V_init=V0,
            gass_ngrid=8, seed=0, v_block_size=3,
            loglikelihood_cellfn=fn, fuse_cells=True)
        res = model.run_gibbs(Y, nburn=3, nthin=1, nsamples=3,
                              verbose=False)
        draws[tag] = (np.asarray(res["W"]), np.asarray(res["V"]))
    # allclose, not bit-equal: the constant cancels mathematically, but
    # dropping the per-cell gammaln changes partial-sum rounding, so a
    # slice comparison could flip under a different backend/shape (ADVICE
    # round-4); on the pinned CPU/interpret config the draws coincide to
    # float32 roundoff
    np.testing.assert_allclose(draws["full"][0], draws["noconst"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(draws["full"][1], draws["noconst"][1],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_constrained_model_fused_cellfn_end_to_end(rng):
    """The fused-kernel model (loglikelihood_cellfn contract) recovers
    the same posterior as the einsum path on a small constrained Poisson
    problem (interpret-mode Pallas on the CPU mesh)."""
    from functionalmf_tpu import ConstrainedNonconjugateBayesianTensorFiltering

    nr, nc, nd, k = 5, 4, 6, 2
    W0 = np.abs(rng.normal(1, 0.3, size=(nr, k)))
    W0[np.triu_indices(k, 1)] = 0
    V0 = np.abs(rng.normal(1, 0.3, size=(nc, nd, k)))
    Y = rng.poisson(np.einsum("nk,mtk->nmt", W0, V0)).astype(float)
    Con = np.concatenate([np.eye(nd), np.zeros((nd, 1))], axis=1)

    def loglik(Yd, WV, W, V, row=None, col=None):
        if row is not None:
            Yd = Yd[row]
        if col is not None:
            Yd = Yd[:, col]
        rate = jnp.clip(WV, 1e-8, None)
        Y0 = jnp.where(jnp.isnan(Yd), 0.0, Yd)
        ll = Y0 * jnp.log(rate) - rate - \
            jax.scipy.special.gammaln(Y0 + 1.0)
        return jnp.sum(jnp.where(jnp.isnan(Yd), 0.0, ll))

    mu_true = np.einsum("nk,mtk->nmt", W0, V0)
    results = {}
    for tag, extra in (("einsum", {}),
                       ("fused", {"loglikelihood_cellfn": poisson_cell,
                                  "fuse_cells": True})):
        model = ConstrainedNonconjugateBayesianTensorFiltering(
            nr, nc, nd, loglik, Con, nembeds=k, W_init=W0, V_init=V0,
            gass_ngrid=16, seed=0, v_block_size=3, **extra)
        res = model.run_gibbs(Y, nburn=60, nthin=1, nsamples=60,
                              verbose=False)
        wv = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
        assert wv.min() >= -1e-5
        results[tag] = np.sqrt(np.mean((wv.mean(0) - mu_true) ** 2))
    # both paths target the same posterior: equal recovery up to MC noise
    assert abs(results["fused"] - results["einsum"]) < \
        0.5 * max(results.values()) + 0.1, results
