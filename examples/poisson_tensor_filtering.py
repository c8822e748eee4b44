"""Constrained Poisson functional matrix factorization — the flagship example.

Mirrors the reference examples/poisson_tensor_filtering.py:1-340: piecewise
constant nonnegative truth; NMF / PGDS(tau grid, optional apf) / NB-BTF /
constrained-Poisson-BTF model comparison on 9 metrics including held-out
NLL and posterior coverage; positivity (and optionally monotone)
constraints enforced through GASS.

Usage: python poisson_tensor_filtering.py <nembeds> <seed> [agg]
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import gammaln

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functionalmf_tpu import (
    ConstrainedNonconjugateBayesianTensorFiltering,
    NegativeBinomialBayesianTensorFiltering,
)
from functionalmf_tpu.utils import mse, mae, ilogit, tensor_nmf, coverage_at

nrows, ncols, ndepth = 11, 12, 20
nreplicates = 1


def rowcol_loglikelihood(Y, WV, W, V, row=None, col=None):
    # jax-traceable analog of the reference's rowcol_loglikelihood
    # (poisson example:25-36)
    if row is not None:
        Y = Y[row]
    if col is not None:
        Y = Y[:, col]
    if Y.ndim > WV.ndim:
        WV = WV[..., None]
    rate = jnp.clip(WV, 1e-8, None)
    Y0 = jnp.where(jnp.isnan(Y), 0.0, Y)
    ll = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.0)
    return jnp.sum(jnp.where(jnp.isnan(Y), 0.0, ll))


def rowcol_cellfn(y, tau):
    # the ONE extra likelihood contract: elementwise Poisson cell loglik,
    # 0 on NaN, y-only terms omitted (they cancel in the GASS slice test).
    # The framework derives loglikelihood_cells (red-black schedule) and
    # loglikelihood_block (sequential blocked schedule) from it
    # (models/constrained.py:_cells_from_cellfn) — round 4 hand-wrote all
    # three variants of this same likelihood.
    rate = jnp.clip(tau, 1e-8, None)
    y0 = jnp.where(jnp.isnan(y), 0.0, y)
    return jnp.where(jnp.isnan(y), 0.0, y0 * jnp.log(rate) - rate)


def init_model(nembeds, tf_order=0, lam2=0.1, sigma2=0.5, monotone=False,
               seed=0, **kwargs):
    # poisson example:38-56 (no shared-memory cleanup needed here)
    Constraints = np.concatenate([np.eye(ndepth), np.zeros((ndepth, 1))], axis=1)
    if monotone:
        C_mono = np.array([np.concatenate([np.zeros(i), [1, -1],
                                           np.zeros(ndepth - i - 2), [-1e-2]])
                           for i in range(ndepth - 1)])
        Constraints = np.concatenate([Constraints, C_mono], axis=0)
    return ConstrainedNonconjugateBayesianTensorFiltering(
        nrows, ncols, ndepth, rowcol_loglikelihood, Constraints,
        nembeds=nembeds, tf_order=tf_order, sigma2_init=sigma2,
        lam2_init=lam2, seed=seed,
        loglikelihood_cellfn=rowcol_cellfn, **kwargs)


def setup_sampler(model, Y, monotone=False, rng=None):
    # poisson example:58-81: NMF warm start + hyperparam re-init
    nmf_W, nmf_V = tensor_nmf(Y, model.nembeds, monotone=monotone, rng=rng)
    model.W = nmf_W
    model.V = nmf_V
    model._init_lam2()
    model._init_Tau2()
    model._init_sigma2()


def create_piecewise_constant(rng, break_prob=0.2, ndims=3):
    # poisson example:83-95
    W = rng.gamma(1, 1, size=(nrows, ndims))
    if nrows > 1:
        W[np.triu_indices(ndims, k=1)] = 0
    V = np.zeros((ncols, ndepth, ndims))
    for j in range(ncols):
        V[j, -1] = rng.gamma(1, 1, size=ndims)
        for k in range(ndepth - 2, -1, -1):
            V[j, k] = V[j, k + 1]
            if rng.random() < break_prob:
                V[j, k] += rng.gamma(1, 1, size=ndims)
    return W, V


def _poisson_nll(Y, rate):
    from scipy.stats import poisson as _poisson
    with np.errstate(all="ignore"):
        return -np.nansum(_poisson.logpmf(Y, np.clip(rate, 1e-10, None)))


METRICS = [
    {"name": "MAE (held out)", "fun": lambda Y, Mu, pred, samples: mae(Y[:3, :3], pred[:3, :3, ..., None])},
    {"name": "RMSE (held out)", "fun": lambda Y, Mu, pred, samples: np.sqrt(mse(Y[:3, :3], pred[:3, :3, ..., None]))},
    {"name": "NLL (held out)", "fun": lambda Y, Mu, pred, samples: _poisson_nll(Y[:3, :3], pred[:3, :3, ..., None])},
    {"name": "MAE (true rate)", "fun": lambda Y, Mu, pred, samples: mae(Mu, pred)},
    {"name": "RMSE (true rate)", "fun": lambda Y, Mu, pred, samples: np.sqrt(mse(Mu, pred))},
    {"name": "50% Coverage", "fun": lambda Y, Mu, pred, samples: coverage_at(Mu, samples, 50)},
    {"name": "75% Coverage", "fun": lambda Y, Mu, pred, samples: coverage_at(Mu, samples, 75)},
    {"name": "90% Coverage", "fun": lambda Y, Mu, pred, samples: coverage_at(Mu, samples, 90)},
    {"name": "95% Coverage", "fun": lambda Y, Mu, pred, samples: coverage_at(Mu, samples, 95)},
]


def agg_results(models, metrics, nembeds_options=(2, 3, 5, 10),
                seeds=(1, 2, 3, 4, 5)):
    # multi-seed aggregation mode (reference poisson example:123-143)
    aggregate = {ne: [] for ne in nembeds_options}
    for seed in seeds:
        for ne in nembeds_options:
            outdir = os.path.join("data/poisson_tensor_filtering/",
                                  "seed{}-nembeds{}".format(seed, ne))
            aggregate[ne].append(np.load(os.path.join(outdir, "results.npy")))
    for ne in nembeds_options:
        print("d={}".format(ne))
        res = np.array(aggregate[ne]).mean(axis=0)
        names = list(models)
        if res.shape[1] < len(names):
            # runs without the optional apf package skip the PGDS arms
            names = [m for m in names if not m.startswith("PGDS")]
        print(("{:<18}" * (len(metrics) + 1)).format(
            *(["Model"] + [m["name"] for m in metrics])))
        for i, m in enumerate(names):
            print("{:<18}".format(m)
                  + "".join("{:<18.2f}".format(r) for r in res[:, i]))


PGDS_TAUS = (0.25, 0.5, 1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "agg":
        agg_results(["NMF"] + [f"PGDS tau={t}" for t in PGDS_TAUS]
                    + ["NB-BTF", "Poisson-BTF"], METRICS)
        sys.exit(0)
    nembeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    nburn, nthin, nsamples = 5000, 5, 1000
    if os.environ.get("FAST"):
        nburn, nthin, nsamples = 1000, 2, 500

    rng = np.random.default_rng(seed)
    W_true, V_true = create_piecewise_constant(rng)
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    Y = rng.poisson(Mu[..., None], size=(nrows, ncols, ndepth, nreplicates)).astype(float)
    Y_missing = Y.copy()
    Y_missing[:3, :3] = np.nan

    print("Seed {} d={}".format(seed, nembeds))
    models = []

    # NMF baseline (poisson example:197-200)
    W_nmf, V_nmf = tensor_nmf(Y_missing, nembeds, rng=rng)
    Mu_nmf = (W_nmf[:, None, None] * V_nmf[None]).sum(axis=-1)
    models.append({"name": "NMF", "fit": Mu_nmf, "samples": Mu_nmf[None]})

    # PGDS baseline arms over the reference's tau grid (poisson
    # example:204-218). fit_pgds defaults to the native from-paper backend
    # (models/pgds.py), so the arms always run; apf is only an optional
    # cross-check backend.
    from functionalmf_tpu.pgds import fit_pgds
    for tau in PGDS_TAUS:
        print(f"Fitting PGDS k={nembeds} tau={tau}")
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            Mu_pgds, _ = fit_pgds(Y_missing.sum(axis=-1), nembeds,
                                  nburn=nburn, nthin=nthin,
                                  nsamples=nsamples, tau=tau, nthreads=1)
        Mu_pgds = np.asarray(Mu_pgds)
        models.append({"name": f"PGDS tau={tau}",
                       "fit": Mu_pgds.mean(axis=0) / Y_missing.shape[-1],
                       "samples": Mu_pgds})

    # NB-BTF (poisson example:224-244)
    nb = NegativeBinomialBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=nembeds, tf_order=0,
        sigma2_init=1, lam2_init=0.1, seed=seed)
    res = nb.run_gibbs(Y_missing, nburn=nburn, nthin=nthin, nsamples=nsamples,
                       print_freq=1000, verbose=True)
    Ps = ilogit(np.clip(np.einsum("znk,zmtk->znmt", res["W"], res["V"]), -10, 10))
    Mu_nb = res["R"] * Ps / (1 - Ps)
    models.append({"name": "NB-BTF", "fit": Mu_nb.mean(0), "samples": Mu_nb})

    # Constrained Poisson BTF (poisson example:247-277)
    model = init_model(nembeds, seed=seed)
    setup_sampler(model, Y_missing, rng=rng)
    results = model.run_gibbs(Y_missing, nburn=nburn, nthin=nthin,
                              nsamples=nsamples, print_freq=1000, verbose=True)
    model.shutdown()
    Mu_hat = np.einsum("znk,zmtk->znmt", results["W"], results["V"])
    models.append({"name": "Poisson-BTF", "fit": Mu_hat.mean(0), "samples": Mu_hat})

    nmetrics = len(METRICS)
    metric_results = np.zeros((nmetrics, len(models)))
    print(("{:<18}" * (nmetrics + 1)).format(*(["Model"] + [m["name"] for m in METRICS])))
    for mi, m in enumerate(models):
        vals = [metric["fun"](Y, Mu, m["fit"], m["samples"]) for metric in METRICS]
        metric_results[:, mi] = vals
        print("{:<18}".format(m["name"])
              + "".join("{:<18.2f}".format(v) for v in vals))

    # persist for the multi-seed `agg` mode (reference poisson:285-293)
    outdir = os.path.join("data/poisson_tensor_filtering/",
                          "seed{}-nembeds{}".format(seed, nembeds))
    os.makedirs(outdir, exist_ok=True)
    np.save(os.path.join(outdir, "results"), metric_results)
