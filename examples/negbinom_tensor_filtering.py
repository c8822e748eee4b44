"""Negative-Binomial functional matrix factorization example.

Mirrors the reference examples/negbinom_tensor_filtering.py: gamma-Poisson
truth with per-row dispersion, rdims=(1,2), recovery of Mu = R P / (1 - P).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functionalmf_tpu import NegativeBinomialBayesianTensorFiltering
from functionalmf_tpu.utils import ilogit, mae, mse, coverage_at

nrows, ncols, ndepth = 11, 12, 20
nembeds = 3
nreplicates = 1


def init_model(tf_order=2, lam2=0.1, sigma2=0.5, seed=0):
    # reference example:17-27
    return NegativeBinomialBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=nembeds, tf_order=tf_order,
        sigma2_init=sigma2, lam2_init=lam2, rdims=(1, 2), seed=seed)


def create_piecewise_constant(rng, break_prob=0.2):
    # reference example:44-66
    W = rng.gamma(1, 1, size=(nrows, nembeds))
    if nrows > 1:
        W[np.triu_indices(nembeds, k=1)] = 0
    V = np.zeros((ncols, ndepth, nembeds))
    for j in range(ncols):
        V[j, -1] = rng.gamma(1, 1, size=nembeds)
        for k in range(ndepth - 2, -1, -1):
            V[j, k] = V[j, k + 1]
            if rng.random() < break_prob:
                V[j, k] += rng.gamma(1, 1, size=nembeds)
    Mu = np.einsum("nk,mzk->nmz", W, V)
    Variance = rng.gamma(1, scale=1, size=(nrows, 1, 1)) * Mu**2 + Mu
    P = 1 - Mu / Variance
    R = Mu * (1 - P) / P
    return R, P, Mu, Variance


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    nburn, nthin, nsamples = 10000, 1, 2000
    if os.environ.get("FAST"):
        nburn, nthin, nsamples = 1000, 1, 500
    rng = np.random.default_rng(seed)

    model = init_model(seed=seed)
    R_true, P_true, Mu_true, Var_true = create_piecewise_constant(rng)
    Mu = R_true * P_true / (1 - P_true)

    Y = rng.poisson(rng.gamma(np.maximum(R_true[..., None], 1e-6),
                              (P_true / (1 - P_true))[..., None],
                              size=(nrows, ncols, ndepth, nreplicates))).astype(float)
    Y_missing = Y.copy()
    Y_missing[:3, :3] = np.nan

    results = model.run_gibbs(Y_missing, nburn=nburn, nthin=nthin,
                              nsamples=nsamples, print_freq=100, verbose=True)
    Ws, Vs, Rs = results["W"], results["V"], results["R"]

    Ps = ilogit(np.clip(np.einsum("znk,zmtk->znmt", Ws, Vs), -10, 10))
    Mu_hat = Rs * Ps / (1 - Ps)
    print("held-out MAE:  {:.4f}".format(mae(Mu[:3, :3], Mu_hat.mean(0)[:3, :3])))
    print("held-out RMSE: {:.4f}".format(np.sqrt(mse(Mu[:3, :3], Mu_hat.mean(0)[:3, :3]))))
    print("90% coverage:  {:.1f}%".format(coverage_at(Mu, Mu_hat, 90)))
