"""Binomial functional matrix factorization example.

Mirrors the reference examples/binomial_tensor_filtering.py:1-113: logistic
link on the wiggly truth, (Y, N) tuple data with N=10 trials per cell.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functionalmf_tpu import BinomialBayesianTensorFiltering
from functionalmf_tpu.utils import ilogit, mae, mse, coverage_at

nrows, ncols, ndepth = 11, 12, 20
nembeds = 3
nreplicates = 10


def init_model(tf_order=2, lam2=0.1, sigma2=0.5, seed=0):
    # reference example:20-25
    return BinomialBayesianTensorFiltering(nrows, ncols, ndepth,
                                           nembeds=nembeds, tf_order=tf_order,
                                           sigma2_init=sigma2,
                                           lam2_init=lam2, seed=seed)


def create_wiggly_with_jumps(rng, break_prob=0.3):
    # reference example:27-43 (coef scale 0.1 in the binomial variant)
    W = rng.normal(0, 1, size=(nrows, nembeds))
    if nrows > 1:
        W[np.triu_indices(nembeds, k=1)] = 0
    V = np.zeros((ncols, ndepth, nembeds))
    for j in range(ncols):
        x = rng.normal(0, 1, size=nembeds)
        coef = rng.normal(0, 0.1)
        V[j, -1] = x
        for k in range(ndepth - 2, -1, -1):
            V[j, k] = V[j, k + 1]
            if rng.random() < break_prob:
                coef = rng.normal(0, 0.1)
                x = rng.normal(0, 1, size=nembeds)
            V[j, k] += coef * x
    return W, V


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    nburn, nthin, nsamples = 10000, 10, 1000
    if os.environ.get("FAST"):
        nburn, nthin, nsamples = 1000, 1, 500
    rng = np.random.default_rng(seed)

    model = init_model(seed=seed)
    W_true, V_true = create_wiggly_with_jumps(rng)
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    print("Mean ranges: [{},{}]".format(Mu.min(), Mu.max()))

    N = np.full((nrows, ncols, ndepth), nreplicates).astype(float)
    Y = rng.binomial(nreplicates, ilogit(Mu)).astype(float)

    Y_missing = Y.copy()
    Y_missing[:3, :3] = np.nan
    N_missing = N.copy()
    N_missing[np.isnan(Y_missing)] = np.nan

    results = model.run_gibbs((Y_missing, N_missing), nburn=nburn, nthin=nthin,
                              nsamples=nsamples, print_freq=50, verbose=True)
    Ws, Vs = results["W"], results["V"]

    P_hat = ilogit(np.clip(np.einsum("znk,zmtk->znmt", Ws, Vs), -10, 10))
    P_true = ilogit(Mu)
    print("held-out MAE(P):  {:.4f}".format(mae(P_true[:3, :3], P_hat.mean(0)[:3, :3])))
    print("held-out RMSE(P): {:.4f}".format(np.sqrt(mse(P_true[:3, :3], P_hat.mean(0)[:3, :3]))))
    print("90% coverage(P):  {:.1f}%".format(coverage_at(P_true, P_hat, 90)))
