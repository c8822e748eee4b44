"""NegBinom coverage experiment (VERDICT.md item 10).

The round-1 NB example reported posterior coverage far below nominal; the
claimed cause was the reference's R > 1 acceptance gate (factor.py:547,
marked TEMP upstream; exposed here as `r_min`): the generating process
draws per-row dispersions R < 1 routinely, and a gate at 1 biases R (and
hence Mu = R P/(1-P)) for those rows. This script settles it by running
the NB example's exact generator under three samplers:

  gate(r_min=1)  — reference parity (the round-1 default)
  free(r_min=0)  — same sampler, gate removed
  R_true         — dispersion fixed at the generating values (oracle)

and reporting 50/75/90/95% coverage of the true rate + held-out RMSE for
each, multi-seed. Writes bench/nb_coverage.json.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from functionalmf_tpu import NegativeBinomialBayesianTensorFiltering
from functionalmf_tpu.utils import ilogit, mse, coverage_at

nrows, ncols, ndepth, nembeds = 11, 12, 20, 3


def create_piecewise_constant(rng, break_prob=0.2):
    W = rng.gamma(1, 1, size=(nrows, nembeds))
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
    return R, P, Mu


def run(seed, variant, nburn, nsamples):
    rng = np.random.default_rng(seed)
    R_true, P_true, Mu = create_piecewise_constant(rng)
    Y = rng.poisson(rng.gamma(np.maximum(R_true[..., None], 1e-6),
                              (P_true / (1 - P_true))[..., None],
                              size=(nrows, ncols, ndepth, 1))).astype(float)
    Y_missing = Y.copy()
    Y_missing[:3, :3] = np.nan

    kwargs = dict(nembeds=nembeds, tf_order=2, sigma2_init=0.5,
                  lam2_init=0.1, rdims=(1, 2), seed=seed)
    if variant == "gate":
        kwargs["r_min"] = 1.0
    elif variant == "free":
        kwargs["r_min"] = 0.0
    elif variant == "oracle":
        # R = Mu^2/(Var-Mu) = 1/g_n is constant across (col, depth); the
        # model stores it at the rdims-aggregated shape (nrows, 1, 1)
        kwargs["R_true"] = R_true[:, :1, :1]
    model = NegativeBinomialBayesianTensorFiltering(nrows, ncols, ndepth,
                                                    **kwargs)
    res = model.run_gibbs(Y_missing, nburn=nburn, nthin=1,
                          nsamples=nsamples, verbose=False)
    Ps = ilogit(np.clip(np.einsum("znk,zmtk->znmt", res["W"], res["V"]),
                        -10, 10))
    Rs = res["R"] if "R" in res else np.broadcast_to(
        R_true, (len(Ps),) + R_true.shape)
    Mu_hat = Rs * Ps / (1 - Ps)
    out = {"rmse_heldout": float(np.sqrt(mse(Mu[:3, :3],
                                             Mu_hat.mean(0)[:3, :3])))}
    for lvl in (50, 75, 90, 95):
        out[f"cov{lvl}"] = float(coverage_at(Mu, Mu_hat, lvl))
    frac_r_below_1 = float((R_true < 1).mean())
    out["frac_true_R_below_1"] = frac_r_below_1
    return out


def main():
    nburn = int(os.environ.get("NB_BURN", "10000"))
    nsamples = int(os.environ.get("NB_SAMPLES", "2000"))
    seeds = [int(s) for s in os.environ.get("NB_SEEDS", "1,2,3").split(",")]
    results = {}
    for variant in ("gate", "free", "oracle"):
        rows = [run(seed, variant, nburn, nsamples) for seed in seeds]
        agg = {k: round(float(np.mean([r[k] for r in rows])), 3)
               for k in rows[0]}
        results[variant] = {"per_seed": rows, "mean": agg}
        print(variant, json.dumps(agg))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "nb_coverage.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
