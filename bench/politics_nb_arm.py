"""NB-BTF arm of the politics benchmark on the real GDELT split.

The reference keeps this variant commented out (politics/benchmark.py:
139-158, rdims=(0,1,2), Mu = R P/(1-P)) and records only the qualitative
claim that NB-BTF is "unstable for held out curves" (politics/README.md:
6-14). This driver fits it at the full reference config on the real
pair-holdout and emits the same per-draw metric rows as the main
benchmark so the claim can be checked quantitatively.

Usage: python bench/politics_nb_arm.py [--nburn 10000 --nthin 10
       --nsamples 1000] ; writes bench/politics_nb.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from functionalmf_tpu import NegativeBinomialBayesianTensorFiltering
from functionalmf_tpu.apps.politics.benchmark import load_data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/root/reference/politics")
    ap.add_argument("--nembeds", type=int, default=5)
    ap.add_argument("--nburn", type=int, default=10000)
    ap.add_argument("--nthin", type=int, default=10)
    ap.add_argument("--nsamples", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--r-min", type=float, default=1.0,
                    help="reference's TEMP R>1 gate (factor.py:547); "
                         "0 disables it")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "politics_nb.json"))
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    Y, Y_train, _ = load_data(args.data_dir, rng)
    nrows, ncols, ndepth = Y.shape

    model = NegativeBinomialBayesianTensorFiltering(
        nrows, ncols, ndepth, nembeds=args.nembeds, tf_order=2,
        sigma2_init=0.5, lam2_init=0.1, nu2_init=1, rdims=(0, 1, 2),
        r_min=args.r_min, seed=args.seed)
    t0 = time.time()
    res = model.run_gibbs(Y_train, nburn=args.nburn, nthin=args.nthin,
                          nsamples=args.nsamples, print_freq=1000,
                          verbose=True)
    wall_min = (time.time() - t0) / 60

    psi = np.clip(np.einsum("znk,zmtk->znmt", res["W"], res["V"]), -10, 10)
    P = 1.0 / (1.0 + np.exp(-psi))
    Rs = res["R"].reshape(res["R"].shape[0], 1, 1, 1)
    Mu = Rs * P / (1 - P)

    from scipy.stats import poisson
    is_missing = np.isnan(Y)
    is_held_out = (~is_missing) & np.isnan(Y_train)
    is_in_sample = (~is_missing) & (~is_held_out)

    def metrics(mask):
        r = np.sqrt(np.mean((Y[None, mask] - Mu[:, mask]) ** 2,
                            axis=-1)).mean()
        m = np.mean(np.abs(Y[None, mask] - Mu[:, mask]), axis=-1).mean()
        with np.errstate(all="ignore"):
            ll = poisson.logpmf(Y[None, mask],
                                np.clip(Mu[:, mask], 1e-8, None)
                                ).mean(axis=-1).mean()
        return dict(rmse=float(r), mae=float(m), ll=float(ll))

    out = {"config": vars(args), "wall_min": round(wall_min, 1),
           "R_mean": float(res["R"].mean()),
           "in": metrics(is_in_sample), "out": metrics(is_held_out)}
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
