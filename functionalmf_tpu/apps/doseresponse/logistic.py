"""Functional logistic matrix factorization baseline for dose-response.

Reimplements the reference doseresponse/logistic.py:1-190: models
E[Y_ijt] = ilogit(<w_i, v_j> * conc_t + a_i + b_j) via SLSQP alternating
least squares with CV'd embedding-dimension selection.
"""
from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np

from functionalmf_tpu.utils import ilogit, mse


def estimate_likelihood(df, verbose=False):
    """Control-normalized clipped mean tensor (reference logistic.py:6-40)."""
    cells = list(df["cell line"].unique())
    drugs = list(df["drug"].unique())
    concentrations = [c for c in sorted(df["concentration"].unique())
                      if not np.isnan(c)]
    outcomes = defaultdict(list)
    controls = defaultdict(list)
    cell_idx = {c: i for i, c in enumerate(cells)}
    drug_idx = {d: i for i, d in enumerate(drugs)}
    conc_idx = {c: i for i, c in enumerate(concentrations)}
    for cell_name, drug_name, conc, outcome in zip(
            df["cell line"], df["drug"], df["concentration"], df["outcome"]):
        if np.isnan(conc):
            controls[(cell_idx[cell_name], drug_idx[drug_name])].append(outcome)
        else:
            outcomes[(cell_idx[cell_name], drug_idx[drug_name],
                      conc_idx[conc])].append(outcome)

    Y = np.full((len(cells), len(drugs), len(concentrations)), np.nan)
    for cell in range(len(cells)):
        for drug in range(len(drugs)):
            if (cell, drug) not in controls:
                continue
            mu = np.mean(controls[(cell, drug)])
            for t in range(len(concentrations)):
                obs = outcomes.get((cell, drug, t), [])
                if obs:
                    Y[cell, drug, t] = np.clip(np.mean(obs) / mu, 0, 1)
    return Y, cells, drugs, concentrations


def fit_logistic_factors(Y, nembeds, max_steps=100, concentrations=None,
                         verbose=False, tol=1e-4, regularizer=1e-4, rng=None):
    """Fit E[Y_ijt] = ilogit(<w_i, v_j> conc_t + a_i + b_j).

    Capability parity with reference doseresponse/logistic.py:42-91, but a
    different algorithm: instead of alternating per-row / per-column SLSQP
    subproblems, ALL parameters are fit jointly by one bounded L-BFGS-B run
    with an analytic vectorized gradient — one solver call over (n + m) *
    (k + 1) parameters replaces n + m SLSQP calls per ALS step. Parameter
    box bounds [-10, 10] and the L2 regularization (on the mean squared
    parameter) match the reference's subproblem setup.
    """
    from scipy.optimize import minimize
    rng = np.random.default_rng() if rng is None else rng
    n, m, T = Y.shape
    k = int(nembeds)
    if concentrations is None:
        concentrations = np.arange(T)
    conc = np.asarray(concentrations, dtype=float)

    obs = ~np.isnan(Y)
    Yz = np.where(obs, Y, 0.0)
    nparams = (n + m) * (k + 1)
    sizes = (n * k, m * k, n, m)
    splits = np.cumsum(sizes)[:-1]

    def unpack(x):
        Wf, Vf, a, b = np.split(x, splits)
        return Wf.reshape(n, k), Vf.reshape(m, k), a, b

    def logits(W, V, a, b):
        s = W @ V.T                                   # (n, m)
        return (s[:, :, None] * conc[None, None, :]
                + a[:, None, None] + b[None, :, None])

    def value_and_grad(x):
        W, V, a, b = unpack(x)
        z = logits(W, V, a, b)
        p = ilogit(z)
        r = np.where(obs, p - Yz, 0.0)                # (n, m, T)
        loss = float((r * r)[obs].sum()) + regularizer * (x * x).mean()
        gz = 2.0 * r * p * (1.0 - p)                  # dloss/dz
        gs = gz @ conc                                # (n, m): sum_t gz c_t
        gW = gs @ V
        gV = gs.T @ W
        ga = gz.sum(axis=(1, 2))
        gb = gz.sum(axis=(0, 2))
        g = np.concatenate([gW.ravel(), gV.ravel(), ga, gb])
        g += regularizer * 2.0 * x / nparams
        return loss, g

    x0 = np.concatenate([
        rng.normal(0, 0.1, size=n * k),
        rng.normal(0, 0.1, size=m * k),
        rng.normal(size=n),
        rng.normal(size=m),
    ])
    res = minimize(value_and_grad, x0, jac=True, method="L-BFGS-B",
                   bounds=[(-10, 10)] * nparams,
                   options={"maxiter": 200 * max_steps, "ftol": tol * 1e-6})
    if verbose:
        print(f"logistic MF: {res.nit} L-BFGS iters, loss {res.fun:.5f}")
    W, V, a, b = unpack(res.x)
    Mu = ilogit(logits(W, V, a, b))
    return Mu, W, V, a, b


def select_nonempty(Y, nholdout, rng=None):
    """Holdout selection avoiding empty rows/columns (logistic.py:94-107)."""
    rng = np.random.default_rng() if rng is None else rng
    options = [idx for idx in np.ndindex(Y.shape[:2])
               if not np.all(np.isnan(Y[idx]))]

    def pick():
        sel = np.array([options[i] for i in
                        rng.choice(len(options), replace=False, size=nholdout)])
        Yc = Y.copy()
        Yc[sel[:, 0], sel[:, 1]] = np.nan
        bad = (np.any(np.all(np.isnan(Yc), axis=(1, 2)))
               | np.any(np.all(np.isnan(Yc), axis=(0, 2))))
        return sel, Yc, bad

    sel, Yc, bad = pick()
    while bad:
        sel, Yc, bad = pick()
    return sel, Yc


def main(argv=None):
    import pandas as pd
    parser = argparse.ArgumentParser(
        description="Functional logistic MF for dose-response modeling.")
    parser.add_argument("--data", default="doseresponse/data/sim/data.csv")
    parser.add_argument("--outdir", default="doseresponse/data/sim/")
    parser.add_argument("--nembeds", nargs="+", type=int, default=[1, 3, 5, 8])
    parser.add_argument("--nfolds", type=int, default=5)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--nholdout", type=int, default=0)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    df = pd.read_csv(args.data, header=0)
    Y, cells, drugs, concentrations = estimate_likelihood(df)
    nrows, ncols, ndepth = Y.shape
    print("Y shape: {}".format(Y.shape))

    if args.nholdout > 0:
        Y_full = Y.copy()
        held_out, Y = select_nonempty(Y, args.nholdout, rng=rng)

    print("Selecting nembeds via CV")
    folds = [((f * nrows // args.nfolds, (f + 1) * nrows // args.nfolds),
              (f * ncols // args.nfolds, (f + 1) * ncols // args.nfolds))
             for f in range(args.nfolds)]
    cv_results = np.zeros((args.nfolds, len(args.nembeds)))
    for fold_idx, fold in enumerate(folds):
        Y_cv = Y.copy()
        Y_cv[fold[0][0]:fold[0][1], fold[1][0]:fold[1][1]] = np.nan
        for k_idx, k in enumerate(args.nembeds):
            Mu_cv, *_ = fit_logistic_factors(Y_cv, k,
                                             concentrations=concentrations,
                                             rng=rng)
            cv_results[fold_idx, k_idx] = mse(
                Y[fold[0][0]:fold[0][1], fold[1][0]:fold[1][1]],
                Mu_cv[fold[0][0]:fold[0][1], fold[1][0]:fold[1][1]])
    best_k = args.nembeds[int(np.argmin(cv_results.mean(axis=0)))]
    print("Best K: {}".format(best_k))

    Mu_logistic, W, V, a, b = fit_logistic_factors(
        Y, best_k, concentrations=concentrations, rng=rng)

    os.makedirs(args.outdir, exist_ok=True)
    np.save(os.path.join(args.outdir, "y_logistic"), Y)
    np.save(os.path.join(args.outdir, "W_logistic"), W)
    np.save(os.path.join(args.outdir, "V_logistic"), V)
    np.save(os.path.join(args.outdir, "a_logistic"), a)
    np.save(os.path.join(args.outdir, "b_logistic"), b)
    np.save(os.path.join(args.outdir, "logistic_mf"), Mu_logistic)


if __name__ == "__main__":
    main()
