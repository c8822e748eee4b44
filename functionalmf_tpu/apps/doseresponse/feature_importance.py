"""Biomarker screening from posterior embeddings.

Reimplements reference doseresponse/feature_importance.py: correlates
posterior feature probabilities W U^T with drug-response AUC (trapezoidal
integral over the curve) via per-(feature, drug) linear regression.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def feature_auc_screen(Ws, Vs, Us, feature_names, drug_names, ntop=10,
                       min_std=0.05, verbose=True):
    """Returns a DataFrame of linregress fits ranked by r-value
    (feature_importance.py:39-63)."""
    import pandas as pd
    from scipy.stats import linregress

    feature_probs = np.einsum("znk,zmk->znm", Ws, Us).mean(axis=0)
    auc_scores = np.trapezoid(
        np.einsum("znk,zmtk->znmt", Ws, Vs),
        dx=1 / (Vs.shape[-2] - 1), axis=-1).mean(axis=0)

    index, fits = [], []
    for fname, x in zip(feature_names, feature_probs.T):
        for dname, y in zip(drug_names, auc_scores.T):
            if x.std() < min_std or y.std() < min_std:
                continue
            index.append((fname, dname))
            fits.append(linregress(x, y))
    fits = pd.DataFrame(
        fits, index=index,
        columns=["slope", "intercept", "r-value", "p-value", "stderr"])
    if verbose and len(fits):
        order = np.argsort(fits["r-value"].values)
        print("Top {} resistant:".format(ntop))
        print(fits.iloc[order[-ntop:][::-1]])
        print()
        print("Top {} sensitive:".format(ntop))
        print(fits.iloc[order[:ntop]])
    return fits


def main(argv=None):
    import pandas as pd
    parser = argparse.ArgumentParser(description="Feature importance screen.")
    parser.add_argument("--outdir", default="doseresponse/data/sim/")
    parser.add_argument("--features", required=True)
    parser.add_argument("--drugs")
    parser.add_argument("--ntop", type=int, default=10)
    args = parser.parse_args(argv)

    features = pd.read_csv(args.features, index_col=0, header=0).columns.values
    drugs = (np.load(os.path.join(args.outdir, "drugs.npy"))
             if args.drugs is None else np.load(args.drugs))
    Ws = np.load(os.path.join(args.outdir, "btf_w.npy"))
    Vs = np.load(os.path.join(args.outdir, "btf_v.npy"))
    Us = np.load(os.path.join(args.outdir, "btf_u.npy"))
    return feature_auc_screen(Ws, Vs, Us, features, drugs, ntop=args.ntop)


if __name__ == "__main__":
    main()
