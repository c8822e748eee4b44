"""Google Flu Trends dataset preparation (reference
flutrends/create_datasets.py:1-40): state-level slice of flu_US.mat, with
~10% of (state, year) spans held out.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.io import loadmat, savemat


def create(flu_mat, outdir, seed=42):
    rng = np.random.default_rng(seed)
    df = loadmat(flu_mat)
    data = df["data"][:, 1:51]  # state columns only
    names = df["USnames"][1:51]
    dates = df["dates"]

    years = np.array([int(x[0][0][:4]) for x in dates])
    has_week = ~np.isnan(data)
    state_idx, year_start, year_end = [], [], []
    for yr in range(years.min(), years.max() + 1):
        has_year = np.any(has_week[years == yr], axis=0)
        sel = np.arange(data.shape[1])[has_year]
        state_idx.extend(sel)
        year_start.extend([np.arange(years.shape[0])[years == yr][0]] * has_year.sum())
        year_end.extend([np.arange(years.shape[0])[years == yr][-1] + 1] * has_year.sum())
    indices = np.array([state_idx, year_start, year_end]).T
    to_hold = indices[rng.choice(indices.shape[0], replace=False,
                                 size=int(np.ceil(indices.shape[0] * 0.1)))]
    train = data.copy()
    for i, j, k in to_hold:
        train[j:k, i] = np.nan

    os.makedirs(outdir, exist_ok=True)
    savemat(os.path.join(outdir, "flu_US_states.mat"),
            {"data": data, "USnames": names, "dates": dates})
    savemat(os.path.join(outdir, "flu_US_states_train.mat"),
            {"data": train, "USnames": names, "dates": dates})
    np.save(os.path.join(outdir, "held_out_years"), to_hold)
    return data, train, to_hold


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--flu-mat", default="/root/reference/flutrends/flu_US.mat")
    p.add_argument("--outdir", default=".")
    p.add_argument("--seed", type=int, default=42)
    a = p.parse_args()
    create(a.flu_mat, a.outdir, a.seed)
