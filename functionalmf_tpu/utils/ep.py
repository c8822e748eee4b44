"""Expectation-propagation (forward-KL Gaussian) approximation helpers.

Host-side reimplementation of grid_ep_approx and ep_from_mf
(reference functionalmf/utils.py:126-190, 423-438), used to center the GASS
proposal in the constrained models (factor.py:899, doseresponse/fit.py:166).
"""
from __future__ import annotations

import numpy as np

__all__ = ["grid_ep_approx", "ep_from_mf"]


def grid_ep_approx(likelihood, ngrid=100, x_min=0, x_max=1, tol=1e-4,
                   min_space=1e-3, max_refinements=1000):
    """Adaptive-grid Gaussian moment match of a 1-D likelihood
    (utils.py:126-190). Returns (mu, sigma)."""
    grid = np.linspace(x_min, x_max, ngrid)
    probs = likelihood(grid)
    probs = probs / probs.sum()
    upper, lower = x_max, x_min

    refinements = 0
    while probs.min() < tol and refinements < max_refinements:
        refinements += 1
        to_remove = int(np.argmin(probs))
        to_split = int(np.argmax(probs))

        if grid[to_split] == x_max:
            to_add = [(grid[to_split - 1] + grid[to_split]) / 2, grid[to_split]]
        elif grid[to_split] == x_min:
            to_add = [grid[to_split], (grid[to_split] + grid[to_split + 1]) / 2]
        elif to_split == ngrid - 1:
            to_add = np.linspace(grid[to_split - 1], upper, 4)[1:3]
        elif to_split == 0:
            to_add = np.linspace(lower, grid[to_split + 1], 4)[1:3]
        else:
            to_add = np.linspace(grid[to_split - 1], grid[to_split + 1], 4)[1:3]

        if to_remove == 0:
            lower = grid[to_remove] + min_space
        elif to_remove == ngrid - 1:
            upper = grid[to_remove] - min_space

        grid = np.delete(grid, [to_remove, to_split])
        if to_remove > to_split:
            to_split -= 1
        to_split = min(to_split, len(grid))
        grid = np.insert(grid, to_split, to_add)
        probs = likelihood(grid)
        probs = probs / probs.sum()

    mu = (probs * grid).sum()
    sigma = np.sqrt((probs * (grid - mu) ** 2).sum())
    return mu, sigma


def ep_from_mf(Y, W, V, mode="max", multiplier=2, verbose=True):
    """Variance-overestimating EP from a matrix-factorization fit
    (utils.py:423-438). Returns (Mu, Sigma) tensors shaped like Y[..., 0]."""
    Y = np.asarray(Y, dtype=float)
    if Y.ndim == 3:
        Y = Y[..., None]
    M = (W[:, None, None] * V[None]).sum(axis=-1, keepdims=True)
    with np.errstate(invalid="ignore"):
        sqerr = np.nanmean((Y - M) ** 2, axis=-1)
        if mode == "max":
            overestimate = np.sqrt(np.nanmax(sqerr))
        elif mode == "multiplier":
            overestimate = np.sqrt(np.nanmean(sqerr)) * multiplier
        else:
            raise ValueError(f"unknown mode {mode!r}")
    if verbose:
        print("Estimated stdev: {}".format(overestimate))
    return M[..., 0], np.ones(Y.shape[:-1]) * overestimate
