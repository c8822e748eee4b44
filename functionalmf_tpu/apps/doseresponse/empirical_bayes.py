"""Empirical-Bayes likelihood estimation for dose-response data.

Reimplements the reference doseresponse/empirical_bayes.py:1-143 with a
JAX-traceable mixture likelihood: GammaGridLikelihood.logpdf runs inside
the jitted GASS sweep (the reference instead read the data out of shared
memory in worker processes, fit.py:20-38).

The Poisson histogram GLM (reference lines 94-105 via statsmodels) is a
4-parameter polynomial Poisson regression; it is fit here with a small
Newton/IRLS loop (statsmodels is not a dependency).
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import logsumexp, gammaln

__all__ = ["GammaGridLikelihood", "estimate_likelihood", "poisson_glm_fit"]


class GammaGridLikelihood:
    """Gamma mixture over a grid of initial-population means
    (reference empirical_bayes.py:9-36), jax-traceable.

    logpdf(y, effect) mixes Gamma(shape_g, scale_g * effect) over grid
    components g, where shape/scale are chosen so each component has mean
    mean_grid[g] * effect and the given variance.
    """

    def __init__(self, mean_grid, mean_probs, variance):
        mean_grid = np.asarray(mean_grid, dtype=np.float64)
        self.shape_grid = jnp.asarray(mean_grid**2 / variance, jnp.float32)
        self.scale_grid = jnp.asarray(variance / mean_grid, jnp.float32)
        self.probs_grid = jnp.asarray(np.asarray(mean_probs), jnp.float32)

    def logpdf(self, y, effect):
        """y: (..., R) replicates; effect: (...) or (..., 1). NaN-masked.

        Mirrors reference empirical_bayes.py:15-31: sum Gamma logpdfs over
        replicates per mixture component, then logsumexp over components.
        """
        y = jnp.asarray(y)
        effect = jnp.asarray(effect)
        shapes = self.shape_grid          # (G,)
        scales = self.scale_grid          # (G,)
        yg = y[..., None]                 # (..., R, G)
        eg = effect[..., None]            # (..., 1, G) after broadcast below
        while eg.ndim < yg.ndim:
            eg = eg[..., None, :]
        scale = jnp.clip(scales * eg, 1e-12, None)
        y_safe = jnp.clip(jnp.where(jnp.isnan(yg), 1.0, yg), 1e-12, None)
        comp = ((shapes - 1.0) * jnp.log(y_safe) - y_safe / scale
                - gammaln(shapes) - shapes * jnp.log(scale))
        comp = jnp.where(jnp.isnan(yg), 0.0, comp)
        comp = jnp.sum(comp, axis=-2)      # over replicates: (..., G)
        return logsumexp(comp, b=self.probs_grid, axis=-1)

    def sample(self, effect, size=1, rng=None):
        """Posterior-predictive sampling (reference empirical_bayes.py:33-36)."""
        rng = np.random.default_rng() if rng is None else rng
        probs = np.asarray(self.probs_grid)
        idx = rng.choice(probs.shape[0], size=size, p=probs / probs.sum())
        shapes = np.asarray(self.shape_grid)[idx]
        scales = np.asarray(self.scale_grid)[idx]
        return rng.gamma(shapes, scales * np.asarray(effect))


def poisson_glm_fit(counts, K=3, max_iter=100, tol=1e-10):
    """K-th order polynomial Poisson regression via Newton/IRLS
    (stand-in for statsmodels GLM at reference empirical_bayes.py:97-105).
    Returns fitted values exp(X beta)."""
    counts = np.asarray(counts, dtype=float)
    X = np.array([np.arange(len(counts)) ** k for k in range(K + 1)], dtype=float).T
    # standardize columns for stable Newton steps
    norms = np.linalg.norm(X, axis=0)
    Xs = X / norms
    beta = np.zeros(K + 1)
    beta[0] = np.log(counts.mean() + 1e-6) * norms[0] / X.shape[0] ** 0  # rough start
    beta = np.linalg.lstsq(Xs, np.log(counts + 0.5), rcond=None)[0]
    for _ in range(max_iter):
        eta = Xs @ beta
        mu = np.exp(np.clip(eta, -30, 30))
        grad = Xs.T @ (counts - mu)
        H = Xs.T @ (Xs * mu[:, None]) + 1e-10 * np.eye(K + 1)
        step = np.linalg.solve(H, grad)
        beta_new = beta + step
        if np.max(np.abs(step)) < tol:
            beta = beta_new
            break
        beta = beta_new
    return np.exp(np.clip(Xs @ beta, -30, 30))


def estimate_likelihood(df, nbins=50, control_mean=1, tensor_outcomes=False,
                        plot=False, verbose=True):
    """Empirical-Bayes construction (reference empirical_bayes.py:39-137):
    control renormalization, no-effect first-dose mean harvesting, Poisson
    histogram prior, symmetrized grid. Returns
    (outcomes, likelihood, cells, drugs, concentrations, controls)."""
    cells = list(df["cell line"].unique())
    drugs = list(df["drug"].unique())
    concentrations = [c for c in sorted(df["concentration"].unique())
                      if not np.isnan(c)]
    if verbose:
        print("Concentration values:", concentrations)
    outcomes = defaultdict(list)
    controls = defaultdict(list)
    cell_idx = {c: i for i, c in enumerate(cells)}
    drug_idx = {d: i for i, d in enumerate(drugs)}
    conc_idx = {c: i for i, c in enumerate(concentrations)}
    for cell_name, drug_name, conc, outcome in zip(
            df["cell line"], df["drug"], df["concentration"], df["outcome"]):
        cell = cell_idx[cell_name]
        drug = drug_idx[drug_name]
        if np.isnan(conc):
            controls[(cell, drug)].append(outcome)
        else:
            outcomes[(cell, drug, conc_idx[conc])].append(outcome)

    # control renormalization (reference :58-70)
    for cell in range(len(cells)):
        for drug in range(len(drugs)):
            if (cell, drug) not in controls:
                continue
            obs = controls[(cell, drug)]
            mu = np.mean(obs)
            for t in range(len(concentrations)):
                outcomes[(cell, drug, t)] = [o * control_mean / mu
                                             for o in outcomes[(cell, drug, t)]]
            controls[(cell, drug)] = [o * control_mean / mu for o in obs]

    # EB mean harvesting + noise estimation (reference :72-90)
    means, noise = [], []
    for cell in range(len(cells)):
        for drug in range(len(drugs)):
            if (cell, drug) not in controls:
                continue
            obs0 = controls[(cell, drug)]
            obs1 = outcomes[(cell, drug, 0)]
            if len(obs1) > 0 and np.mean(obs1) > control_mean:
                means.append(np.mean(obs1))
            noise.extend((np.array(obs0) - control_mean) ** 2)
    means = np.array(means)
    noise = float(np.mean(noise))

    # Poisson histogram prior, symmetrized (reference :94-110)
    counts, bins = np.histogram(means, bins=nbins // 2)
    fitted = poisson_glm_fit(counts)
    mean_grid = np.concatenate([
        2 * control_mean - (bins[:-1] + bins[1:])[::-1] / 2,
        (bins[:-1] + bins[1:]) / 2])
    mean_probs = np.concatenate([fitted[::-1], fitted])
    mean_probs = mean_probs / mean_probs.sum()

    likelihood = GammaGridLikelihood(mean_grid, mean_probs, noise)

    if tensor_outcomes:
        max_replicates = max(len(o) for o in outcomes.values())
        Y = np.full((len(cells), len(drugs), len(concentrations),
                     max_replicates), np.nan)
        for (i, j, t), o in outcomes.items():
            for r, o_r in enumerate(o):
                Y[i, j, t, r] = o_r
        outcomes = Y

    return outcomes, likelihood, cells, drugs, concentrations, controls
