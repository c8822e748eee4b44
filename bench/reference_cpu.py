"""CPU stand-in for the reference implementation's constrained-Poisson Gibbs.

The reference (tansey/functionalmf) cannot run in this image — its native
dependencies (sksparse.cholmod, pypolyagamma, SharedArray) are not
installed and installation is not permitted — so the baseline is *measured*
from this faithful numpy reimplementation of the reference's algorithm and
work pattern (SURVEY.md §6: "baselines must be measured, not copied"):

  * Python loop over rows and columns per sweep (factor.py:984-1000 fans
    these out over `nthreads` worker processes; we measure single-core and
    scale by nthreads when computing the baseline, which is *generous* to
    the reference since its fan-out pickles data per task).
  * GASS with a 10,000-point grid pruned per constraint, downsampled to
    ngrid=100, and a Python loop over candidates calling the user
    log-likelihood per candidate (gass.py:64-116, factor.py:739).
  * scipy banded Cholesky for the per-column prior factor, standing in for
    CHOLMOD on the block-banded kron(I_k, D^T Lam D) precision
    (fast_mvn.py:38-47) — at least as fast as CHOLMOD at these sizes.
  * Vectorized horseshoe/IG prior updates (factor.py:130-153).

Usage: python bench/reference_cpu.py [nsweeps] — prints measured
sweeps/sec and writes bench/baseline_cpu.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
from scipy.linalg import cholesky_banded, solve_banded
from scipy.stats import poisson as _poisson

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functionalmf_tpu.ops.penalty import bayes_grid_penalty  # noqa: E402

# politics/benchmark.py:66-97 config
NROWS, NCOLS, NDEPTH = 19, 19, 228
NEMBEDS = 5
TF_ORDER = 2
NGRID = 100
NTHREADS = 3  # the reference's politics nthreads (benchmark.py:93)


def rowcol_loglikelihood(Y, WV, row=None, col=None):
    # politics/benchmark.py:21-32
    if row is not None:
        Y = Y[row]
    if col is not None:
        Y = Y[:, col]
    with np.errstate(all="ignore"):
        return np.nansum(_poisson.logpmf(Y, WV))


def gass_numpy(x, chol_or_sigma, loglik, Constraints, rng, mu=None,
               banded_factor=None, ngrid=NGRID):
    """Reference-pattern GASS (gass.py:13-130): 10k grid, prune, subsample,
    per-candidate likelihood loop."""
    cur_ll = loglik(x)
    ll = cur_ll + np.log(rng.random())
    if banded_factor is not None:
        # prior draw via banded backward solve per embedding block
        z = rng.normal(size=x.shape[0])
        v = np.empty_like(z)
        T = banded_factor.shape[1]
        for a in range(x.shape[0] // T):
            v[a * T:(a + 1) * T] = solve_banded(
                (0, banded_factor.shape[0] - 1), banded_factor,
                z[a * T:(a + 1) * T])
        # (upper-banded L^T solve; distributionally N(0, Q^-1))
    else:
        v = chol_or_sigma * rng.normal(size=x.shape[0])
    if mu is None:
        mu = np.zeros_like(x)
    A, c = Constraints[:, :-1], Constraints[:, -1]
    x0 = x - mu
    a = A.dot(x0)
    b = A.dot(v)
    cc = c - A.dot(mu)
    sqrt_term = a**2 + b**2 - cc**2
    eps = 1e-6
    concerning = (sqrt_term >= 0) & (a != -cc)
    grid = np.linspace(-np.pi, np.pi, 10000)
    if np.any(concerning):
        denom = a + cc
        with np.errstate(all="ignore"):
            theta1 = 2 * np.arctan((b[concerning] + np.sqrt(sqrt_term[concerning])) / denom[concerning])
            theta2 = 2 * np.arctan((b[concerning] - np.sqrt(sqrt_term[concerning])) / denom[concerning])
        complements = a[concerning] ** 2 < cc[concerning] ** 2
        t1c, t2c = theta1[complements], theta2[complements]
        t1i, t2i = theta1[~complements], theta2[~complements]
        for t1, t2 in zip(t1c, t2c):
            grid = grid[(grid <= min(t1, t2)) | (grid >= max(t1, t2))]
        if len(t1i):
            order = t1i < t2i
            tmin = (order * t1i + (~order) * t2i).max() + eps
            tmax = (order * t2i + (~order) * t1i).min() - eps
            grid = grid[(grid >= tmin) & (grid <= tmax)]
    if len(grid) == 0:
        return x, cur_ll
    if len(grid) > ngrid:
        grid = rng.choice(grid, size=ngrid, replace=False)
    opts = x0[None] * np.cos(grid[:, None]) + v[None] * np.sin(grid[:, None]) + mu[None]
    # per-candidate Python loop, as the reference's _w_loglikelihood batch
    # path does (factor.py:739, 870)
    grid_ll = np.array([loglik(o) for o in opts])
    keep = grid_ll >= ll
    if not np.any(keep):
        return x, cur_ll
    opts, grid_ll = opts[keep], grid_ll[keep]
    sel = rng.integers(len(opts))
    return opts[sel], grid_ll[sel]


class ReferenceCPUConstrainedPoisson:
    def __init__(self, Y, seed=0):
        self.rng = np.random.default_rng(seed)
        self.Y = Y
        self.Delta = bayes_grid_penalty(NDEPTH, TF_ORDER)
        self.nD = self.Delta.shape[0]
        rng = self.rng
        self.W = np.abs(rng.normal(1, 0.2, size=(NROWS, NEMBEDS)))
        self.W[np.triu_indices(NEMBEDS, k=1)] = 0
        self.V = np.abs(rng.normal(1, 0.2, size=(NCOLS, NDEPTH, NEMBEDS)))
        self.Tau2 = np.ones((NCOLS, self.nD))
        self.Tau2_c = np.ones((NCOLS, self.nD))
        self.Tau2_b = np.ones((NCOLS, self.nD))
        self.Tau2_a = np.ones((NCOLS, self.nD))
        self.lam2, self.lam2_a = 0.1, 1.0
        self.sigma2 = 0.5
        self.CA = np.eye(NDEPTH)
        self.CC = np.zeros(NDEPTH)

    # factor.py:130-153 prior updates (vectorized in the reference too)
    def _priors(self):
        rng = self.rng
        wvec = np.concatenate([self.W[np.tril_indices(NEMBEDS)],
                               self.W[NEMBEDS:].ravel()])
        prec = rng.gamma(0.1 + len(wvec) / 2, 1 / (0.1 + (wvec**2).sum() / 2))
        self.sigma2 = 1 / prec
        for j in range(NCOLS):
            deltas = self.Delta.dot(self.V[j])
            rate = (deltas**2).sum(axis=1) / (2 * self.lam2) + 1 / self.Tau2_c[j].clip(1e-6, 1e6)
            self.Tau2[j] = 1 / rng.gamma((NEMBEDS + 1) / 2, 1 / rate.clip(1e-6, 1e6))
            self.Tau2_c[j] = 1 / rng.gamma(1, 1 / (1 / self.Tau2[j] + 1 / self.Tau2_b[j]).clip(1e-6, 1e6))
            self.Tau2_b[j] = 1 / rng.gamma(1, 1 / (1 / self.Tau2_c[j] + 1 / self.Tau2_a[j]).clip(1e-6, 1e6))
            self.Tau2_a[j] = 1 / rng.gamma(1, 1 / (1 / self.Tau2_b[j] + 1).clip(1e-6, 1e6))
        rate = 1 / self.lam2_a
        for j in range(NCOLS):
            deltas = self.Delta.dot(self.V[j])
            rate += ((deltas / np.sqrt(self.Tau2[j])[:, None])**2).sum() / 2
        shape = self.nD * NCOLS * NEMBEDS + 1
        self.lam2 = max(1e-5, 1 / self.rng.gamma(shape / 2, 1 / rate))
        self.lam2_a = 1 / rng.gamma(1, 1 / (1 / self.lam2 + 1))

    def _resample_W(self):
        # factor.py:665-725 per-row GASS
        for i in range(NROWS):
            ndims = min(NEMBEDS, i + 1)
            A = (self.CA[None, :, :, None] * self.V[:, None])[..., :ndims].sum(axis=2)
            A = A.reshape(-1, ndims)
            C = np.tile(self.CC, NCOLS)[:, None]
            Constraints = np.concatenate([A, C], axis=1)
            w_i = self.W[i, :ndims]
            V_i = self.V[..., :ndims]

            def ll(w):
                tau = (V_i * w[None, None]).sum(axis=-1)
                return rowcol_loglikelihood(self.Y, tau, row=i)

            w_new, _ = gass_numpy(w_i, np.sqrt(self.sigma2), ll, Constraints, self.rng)
            self.W[i, :ndims] = w_new

    def _resample_V(self):
        # factor.py:759-854 per-column GASS with banded prior factor
        p = TF_ORDER + 1
        for j in range(NCOLS):
            lam_tau = (1 / (self.lam2 * self.Tau2[j]).clip(1e-6, 1e6))
            DtLD = (self.Delta * lam_tau[:, None]).T.dot(self.Delta)
            # upper-banded storage for scipy cholesky_banded
            ab = np.zeros((p + 1, NDEPTH))
            for off in range(p + 1):
                ab[p - off, off:] = np.diagonal(DtLD, off)
            cb = cholesky_banded(ab)  # upper triangular banded factor
            A = (self.CA[None, :, None, :] * self.W[:, None, :, None]).reshape(
                NROWS * NDEPTH, NEMBEDS * NDEPTH)
            C = np.tile(self.CC, NROWS)[:, None]
            Constraints = np.concatenate([A, C], axis=1)
            V_j = self.V[j].T.flatten()

            def ll(vflat):
                Vj = vflat.reshape(NEMBEDS, NDEPTH).T
                tau = (Vj[None] * self.W[:, None]).sum(axis=-1)
                return rowcol_loglikelihood(self.Y, tau, col=j)

            v_new, _ = gass_numpy(V_j, None, ll, Constraints, self.rng,
                                  banded_factor=cb)
            self.V[j] = v_new.reshape(NEMBEDS, NDEPTH).T

    def sweep(self):
        self._priors()
        self._resample_W()
        self._resample_V()


def main():
    import argparse
    ap = argparse.ArgumentParser()
    # >=30 sweeps for the headline denominator (VERDICT.md Weak #6: a
    # 3-sweep measurement is too noisy for a published speedup)
    ap.add_argument("nsweeps", nargs="?", type=int, default=30)
    ap.add_argument("--ess-warm", type=int, default=0,
                    help="warm-up sweeps before the ESS measurement")
    ap.add_argument("--ess-draws", type=int, default=0,
                    help="post-warm draws for min-ESS/sec (BASELINE.md's "
                         "quality-adjusted denominator); 0 skips")
    args = ap.parse_args()

    rng = np.random.default_rng(42)
    W = np.abs(rng.normal(1, 0.3, size=(NROWS, NEMBEDS)))
    V = np.abs(rng.normal(1, 0.3, size=(NCOLS, NDEPTH, NEMBEDS)))
    Y = rng.poisson(np.einsum("nk,mtk->nmt", W, V)).astype(float)
    hold = rng.random((NROWS, NCOLS)) < 0.1
    Y[hold] = np.nan

    model = ReferenceCPUConstrainedPoisson(Y)
    model.sweep()  # warm caches
    t0 = time.time()
    for _ in range(args.nsweeps):
        model.sweep()
    dt = (time.time() - t0) / args.nsweeps
    single_core = 1.0 / dt

    out = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    baseline = {}
    if os.path.exists(out):
        with open(out) as f:
            baseline = json.load(f)
    baseline.update({
        "config": "constrained-poisson GDELT 19x19x228 k=5 tf_order=2 ngrid=100",
        "single_core_sweeps_per_sec": single_core,
        "nthreads_equivalent": NTHREADS,
        "sweeps_per_sec": single_core * NTHREADS,
        "throughput_nsweeps": args.nsweeps,
        "note": ("numpy reimplementation of the reference algorithm; "
                 "sweeps_per_sec assumes perfect nthreads-way scaling of the "
                 "reference's process pool (generous to the reference)"),
    })

    if args.ess_draws > 0:
        # Same warm-up discipline and estimator as bench.py: discard
        # warm-up, collect post-warm draws, min Geyer ESS over the same
        # parameter subsample.
        from functionalmf_tpu.utils.diagnostics import min_ess_per_param
        for _ in range(args.ess_warm):
            model.sweep()
        draws = {"W": [], "V": [], "lam2": [], "sigma2": []}
        t0 = time.time()
        for _ in range(args.ess_draws):
            model.sweep()
            draws["W"].append(model.W.copy())
            draws["V"].append(model.V.copy())
            draws["lam2"].append(model.lam2)
            draws["sigma2"].append(model.sigma2)
        dt_s = time.time() - t0
        samples = {k: np.asarray(v) for k, v in draws.items()}
        ess, k_slow, j_slow = min_ess_per_param(
            samples, keys=("W", "V", "lam2", "sigma2"), max_params=128,
            detail=True)
        baseline.update({
            "ess_warm": args.ess_warm,
            "ess_draws": args.ess_draws,
            "min_ess_per_sweep": ess / args.ess_draws,
            "min_ess_per_sec_single_core": ess / dt_s,
            # like sweeps/sec, credit the reference with perfect
            # nthreads-way scaling
            "min_ess_per_sec": (ess / dt_s) * NTHREADS,
            "slowest_param": f"{k_slow}[{j_slow}]",
        })

    with open(out, "w") as f:
        json.dump(baseline, f, indent=2)
    print(json.dumps(baseline))


if __name__ == "__main__":
    main()
