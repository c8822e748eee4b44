"""CPU reference-algorithm *quality* engine (VERDICT round-2 items 1, 2, 8).

`bench/reference_cpu.py` measures the reference's **throughput** by mirroring
its work pattern (per-candidate Python likelihood loops, materialized
constraint matrices, single sequential stream). This module answers a
different question: *what posterior does the reference algorithm produce on
the benchmark datasets?* For that only distributional fidelity matters, so
the same Markov chain is implemented with vectorized candidate evaluation
and factored constraint products — identical transition kernels (same grid
pruning, same proposals, same conditionals), hours faster. Nothing here
feeds the speedup denominators in `bench/baseline_cpu.json`.

Implements, in plain numpy/scipy (no JAX anywhere — this is the CPU side of
the head-to-head):

* ``ConstrainedPoissonCPU`` — the reference's flagship constrained model
  (reference functionalmf/factor.py:894-1017): per-row / per-column GASS on
  a 10,000-point theta grid pruned per constraint and subsampled to ngrid
  (gass.py:38-121), joint per-column updates with the block-banded
  trend-filtering prior factor (factor.py:766-796, CHOLMOD there, scipy
  banded Cholesky here in time-major packing — same distribution), optional
  EP centering of the proposal with the EP factor divided back out of the
  likelihood (factor.py:677-683, 771-797), lower-triangular W
  identification (factor.py:155-174), horseshoe+ Tau2 ladder, horseshoe
  lam2, conjugate IG sigma2 (factor.py:130-153).

* ``GaussianCPU`` — the reference's conjugate Gaussian model
  (factor.py:286-423): per-row ridge posterior with missing-data masking
  and replicate sufficient statistics, per-column GLS with
  ``X = kron(W, I_T)`` and sparse banded precision sampling, conjugate IG
  nu2 (factor.py:411-419, genlasso.py:139-171).

Packing note: the reference packs V_j embedding-major and factors
``kron(I_k, D'ΛD) + X'Σ⁻¹X`` with CHOLMOD (general sparse). Time-major
packing makes the same matrix *banded* (bandwidth k·(tf_order+1)+k-1), so
scipy's ``cholesky_banded`` suffices. The sampled distribution
N(Q⁻¹b, Q⁻¹) is packing-invariant.
"""
from __future__ import annotations

import numpy as np
from scipy.linalg import cholesky_banded, cho_solve_banded, solve_banded, \
    cholesky as dense_cholesky, solve_triangular, cho_solve
from scipy.special import xlogy, gammaln

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functionalmf_tpu.ops.penalty import bayes_grid_penalty  # noqa: E402


# ---------------------------------------------------------------------------
# shared prior draws (reference functionalmf/utils.py:115-124 semantics)
# ---------------------------------------------------------------------------
def sample_horseshoe_plus_np(rng, size):
    a = 1.0 / rng.gamma(0.5, 1.0, size=size)
    b = 1.0 / rng.gamma(0.5, a)
    c = 1.0 / rng.gamma(0.5, b)
    tau2 = 1.0 / rng.gamma(0.5, c)
    return tau2, c, b, a


def sample_horseshoe_np(rng, size=None):
    a = 1.0 / rng.gamma(0.5, 1.0, size=size)
    lam2 = 1.0 / rng.gamma(0.5, a)
    return lam2, a


# ---------------------------------------------------------------------------
# GASS: reference gass.py:13-130 semantics, candidates vectorized
# ---------------------------------------------------------------------------
def gass_step(rng, x, v, mu, A_dot, c, loglik_batch, cur_ll=None,
              ngrid=100, full_grid=10000, eps=1e-6):
    """One GASS transition. `A_dot` maps a coordinate vector to constraint
    values A@x (callable — the matrix is never required); constraints are
    A@x >= c. `v` is the pre-drawn N(0, Sigma) ellipse proposal,
    `mu` the proposal center. `loglik_batch` maps (G, D) candidates to (G,)
    log-likelihoods. Returns (x_new, ll_new)."""
    if cur_ll is None:
        cur_ll = loglik_batch(x[None])[0]
    ll = cur_ll + np.log(rng.random())
    x0 = x - mu
    a = A_dot(x0)
    b = A_dot(v)
    cc = c - A_dot(mu)
    sqrt_term = a ** 2 + b ** 2 - cc ** 2
    concerning = (sqrt_term >= 0) & (a != -cc)
    grid = np.linspace(-np.pi, np.pi, full_grid)
    if np.any(concerning):
        denom = a + cc
        with np.errstate(all="ignore"):
            root = np.sqrt(sqrt_term[concerning])
            theta1 = 2 * np.arctan((b[concerning] + root) / denom[concerning])
            theta2 = 2 * np.arctan((b[concerning] - root) / denom[concerning])
        complements = a[concerning] ** 2 < cc[concerning] ** 2
        lo = np.minimum(theta1, theta2)
        hi = np.maximum(theta1, theta2)
        # interval rows: joint intersection [max lo + eps, min hi - eps]
        if np.any(~complements):
            tmin = lo[~complements].max() + eps
            tmax = hi[~complements].min() - eps
            grid = grid[(grid >= tmin) & (grid <= tmax)]
        # complement rows: exclude the open interval (lo, hi) pointwise.
        # grid is sorted, so each exclusion is an index range — an O(J+G)
        # difference-array sweep selects exactly the same surviving points
        # as the reference's per-row boolean masking (gass.py:64-66)
        if np.any(complements) and len(grid):
            lo_c, hi_c = lo[complements], hi[complements]
            i_lo = np.searchsorted(grid, lo_c, side="right")
            i_hi = np.searchsorted(grid, hi_c, side="left")
            delta = np.zeros(len(grid) + 1, dtype=np.int64)
            np.add.at(delta, i_lo, 1)
            np.add.at(delta, i_hi, -1)
            grid = grid[np.cumsum(delta[:-1]) == 0]
    if len(grid) == 0:
        return x, cur_ll
    if len(grid) > ngrid:
        grid = rng.choice(grid, size=ngrid, replace=False)
    # Exact per-candidate feasibility: A@cand - c = a cos(t) + b sin(t) - cc.
    # The reference's interval/complement casework can rarely admit an
    # infeasible grid point (its next gass() call then fails the
    # feasible-start assertion, reference gass.py:33-36, and the run
    # crashes); filtering candidates to the exact feasible set preserves
    # the arcs' intent and the kernel's stationary distribution — the
    # target is truncated to {A x >= c} anyway.
    cosg, sing = np.cos(grid), np.sin(grid)
    feas = (a[:, None] * cosg[None] + b[:, None] * sing[None]
            >= cc[:, None] - 1e-9).all(axis=0)
    grid = grid[feas]
    if len(grid) == 0:
        return x, cur_ll
    opts = x0[None] * cosg[feas, None] + v[None] * sing[feas, None] + mu[None]
    grid_ll = loglik_batch(opts)
    keep = grid_ll >= ll
    if not np.any(keep):
        return x, cur_ll
    opts, grid_ll = opts[keep], grid_ll[keep]
    sel = rng.integers(len(opts))
    return opts[sel], grid_ll[sel]


def _banded_from_dense(Q, bw):
    """Upper-banded storage (scipy `cholesky_banded` layout) of dense Q."""
    D = Q.shape[0]
    ab = np.zeros((bw + 1, D))
    for off in range(bw + 1):
        ab[bw - off, off:] = np.diagonal(Q, off)
    return ab


class _BTFPriorsCPU:
    """Shared latent state + prior conditionals (factor.py:50-153)."""

    def __init__(self, nrows, ncols, ndepth, nembeds, tf_order,
                 sigma2_init, lam2_init, seed):
        self.nrows, self.ncols, self.ndepth = nrows, ncols, ndepth
        self.nembeds, self.tf_order = nembeds, tf_order
        self.rng = np.random.default_rng(seed)
        self.Delta = np.asarray(bayes_grid_penalty(ndepth, tf_order), float)
        self.nD = self.Delta.shape[0]
        rng = self.rng
        self.W = np.abs(rng.normal(1, 0.2, size=(nrows, nembeds)))
        iu = np.triu_indices(min(nembeds, nrows), k=1)
        self.W[iu] = 0.0
        self.V = np.abs(rng.normal(1, 0.2, size=(ncols, ndepth, nembeds)))
        self.Tau2 = np.ones((ncols, self.nD))
        self.Tau2_c = np.ones((ncols, self.nD))
        self.Tau2_b = np.ones((ncols, self.nD))
        self.Tau2_a = np.ones((ncols, self.nD))
        self.lam2, self.lam2_a = lam2_init, 1.0
        self.sigma2 = sigma2_init
        # DtLD band width: widest Delta row support - 1
        supp = (np.abs(self.Delta) > 0)
        self.dtld_bw = int(max((np.nonzero(r)[0].max() - np.nonzero(r)[0].min())
                               for r in supp if r.any()))

    def init_hyperparams(self):
        """Reference example warm-start re-draws (factor.py:244-253)."""
        rng = self.rng
        t2, c, b, a = sample_horseshoe_plus_np(rng, (self.ncols, self.nD))
        self.Tau2, self.Tau2_c, self.Tau2_b, self.Tau2_a = \
            t2.clip(0, 9), c, b, a
        lam2, lam2_a = sample_horseshoe_np(rng)
        self.lam2, self.lam2_a = float(np.clip(lam2, 0, 4)), float(lam2_a)
        self.sigma2 = 1.0 / rng.gamma(0.1, 1 / 0.1)

    def _packed_w(self):
        k, n = self.nembeds, self.nrows
        kk = min(k, n)
        return np.concatenate([self.W[:kk][np.tril_indices(kk)],
                               self.W[kk:].ravel()])

    def resample_priors(self):
        rng = self.rng
        # sigma2 | W  (factor.py:130-132; IG(0.1, 0.1))
        wvec = self._packed_w()
        prec = rng.gamma(0.1 + len(wvec) / 2, 1 / (0.1 + (wvec ** 2).sum() / 2))
        self.sigma2 = 1 / prec
        # Tau2 horseshoe+ ladder per column (factor.py:134-141)
        k = self.nembeds
        for j in range(self.ncols):
            deltas = self.Delta.dot(self.V[j])
            rate = (deltas ** 2).sum(axis=1) / (2 * self.lam2) \
                + 1 / self.Tau2_c[j].clip(1e-6, 1e6)
            self.Tau2[j] = 1 / rng.gamma((k + 1) / 2, 1 / rate.clip(1e-6, 1e6))
            self.Tau2_c[j] = 1 / rng.gamma(1, 1 / (1 / self.Tau2[j] + 1 / self.Tau2_b[j]).clip(1e-6, 1e6))
            self.Tau2_b[j] = 1 / rng.gamma(1, 1 / (1 / self.Tau2_c[j] + 1 / self.Tau2_a[j]).clip(1e-6, 1e6))
            self.Tau2_a[j] = 1 / rng.gamma(1, 1 / (1 / self.Tau2_b[j] + 1).clip(1e-6, 1e6))
        # lam2 horseshoe (factor.py:143-153, with the rate ACCUMULATED over
        # columns — the reference overwrites it per column, a bug we do not
        # replicate on either side of the comparison). lam2_true semantics:
        # a model constructed with fixed lam2 (sample_lam2=False) keeps it
        # (the doseresponse pipeline fixes lam2, fit.py lam2_true).
        if not getattr(self, "sample_lam2", True):
            return
        rate = 1 / self.lam2_a
        for j in range(self.ncols):
            deltas = self.Delta.dot(self.V[j])
            rate += ((deltas / np.sqrt(self.Tau2[j])[:, None]) ** 2).sum() / 2
        shape = self.nD * self.ncols * k + 1
        self.lam2 = max(1e-5, 1 / rng.gamma(shape / 2, 1 / rate))
        self.lam2_a = 1 / rng.gamma(1, 1 / (1 / self.lam2 + 1))

    def _dtld(self, j):
        lam_tau = 1 / (self.lam2 * self.Tau2[j]).clip(1e-6, 1e6)
        return (self.Delta * lam_tau[:, None]).T.dot(self.Delta)

    def _banded_prior(self, DtLD, G=None):
        """Upper-banded storage (scipy layout) of the time-major precision
        Q = kron(DtLD, I_k) [+ blockdiag_t(G_t)]: offset d*k carries DtLD's
        d-th superdiagonal (same embedding); offsets 0..k-1 within one time
        block carry the t-diagonal Gram G."""
        T, k = self.ndepth, self.nembeds
        bw = self.dtld_bw * k + (k - 1)
        ab = np.zeros((bw + 1, T * k))
        for d in range(self.dtld_bw + 1):
            diag = np.diagonal(DtLD, d)                    # (T-d,)
            ab[bw - d * k].reshape(T, k)[d:] = diag[:, None]
        if G is not None:
            for off in range(k):                           # b - a = off
                rows = ab[bw - off].reshape(T, k)
                for b in range(off, k):
                    rows[:, b] += G[:, b - off, b]
        return ab, bw

    def collect(self, store):
        store["W"].append(self.W.copy())
        store["V"].append(self.V.copy())
        store["Tau2"].append(self.Tau2.copy())
        store["lam2"].append(self.lam2)
        store["sigma2"].append(self.sigma2)


# ---------------------------------------------------------------------------
class ConstrainedPoissonCPU(_BTFPriorsCPU):
    """Reference-pattern constrained Poisson BTF (factor.py:894-1017)."""

    def __init__(self, Y, nembeds, CA, CC, tf_order=2, sigma2_init=0.5,
                 lam2_init=0.1, seed=0, ep=None, W_init=None, V_init=None,
                 ngrid=100):
        if Y.ndim == 3:
            Y = Y[..., None]
        nrows, ncols, ndepth = Y.shape[:3]
        super().__init__(nrows, ncols, ndepth, nembeds, tf_order,
                         sigma2_init, lam2_init, seed)
        self.Y = Y
        self.mask = ~np.isnan(Y)
        self.Y0 = np.where(self.mask, Y, 0.0)
        # replicate sufficient statistics per cell: the Poisson loglik sums
        # over replicates, sum_r [y_r log(tau) - tau] = S log(tau) - C tau
        self.Scell = self.Y0.sum(axis=-1)                      # (n, m, T)
        self.Ccell = self.mask.sum(axis=-1).astype(float)      # (n, m, T)
        self.CA = np.asarray(CA, float)     # (J, T)
        self.CC = np.asarray(CC, float)     # (J,)
        self.ngrid = ngrid
        if ep is not None:
            self.Mu_ep = np.asarray(ep[0], float)       # (n, m, T)
            self.Sigma_ep = np.asarray(ep[1], float)    # (n, m, T)
            self.Sinv2 = 1.0 / self.Sigma_ep ** 2
        else:
            self.Mu_ep = None
        if W_init is not None:
            self.W = np.asarray(W_init, float).copy()
        if V_init is not None:
            self.V = np.asarray(V_init, float).copy()
        # lower-triangular identification (factor.py:155-174): row i only
        # samples its first min(i+1, k) coordinates, so the frozen rest MUST
        # be zero or the per-row constraint slices would not cover tau
        self.W[np.triu_indices(min(self.nembeds, self.nrows), k=1)] = 0.0

    # -- likelihood slices, vectorized over candidates -------------------
    # The Poisson term is evaluated at OBSERVED cells only (identical sum —
    # missing cells contribute 0 via nansum in the reference); the EP
    # renormalizer (factor.py:743-756) is an exact quadratic in the
    # coordinates, evaluated as such. Constant terms are dropped: GASS slice
    # comparisons are invariant to constant shifts of the loglikelihood.
    def _row_ll(self, i, ep_A=None, ep_b=None):
        obs = self.Ccell[i] > 0                                # (m, T)
        im, it = np.nonzero(obs)
        S, C = self.Scell[i][obs], self.Ccell[i][obs]

        def ll(w_cands):                                       # (G, nd)
            Vc = self.V[im, it, :w_cands.shape[1]]             # (ncells, nd)
            tau = w_cands.dot(Vc.T)                            # (G, ncells)
            with np.errstate(all="ignore"):
                out = (xlogy(S[None], tau) - C[None] * tau).sum(axis=1)
            out = np.where(np.isnan(out), -np.inf, out)
            if ep_A is not None:
                # minus the EP factor: +1/2 w'Aw - b'w (A, b from the
                # proposal construction; constants dropped)
                out = out + 0.5 * np.einsum("ga,ab,gb->g", w_cands, ep_A,
                                            w_cands) \
                    - w_cands.dot(ep_b)
            return out
        return ll

    def _col_ll(self, j, ep_G=None, ep_rhs=None):
        T, k = self.ndepth, self.nembeds
        S, C = self.Scell[:, j], self.Ccell[:, j]              # (n, T)
        # xlogy(0, tau) == 0, so missing cells (S=C=0) drop out exactly as
        # with the reference's nansum; S>0 with tau<=0 -> -inf/nan -> -inf
        Wt = self.W.T.copy()                                   # (k, n)

        def ll(v_cands):                                       # (G, T*k) t-major
            Vj = v_cands.reshape(-1, T, k)
            tau = np.matmul(Vj, Wt)                            # (G, T, n)
            with np.errstate(all="ignore"):
                out = xlogy(S.T[None], tau).sum(axis=(1, 2)) \
                    - np.einsum("gtn,nt->g", tau, C)
            out = np.where(np.isnan(out), -np.inf, out)
            if ep_G is not None:
                out = out + 0.5 * np.einsum("gta,tab,gtb->g", Vj, ep_G, Vj) \
                    - np.einsum("gta,ta->g", Vj, ep_rhs)
            return out
        return ll

    # -- W update (factor.py:665-757) -------------------------------------
    def _resample_W(self):
        rng, k = self.rng, self.nembeds
        # A_w[(j', col), a] = sum_t CA[j', t] V[col, t, a] (factor.py:711-719)
        A_full = np.einsum("jt,mta->mja", self.CA, self.V).reshape(-1, k)
        c_full = np.tile(self.CC, self.ncols)
        for i in range(self.nrows):
            nd = min(k, i + 1)
            A = A_full[:, :nd]
            ep_A = ep_b = None
            if self.Mu_ep is not None:
                Vd = self.V[..., :nd]
                ep_A = np.einsum("mt,mta,mtb->ab", self.Sinv2[i], Vd, Vd)
                ep_b = np.einsum("mt,mta->a",
                                 self.Mu_ep[i] * self.Sinv2[i], Vd)
                Q = ep_A + np.eye(nd) / self.sigma2
                U = dense_cholesky(Q)                          # upper
                mu = cho_solve((U, False), ep_b)
                v = solve_triangular(U, rng.normal(size=nd), lower=False)
            else:
                mu = np.zeros(nd)
                v = np.sqrt(self.sigma2) * rng.normal(size=nd)
            ll = self._row_ll(i, ep_A, ep_b)
            w_new, _ = gass_step(rng, self.W[i, :nd], v, mu,
                                 lambda x: A.dot(x), c_full, ll,
                                 ngrid=self.ngrid)
            self.W[i, :nd] = w_new

    # -- V update (factor.py:759-854), time-major banded ------------------
    def _resample_V(self):
        rng, T, k = self.rng, self.ndepth, self.nembeds
        c_full = np.tile(self.CC, self.nrows)
        for j in range(self.ncols):
            DtLD = self._dtld(j)
            ep_G = ep_rhs = None
            if self.Mu_ep is not None:
                ep_G = np.einsum("nt,na,nb->tab", self.Sinv2[:, j],
                                 self.W, self.W)               # (T, k, k)
                ep_rhs = np.einsum("nt,na->ta",
                                   self.Mu_ep[:, j] * self.Sinv2[:, j],
                                   self.W)                     # (T, k)
            ab, bw = self._banded_prior(DtLD, ep_G)
            try:
                cb = cholesky_banded(ab)                       # Q = U'U
            except np.linalg.LinAlgError:
                ab[bw] += 1e-6 * ab[bw].max()
                cb = cholesky_banded(ab)
            if self.Mu_ep is not None:
                mu = cho_solve_banded((cb, False), ep_rhs.ravel())
            else:
                mu = np.zeros(T * k)
            z = rng.normal(size=T * k)
            v = solve_banded((0, bw), cb, z)                   # U^{-1} z

            def A_dot(y, W=self.W, CA=self.CA):
                # A[(i,jc),(t,a)] = CA[jc,t] W[i,a], never materialized
                M = CA.dot(y.reshape(T, k))                    # (J, k)
                return W.dot(M.T).reshape(-1)                  # (n*J,) row-major

            ll = self._col_ll(j, ep_G, ep_rhs)
            x = self.V[j].reshape(T * k)                       # t-major
            x_new, _ = gass_step(rng, x, v, mu, A_dot, c_full, ll,
                                 ngrid=self.ngrid)
            self.V[j] = x_new.reshape(T, k)

    def sweep(self):
        self.resample_priors()
        self._resample_W()
        self._resample_V()

    def run_gibbs(self, nburn, nthin, nsamples, print_freq=0, on_step=None):
        store = {"W": [], "V": [], "Tau2": [], "lam2": [], "sigma2": []}
        total = nburn + nthin * nsamples
        for step in range(total):
            self.sweep()
            if step >= nburn and (step - nburn) % nthin == nthin - 1:
                self.collect(store)
            if print_freq and step % print_freq == 0:
                print(f"\tStep {step}/{total}", flush=True)
            if on_step is not None:
                on_step(step)
        return {kk: np.asarray(vv) for kk, vv in store.items()}


# ---------------------------------------------------------------------------
class GaussianCPU(_BTFPriorsCPU):
    """Reference-pattern conjugate Gaussian BTF (factor.py:286-423)."""

    def __init__(self, Y, nembeds, tf_order=2, sigma2_init=1.0,
                 lam2_init=0.1, nu2_init=1.0, seed=0):
        if Y.ndim == 3:
            Y = Y[..., None]
        nrows, ncols, ndepth = Y.shape[:3]
        super().__init__(nrows, ncols, ndepth, nembeds, tf_order,
                         sigma2_init, lam2_init, seed)
        self.Y = Y
        self.nu2 = nu2_init
        self.counts = (~np.isnan(Y)).sum(axis=-1).astype(float)  # (n,m,T)
        with np.errstate(all="ignore"):
            self.ymean = np.nanmean(Y, axis=-1)
        self.ymean0 = np.where(self.counts > 0, np.nan_to_num(self.ymean), 0.0)
        self.nobs = int(self.counts.sum())

    def _resample_W(self):
        rng, k = self.rng, self.nembeds
        for i in range(self.nrows):
            nd = min(k, i + 1)
            w_c = self.counts[i].ravel() / self.nu2              # (m*T,)
            Vf = self.V.reshape(-1, k)[:, :nd]
            Q = (Vf * w_c[:, None]).T.dot(Vf) + np.eye(nd) / self.sigma2
            b = (Vf * w_c[:, None]).T.dot(self.ymean0[i].ravel())
            U = dense_cholesky(Q)
            mu = cho_solve((U, False), b)
            z = rng.normal(size=nd)
            self.W[i, :nd] = mu + solve_triangular(U, z, lower=False)

    def _resample_V(self):
        rng, T, k = self.rng, self.ndepth, self.nembeds
        for j in range(self.ncols):
            DtLD = self._dtld(j)
            w_c = self.counts[:, j] / self.nu2                  # (n, T)
            G = np.einsum("nt,na,nb->tab", w_c, self.W, self.W)
            rhs = np.einsum("nt,na->ta", w_c * self.ymean0[:, j],
                            self.W).ravel()
            ab, bw = self._banded_prior(DtLD, G)
            try:
                cb = cholesky_banded(ab)
            except np.linalg.LinAlgError:
                ab[bw] += 1e-6 * ab[bw].max()
                cb = cholesky_banded(ab)
            mu = cho_solve_banded((cb, False), rhs)
            z = rng.normal(size=T * k)
            self.V[j] = (mu + solve_banded((0, bw), cb, z)).reshape(T, k)

    def _resample_nu2(self):
        # factor.py:411-419 + genlasso.py:149-168, IG(0.1, 0.1)
        Mu = np.einsum("nk,mtk->nmt", self.W, self.V)
        sqerr = np.nansum((Mu[..., None] - self.Y) ** 2)
        prec = self.rng.gamma(0.1 + self.nobs / 2, 1 / (0.1 + sqerr / 2))
        self.nu2 = 1 / prec

    def sweep(self):
        self._resample_nu2()
        self.resample_priors()
        self._resample_W()
        self._resample_V()

    def run_gibbs(self, nburn, nthin, nsamples, print_freq=0):
        store = {"W": [], "V": [], "Tau2": [], "lam2": [], "sigma2": [],
                 "nu2": []}
        total = nburn + nthin * nsamples
        for step in range(total):
            self.sweep()
            if step >= nburn and (step - nburn) % nthin == nthin - 1:
                self.collect(store)
                store["nu2"].append(self.nu2)
            if print_freq and step % print_freq == 0:
                print(f"\tStep {step}/{total}", flush=True)
        return {kk: np.asarray(vv) for kk, vv in store.items()}


# ---------------------------------------------------------------------------
def pg_draw_np(rng, b, z, nterms=256):
    """Vectorized PG(b, z) draws for the CPU anchor engines.

    Gamma-sum representation PG(b, z) = (2 pi^2)^{-1} sum_k Ga(b, 1) /
    ((k - 1/2)^2 + z^2 / (4 pi^2)) truncated at `nterms` with the exact
    tail mean added back (E[PG(b,z)] = b tanh(z/2) / (2 z)). The
    reference's pypolyagamma dependency draws exactly (C++ Devroye);
    at 256 terms the truncation's variance deficit is O(nterms^-3)
    relative (~1e-7) — distributionally indistinguishable at posterior
    summary level, and KS-checked against the exact Devroye sampler
    (tests/pg_exact.py) in tests/test_quality_engines.py.
    """
    b = np.asarray(b, float)
    z = np.asarray(z, float)
    shape = np.broadcast_shapes(b.shape, z.shape)
    b = np.broadcast_to(b, shape)
    z = np.broadcast_to(z, shape)
    ks = (np.arange(1, nterms + 1) - 0.5) ** 2           # (K,)
    denom = ks + (z[..., None] / (2 * np.pi)) ** 2       # (..., K)
    ok = np.isfinite(b) & (b > 0)
    bsafe = np.where(ok, b, 1.0)
    g = rng.gamma(np.broadcast_to(bsafe[..., None], denom.shape))
    draw = (g / denom).sum(-1) / (2 * np.pi ** 2)
    zs = np.abs(z)
    half = np.where(zs < 1e-4, 0.25 - zs ** 2 / 48,
                    np.tanh(np.where(zs < 1e-4, 1, zs) / 2)
                    / (2 * np.where(zs < 1e-4, 1, zs)))
    mean_full = bsafe * half
    mean_trunc = (bsafe[..., None] / denom).sum(-1) / (2 * np.pi ** 2)
    out = draw + (mean_full - mean_trunc)
    return np.where(ok, out, np.nan)


class BinomialCPU(GaussianCPU):
    """Reference-pattern Binomial BTF (factor.py:425-460): Polya-Gamma
    augmentation omega ~ PG(N, psi), pseudo-data kappa = (Y - N/2)/omega,
    then the Gaussian W/V updates with per-cell variance nu2 = 1/omega."""

    def __init__(self, Y, N, nembeds, **kwargs):
        super().__init__(Y, nembeds, **kwargs)
        if Y.ndim == 4:
            assert Y.shape[-1] == 1, "binomial anchor expects (n,m,t) data"
        self.Yb = self.Y[..., 0]                           # (n, m, t)
        self.Nb = np.broadcast_to(np.asarray(N, float), self.Yb.shape)
        self.nu2_cell = np.ones(self.Yb.shape)

    def _resample_nu2(self):
        # factor.py:447-460: omega at every cell; missing cells produce
        # NaN and are never used (masked out by the count weights)
        psi = np.einsum("nk,mtk->nmt", self.W, self.V)
        with np.errstate(all="ignore"):
            omega = pg_draw_np(self.rng, self.Nb, psi)
            self.nu2_cell = 1.0 / omega

    def _kappa(self):
        # factor.py:439-445: pseudo-data for the Gaussian updates
        with np.errstate(all="ignore"):
            return (self.Yb - self.Nb / 2) * self.nu2_cell

    def _gaussian_updates(self):
        """Gaussian W/V updates on (kappa, per-cell nu2) — the
        heteroskedastic branches of factor.py:342-348, 389-394."""
        rng, k, T = self.rng, self.nembeds, self.ndepth
        kappa = self._kappa()
        obs = ~np.isnan(kappa)
        w_cell = np.where(obs, 1.0 / np.where(obs, self.nu2_cell, 1.0), 0.0)
        kap0 = np.where(obs, kappa, 0.0)
        for i in range(self.nrows):
            nd = min(k, i + 1)
            wc = w_cell[i].ravel()
            Vf = self.V.reshape(-1, k)[:, :nd]
            Q = (Vf * wc[:, None]).T.dot(Vf) + np.eye(nd) / self.sigma2
            b = (Vf * wc[:, None]).T.dot(kap0[i].ravel())
            U = dense_cholesky(Q)
            mu = cho_solve((U, False), b)
            z = rng.normal(size=nd)
            self.W[i, :nd] = mu + solve_triangular(U, z, lower=False)
        for j in range(self.ncols):
            DtLD = self._dtld(j)
            wc = w_cell[:, j]                              # (n, T)
            G = np.einsum("nt,na,nb->tab", wc, self.W, self.W)
            rhs = np.einsum("nt,na->ta", wc * kap0[:, j], self.W).ravel()
            ab, bw = self._banded_prior(DtLD, G)
            try:
                cb = cholesky_banded(ab)
            except np.linalg.LinAlgError:
                ab[bw] += 1e-6 * ab[bw].max()
                cb = cholesky_banded(ab)
            mu = cho_solve_banded((cb, False), rhs)
            z = rng.normal(size=T * k)
            self.V[j] = (mu + solve_banded((0, bw), cb, z)).reshape(T, k)

    def sweep(self):
        self._resample_nu2()
        self.resample_priors()
        self._gaussian_updates()

    def run_gibbs(self, nburn, nthin, nsamples, print_freq=0):
        store = {"W": [], "V": [], "Tau2": [], "lam2": [], "sigma2": []}
        total = nburn + nthin * nsamples
        for step in range(total):
            self.sweep()
            if step >= nburn and (step - nburn) % nthin == nthin - 1:
                self.collect(store)
            if print_freq and step % print_freq == 0:
                print(f"\tStep {step}/{total}", flush=True)
        return {kk: np.asarray(vv) for kk, vv in store.items()}


class NegBinomCPU(BinomialCPU):
    """Reference-pattern Negative-Binomial BTF (factor.py:463-563):
    RW-Metropolis on log R with `rdims` aggregation, then the Binomial
    PG step with pseudo-counts N = nansum(Y + R, replicates)."""

    def __init__(self, Y, nembeds, R_init=None, nmetropolis=30,
                 rpropstdev=0.1, rstdev=1.0, rdims=(0, 1, 2), **kwargs):
        if Y.ndim == 3:
            Y = Y[..., None]
        self.Yrep = np.asarray(Y, float)                   # (n, m, t, r)
        missing = np.all(np.isnan(self.Yrep), axis=-1)
        Ysum = np.nansum(self.Yrep, axis=-1)
        Ysum[missing] = np.nan
        super().__init__(Ysum[..., None], 1.0, nembeds, **kwargs)
        self.nmetropolis = nmetropolis
        self.rpropstdev, self.rstdev = rpropstdev, rstdev
        self.rdims = [3] + sorted(rdims)[::-1]
        R_size = [1 if i in rdims else c
                  for i, c in enumerate(self.Yrep.shape[:3])]
        if R_init is None:
            # factor.py:558-563 (incl. the reference's +1 TEMP shift)
            self.R = np.exp(self.rng.normal(0, rstdev, size=R_size)) + 1
        else:
            self.R = np.broadcast_to(np.asarray(R_init, float),
                                     R_size).copy()
        self._update_N()

    def _update_N(self):
        missing = np.all(np.isnan(self.Yrep), axis=-1)
        N = np.nansum(self.Yrep + self.R[..., None], axis=-1)
        self.Nb = np.where(missing, np.nan, N)

    def _resample_R(self):
        # factor.py:513-550: vectorized log-space random walk
        rng = self.rng
        from scipy.stats import norm as _n
        R = self.R[..., None]
        logR = np.log(R)
        P = 1 / (1 + np.exp(-np.clip(
            np.einsum("nk,mtk->nmt", self.W, self.V), -10, 10)))[..., None]
        log1mP = np.log1p(-P)
        for _ in range(self.nmetropolis):
            cand_logR = logR + rng.normal(0, self.rpropstdev,
                                          size=logR.shape)
            cand_R = np.exp(cand_logR)
            acc_prior = _n.logpdf(cand_logR, 0, self.rstdev) \
                - _n.logpdf(logR, 0, self.rstdev)
            with np.errstate(all="ignore"):
                acc_lik = (gammaln(self.Yrep + cand_R) - gammaln(cand_R)
                           - gammaln(self.Yrep + R) + gammaln(R)
                           + (cand_R - R) * log1mP)
            for dim in self.rdims:
                acc_lik = np.nansum(acc_lik, axis=dim, keepdims=True)
            acc = np.exp(np.clip(
                acc_prior + np.broadcast_to(acc_lik, acc_prior.shape),
                -10, 1))
            take = (rng.random(size=acc.shape) <= acc) & (cand_R > 1)
            logR = np.where(take, cand_logR, logR)
            R = np.exp(logR)
        self.R = R[..., 0]
        self._update_N()

    def sweep(self):
        self._resample_R()
        self._resample_nu2()
        self.resample_priors()
        self._gaussian_updates()

    def run_gibbs(self, nburn, nthin, nsamples, print_freq=0):
        store = {"W": [], "V": [], "Tau2": [], "lam2": [], "sigma2": [],
                 "R": []}
        total = nburn + nthin * nsamples
        for step in range(total):
            self.sweep()
            if step >= nburn and (step - nburn) % nthin == nthin - 1:
                self.collect(store)
                store["R"].append(self.R.copy())
            if print_freq and step % print_freq == 0:
                print(f"\tStep {step}/{total}", flush=True)
        return {kk: np.asarray(vv) for kk, vv in store.items()}


# ---------------------------------------------------------------------------
class ConstrainedBlackBoxCPU(ConstrainedPoissonCPU):
    """Reference-pattern constrained BTF with a black-box cell likelihood
    (the doseresponse pipeline's EB GammaGridLikelihood, reference
    fit.py:28-50), optional fixed/updated Row_constraints (fit.py:116-137)
    and the binary row-feature cross-entropy term. The Markov kernels are
    identical to ConstrainedPoissonCPU; only the likelihood slices differ.

    `row_ll_fn(i, tau_cands)` / `col_ll_fn(j, tau_cands)` map candidate
    curve tensors to (G,) log-likelihoods: tau_cands is (G, m, T) for row
    updates and (G, n, T) for column updates. Both arms of the
    head-to-head share these callables (identical likelihood arithmetic,
    different samplers).
    """

    def __init__(self, Y, nembeds, CA, CC, row_ll_fn, col_ll_fn,
                 Row_constraints=None, X=None, U=None, **kw):
        super().__init__(Y, nembeds, CA, CC, **kw)
        self.row_ll_fn = row_ll_fn
        self.col_ll_fn = col_ll_fn
        self.Row_constraints = Row_constraints
        self.X, self.U = X, U

    def _row_ll(self, i, ep_A=None, ep_b=None):
        Vfull = self.V

        def ll(w_cands):                                   # (G, nd)
            nd = w_cands.shape[1]
            tau = np.einsum("ga,mta->gmt", w_cands, Vfull[..., :nd])
            out = np.asarray(self.row_ll_fn(i, tau), float)
            if self.X is not None and self.U is not None:
                WU = np.clip(w_cands @ self.U[:, :nd].T, 1e-6, 1 - 1e-6)
                x_i = self.X[i]
                with np.errstate(all="ignore"):
                    ce = x_i[None] * np.log(WU) \
                        + (1 - x_i[None]) * np.log(1 - WU)
                out = out + np.where(np.isnan(x_i[None]), 0.0, ce).sum(axis=1)
            if ep_A is not None:
                out = out + 0.5 * np.einsum("ga,ab,gb->g", w_cands, ep_A,
                                            w_cands) - w_cands.dot(ep_b)
            return out
        return ll

    def _col_ll(self, j, ep_G=None, ep_rhs=None):
        T, k = self.ndepth, self.nembeds
        Wt = self.W.T.copy()

        def ll(v_cands):                                   # (G, T*k) t-major
            Vj = v_cands.reshape(-1, T, k)
            tau = np.matmul(Vj, Wt).transpose(0, 2, 1)     # (G, n, T)
            out = np.asarray(self.col_ll_fn(j, tau), float)
            if ep_G is not None:
                out = out + 0.5 * np.einsum("gta,tab,gtb->g", Vj, ep_G, Vj) \
                    - np.einsum("gta,ta->g", Vj, ep_rhs)
            return out
        return ll

    def _resample_W(self):
        """Poisson engine's W update + the fixed Row_constraints rows
        (factor.py:722-724 / fit.py:116-118)."""
        rng, k = self.rng, self.nembeds
        A_full = np.einsum("jt,mta->mja", self.CA, self.V).reshape(-1, k)
        c_full = np.tile(self.CC, self.ncols)
        if self.Row_constraints is not None:
            A_full = np.concatenate(
                [A_full, self.Row_constraints[:, :k]], axis=0)
            c_full = np.concatenate(
                [c_full, self.Row_constraints[:, k]], axis=0)
        for i in range(self.nrows):
            nd = min(k, i + 1)
            A = A_full[:, :nd]
            ep_A = ep_b = None
            if self.Mu_ep is not None:
                Vd = self.V[..., :nd]
                ep_A = np.einsum("mt,mta,mtb->ab", self.Sinv2[i], Vd, Vd)
                ep_b = np.einsum("mt,mta->a",
                                 self.Mu_ep[i] * self.Sinv2[i], Vd)
                Q = ep_A + np.eye(nd) / self.sigma2
                U_ = dense_cholesky(Q)
                mu = cho_solve((U_, False), ep_b)
                v = solve_triangular(U_, rng.normal(size=nd), lower=False)
            else:
                mu = np.zeros(nd)
                v = np.sqrt(self.sigma2) * rng.normal(size=nd)
            ll = self._row_ll(i, ep_A, ep_b)
            w_new, _ = gass_step(rng, self.W[i, :nd], v, mu,
                                 lambda x, A=A: A.dot(x), c_full, ll,
                                 ngrid=self.ngrid)
            self.W[i, :nd] = w_new

    def resample_U(self, u_ll_fn, ngrid=64):
        """Feature-embedding GASS step (reference fit.py:113-144): per
        feature column p, u_p under W u in [0, 1] row constraints; then
        refresh Row_constraints."""
        rng = self.rng
        W = self.W
        n = W.shape[0]
        A = np.concatenate([W, -W], axis=0)
        c = np.concatenate([np.zeros(n), -np.ones(n)])
        for p in range(self.U.shape[0]):
            v = rng.normal(size=self.U.shape[1])
            ll = lambda cands, p=p: u_ll_fn(p, cands)
            u_new, _ = gass_step(rng, self.U[p], v, np.zeros_like(v),
                                 lambda x: A.dot(x), c, ll, ngrid=ngrid)
            self.U[p] = u_new
        RC0 = np.concatenate([self.U, np.zeros((self.U.shape[0], 1))], axis=1)
        RC1 = np.concatenate([-self.U,
                              np.full((self.U.shape[0], 1), -1.0)], axis=1)
        self.Row_constraints = np.concatenate([RC0, RC1], axis=0)
