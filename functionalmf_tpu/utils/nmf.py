"""Nonnegative tensor factorization warm-start.

Host-side reimplementation of tensor_nmf (reference functionalmf/utils.py:
276-420): ALS with per-row / per-(column, depth) NNLS, lower-triangular W,
optional monotone PAV projection, optional max_entry SLSQP projection, and
optional row-feature coupling returning (W, V, R). Used to initialize the
constrained models at a feasible point (examples/poisson:67-70,
doseresponse/fit.py:310-319).

The NNLS inner solver prefers the native C++ Lawson–Hanson implementation
(functionalmf_tpu.utils.native) and falls back to scipy.
"""
from __future__ import annotations

import numpy as np

__all__ = ["tensor_nmf"]


def _nnls(A, b):
    try:
        from functionalmf_tpu.utils.native import nnls as _nnls_native
        return _nnls_native(np.ascontiguousarray(A, dtype=np.float64),
                            np.ascontiguousarray(b, dtype=np.float64))
    except Exception:
        from scipy.optimize import nnls as _scipy_nnls
        return _scipy_nnls(A, b)[0]


def _project_max_entry(fun_A, b, x0, constraint_fns, max_entry):
    from scipy.optimize import minimize

    def fun(x):
        return 0.5 * ((b - x.dot(fun_A.T)) ** 2).sum()

    cons = tuple({"type": "ineq", "fun": f} for f in constraint_fns)
    res = minimize(fun, x0=x0, constraints=cons, method="SLSQP",
                   options={"ftol": 1e-8, "maxiter": 1000})
    return res.x


def tensor_nmf(Y, nembeds, max_steps=30, monotone=False,
               tol=1e-4, verbose=False, max_entry=None,
               W=None, V=None, fit_W=True, fit_V=True,
               row_features=None, rng=None):
    """ALS NMF of a 3-/4-tensor (utils.py:276-420)."""
    from functionalmf_tpu.utils.pav import factor_pav
    rng = np.random.default_rng() if rng is None else rng

    Y = np.asarray(Y, dtype=float)
    if W is None:
        W = rng.gamma(1, 1, size=(Y.shape[0], nembeds))
        if Y.shape[0] > 1:
            W[np.triu_indices(nembeds, k=1)] = 0
    if V is None:
        V = rng.gamma(1, 1, size=(Y.shape[1], Y.shape[2], nembeds))
    R = None
    if row_features is not None:
        R = rng.gamma(1, 1, size=(row_features.shape[1], nembeds))

    if Y.ndim == 3:
        Y = Y[..., None]

    rmse = np.inf
    for step in range(max_steps):
        if verbose:
            print("Step {}".format(step))
        prev_rmse = rmse

        if fit_W:
            V_mat = np.repeat(V.reshape((-1, V.shape[-1])), Y.shape[-1], axis=0)
            for i in range(W.shape[0]):
                Y_vec = Y[i].flatten()
                missing = np.isnan(Y_vec)
                A = V_mat[~missing]
                b = Y_vec[~missing]
                if row_features is not None:
                    row_missing = np.isnan(row_features[i])
                    A = np.concatenate([A, R[~row_missing]], axis=0)
                    b = np.concatenate([b, row_features[i, ~row_missing]])
                ndims = min(W.shape[1], i + 1)
                A = A[:, :ndims]
                W[i, :ndims] = _nnls(A, b).clip(1e-3, np.inf)
                if (max_entry is not None and
                        (W[i, None, None, :ndims] * V[..., :ndims]).sum(-1).max() > max_entry):
                    Vc = V[..., :ndims]
                    W[i, :ndims] = _project_max_entry(
                        A, b, W[i, :ndims],
                        [lambda x, Vc=Vc: max_entry - (x[None, None] * Vc).sum(-1).flatten(),
                         lambda x, Vc=Vc: (x[None, None] * Vc).sum(-1).flatten(),
                         lambda x: x - 1e-6],
                        max_entry)

        if fit_V:
            W_mat = np.repeat(W, Y.shape[-1], axis=0)
            for j in range(V.shape[0]):
                for t in range(V.shape[1]):
                    Y_vec = Y[:, j, t].flatten()
                    missing = np.isnan(Y_vec)
                    A = W_mat[~missing]
                    b = Y_vec[~missing]
                    V[j, t] = _nnls(A, b).clip(1e-3, np.inf)
                    if (max_entry is not None and
                            (V[None, j, t] * W).sum(-1).max() > max_entry):
                        V[j, t] = _project_max_entry(
                            A, b, V[j, t],
                            [lambda x: max_entry - x.dot(W.T),
                             lambda x: x.dot(W.T),
                             lambda x: x - 1e-6],
                            max_entry)
                if monotone:
                    factor_pav(W, V[j], in_place=True)

        if row_features is not None:
            for i in range(R.shape[0]):
                missing = np.isnan(row_features[:, i])
                if np.all(missing):
                    continue
                A = W[~missing]
                b = row_features[~missing, i]
                R[i] = _nnls(A, b).clip(1e-3, np.inf)
                if max_entry is not None and W.dot(R[i:i + 1].T).max() > max_entry:
                    R[i] = _project_max_entry(
                        A, b, R[i],
                        [lambda x: max_entry - x.dot(W.T),
                         lambda x: x.dot(W.T),
                         lambda x: x - 1e-6],
                        max_entry)

        rmse = np.sqrt(np.nansum(
            (Y - (W[:, None, None] * V[None]).sum(-1, keepdims=True)) ** 2))
        delta = (prev_rmse - rmse) / rmse if rmse > 0 else 0.0
        if verbose:
            print("delta: {}".format(delta))
        if delta <= tol:
            break

    if row_features is None:
        return W, V
    return W, V, R
