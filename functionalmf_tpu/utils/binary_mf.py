"""Binary (logistic) matrix factorization with CV'd ridge selection.

Host-side reimplementation of binary_mf and the logistic-regression loss
helpers (reference functionalmf/utils.py:494-629). Used by application
pipelines as a baseline/initializer.
"""
from __future__ import annotations

import numpy as np

from functionalmf_tpu.utils.metrics import cross_entropy, ilogit

__all__ = ["binary_mf", "logistic_regression_loss", "logistic_regression_grad"]


def logistic_regression_loss(X, y, lam, beta):
    """utils.py:494-498."""
    intercept = beta[-1] if len(beta) > X.shape[1] else 0
    beta = beta[:-1] if len(beta) > X.shape[1] else beta
    preds = ilogit(X.dot(beta) + intercept).clip(1e-6, 1 - 1e-6)
    return -(y * np.log(preds) + (1 - y) * np.log(1 - preds)).mean() + lam * (beta ** 2).sum()


def logistic_regression_grad(X, y, lam, beta):
    """utils.py:500-508."""
    grad = np.zeros(len(beta))
    intercept = beta[-1] if len(beta) > X.shape[1] else 0
    b = beta[:-1] if len(beta) > X.shape[1] else beta
    preds = ilogit(X.dot(b) + intercept).clip(1e-6, 1 - 1e-6)
    grad[:X.shape[1]] = X.T.dot(preds - y) + lam * b
    if len(grad) > X.shape[1]:
        grad[-1] = (preds - y).mean()
    return grad


def binary_mf(Y, nembeds=None, lam=None, lams=30, cv=5, max_steps=30,
              tol=1e-4, verbose=False, rng=None):
    """Alternating L2-regularized logistic regression MF (utils.py:550-629)."""
    from sklearn.linear_model import LogisticRegression
    rng = np.random.default_rng() if rng is None else rng
    Y = np.asarray(Y, dtype=float)

    if lam is None and isinstance(lams, int):
        lams = np.exp(np.linspace(np.log(1e-2), np.log(1), lams))

    if lam is None:
        from sklearn.model_selection import KFold
        cv_scores = np.zeros((len(lams), cv))
        indices = np.array([[i, j] for i, j in np.ndindex(Y.shape)
                            if not np.isnan(Y[i, j])])
        kf = KFold(n_splits=cv, shuffle=True, random_state=0)
        for cv_idx, (train_index, test_index) in enumerate(kf.split(indices)):
            if verbose:
                print("Fold {}/{}".format(cv_idx + 1, cv))
            for lam_idx, cur_lam in enumerate(lams):
                Y_train = np.copy(Y)
                for i, j in indices[test_index]:
                    Y_train[i, j] = np.nan
                W, V = binary_mf(Y_train, nembeds, lam=cur_lam,
                                 verbose=verbose > 1, rng=rng)
                Mu = ilogit(W.dot(V.T))
                Y_test = np.array([Y[i, j] for i, j in indices[test_index]])
                Mu_test = np.array([Mu[i, j] for i, j in indices[test_index]])
                cv_scores[lam_idx, cv_idx] = cross_entropy(Y_test, Mu_test)
                if verbose:
                    print("\tLam {}/{} ({:.4f}) loss: {:.6f}".format(
                        lam_idx + 1, len(lams), cur_lam, cv_scores[lam_idx, cv_idx]))
        best_lam = lams[np.argmax(cv_scores.mean(axis=1))]
        if verbose:
            print("Best lam: {:.6f}".format(best_lam))
        return binary_mf(Y, nembeds, lam=best_lam, verbose=verbose, rng=rng)

    W = rng.normal(0, 1 / np.sqrt(nembeds), size=(Y.shape[0], nembeds))
    V = rng.normal(0, 1 / np.sqrt(nembeds), size=(Y.shape[1], nembeds))
    clf = LogisticRegression(C=lam, fit_intercept=False, solver="lbfgs")

    prev_loss = cross_entropy(Y, ilogit(W.dot(V.T)))
    missing = np.isnan(Y)
    for step in range(max_steps):
        if verbose:
            print("Step {}/{}".format(step + 1, max_steps))
        for i in range(Y.shape[0]):
            if (~missing[i]).sum() and len(np.unique(Y[i, ~missing[i]])) > 1:
                clf.fit(V[~missing[i]], Y[i, ~missing[i]])
                W[i] = clf.coef_[0]
        for i in range(Y.shape[1]):
            col_obs = ~missing[:, i]
            if col_obs.sum() and len(np.unique(Y[col_obs, i])) > 1:
                clf.fit(W[col_obs], Y[col_obs, i])
                V[i] = clf.coef_[0]
        loss = cross_entropy(Y, ilogit(W.dot(V.T)))
        if verbose:
            print("Loss: {:.6f}".format(loss))
        if loss - prev_loss < tol:
            break
        prev_loss = loss
    return W, V
