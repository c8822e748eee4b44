"""Adapter around the optional `apf` package (Schein et al. 2016,
Poisson-Gamma Dynamical Systems) used as a comparison baseline and NMF
warm-start source (reference functionalmf/pgds.py:1-78).

The apf package is Cython and not a dependency of this framework; calling
fit_pgds without it raises ImportError, and the politics benchmark degrades
gracefully (functionalmf_tpu/apps/politics/benchmark.py warm-starts from
the training tensor instead).
"""
from __future__ import annotations

import numpy as np

__all__ = ["fit_pgds", "get_matrices"]


def fit_pgds(Y, nembeds,
             gam=10,            # total mass of the gamma process weights
             tau=1.0,           # concentration parameter
             eps=0.1,           # noninformative gamma prior
             stationary=False,  # global vs local shrinkage
             binary=False,
             nthreads=3,
             time_mode=2,       # tensor mode smoothed in time
             nburn=5000, nthin=10, nsamples=500,
             seed=42, verbose=0):
    """Fit PGDS, returning (Mu draws, (W, V, U) factor draws).

    Mirrors reference pgds.py:19-70: burn once, then alternate nthin-step
    fits with state extraction per retained sample.
    """
    try:
        from apf.models.pgds import PGDS
    except ImportError as e:
        raise ImportError(
            "fit_pgds requires the optional `apf` package "
            "(github.com/aschein/apf); install it to run the PGDS baseline"
        ) from e

    mask = np.isnan(Y).astype(int)
    data = np.ma.array(Y, mask=mask)
    data_shp = data.shape
    nrows, ncols, ndepth = Y.shape[:3]

    model = PGDS(data_shp=data_shp, core_shp=(nembeds,), time_mode=time_mode,
                 stationary=stationary, gam=gam, tau=tau, eps=eps,
                 binary=binary, seed=seed, n_threads=nthreads)
    Mu = np.zeros((nsamples, nrows, ncols, ndepth))
    W = np.zeros((nsamples, nrows, nembeds))
    V = np.zeros((nsamples, ncols, nembeds))
    U = np.zeros((nsamples, ndepth, nembeds))
    for step in range(nsamples + 1):
        model.fit(data,
                  n_itns=nthin if step > 0 else nburn,
                  initialize=step == 0,
                  verbose=verbose,
                  impute_after=0,
                  schedule={}, fix_state={}, init_state={})
        if step > 0:
            state = dict(model.get_state())
            W[step - 1], V[step - 1], U[step - 1] = [
                z.T for z in get_matrices(state, data_shp)]
            Mu[step - 1] = model.reconstruct()
    return Mu, (W, V, U)


def get_matrices(state, data_shp):
    """Per-mode factor matrices from an apf state dict (pgds.py:72-75)."""
    mtx_MKD = state["mtx_MKD"]
    for mode, D in enumerate(data_shp):
        yield mtx_MKD[mode][:, :D]
