"""Headline benchmark: Gibbs sweeps/sec of the constrained-Poisson BTF on a
GDELT-shaped tensor (politics/benchmark.py:66-97 config: 19x19x228, k=5,
tf_order=2, positivity constraints, gass_ngrid=100).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sweeps/s", "vs_baseline": N}

vs_baseline compares against bench/baseline_cpu.json — the measured
throughput of a faithful numpy reimplementation of the reference algorithm
(see bench/reference_cpu.py; the reference's own native deps are not
installable in this image), scaled by its politics nthreads=3.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from functionalmf_tpu import ConstrainedNonconjugateBayesianTensorFiltering

NROWS, NCOLS, NDEPTH, NEMBEDS = 19, 19, 228, 5


def poisson_loglik(Y, WV, W, V, row=None, col=None):
    if row is not None:
        Y = Y[row]
    if col is not None:
        Y = Y[:, col]
    if Y.ndim > WV.ndim:
        WV = WV[..., None]
    rate = jnp.clip(WV, 1e-8, None)
    Y0 = jnp.where(jnp.isnan(Y), 0.0, Y)
    ll = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.0)
    return jnp.sum(jnp.where(jnp.isnan(Y), 0.0, ll))


def poisson_loglik_block(Y, WV, W, V, row=None, col=None, tslice=None):
    # depth-decomposable fast path for the blocked-V sampler (the Poisson
    # likelihood factorizes over cells)
    s0, e0 = tslice
    Yb = Y[:, col, s0:e0]
    if Yb.ndim > WV.ndim:  # replicate axis (parity with the example/app
        WV = WV[..., None]  # versions of this likelihood)
    rate = jnp.clip(WV, 1e-8, None)
    Y0 = jnp.where(jnp.isnan(Yb), 0.0, Yb)
    ll = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.0)
    return jnp.sum(jnp.where(jnp.isnan(Yb), 0.0, ll))


def main():
    rng = np.random.default_rng(42)
    W = np.abs(rng.normal(1, 0.3, size=(NROWS, NEMBEDS)))
    W[np.triu_indices(NEMBEDS, k=1)] = 0
    V = np.abs(rng.normal(1, 0.3, size=(NCOLS, NDEPTH, NEMBEDS)))
    Y = rng.poisson(np.einsum("nk,mtk->nmt", W, V)).astype(float)
    hold = rng.random((NROWS, NCOLS)) < 0.1
    Y[hold] = np.nan

    Constraints = np.concatenate([np.eye(NDEPTH), np.zeros((NDEPTH, 1))], axis=1)
    W0 = np.abs(rng.normal(1, 0.2, size=(NROWS, NEMBEDS)))
    W0[np.triu_indices(NEMBEDS, k=1)] = 0
    V0 = np.abs(rng.normal(1, 0.2, size=(NCOLS, NDEPTH, NEMBEDS)))

    # Headline: the reference's exact algorithm (joint per-column GASS,
    # v_block_size=None) — the apples-to-apples sweeps/sec comparison.
    model = ConstrainedNonconjugateBayesianTensorFiltering(
        NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
        nembeds=NEMBEDS, tf_order=2, sigma2_init=0.5, lam2_init=0.1,
        W_init=W0, V_init=V0, gass_ngrid=100, v_block_size=None, seed=0)

    # warmup with the same static (nburn, nthin, nsamples) signature so the
    # timed run reuses the compiled executable
    nsweeps = int(os.environ.get("BENCH_SWEEPS", "200"))
    model.run_gibbs(Y, nburn=nsweeps - 1, nthin=1, nsamples=1, verbose=False)

    t0 = time.time()
    model.run_gibbs(Y, nburn=nsweeps - 1, nthin=1, nsamples=1, verbose=False)
    dt = time.time() - t0
    sweeps_per_sec = nsweeps / dt

    # Secondary: the default blocked-V sampler (an exact Gibbs variant this
    # framework adds; ~20x better per-sweep movement at ~40% the sweep rate)
    # plus its min-across-params ESS/sec (BASELINE.md's quality-adjusted
    # speed denominator).
    blocked_sweeps = ess_per_sec = None
    try:
        from functionalmf_tpu.utils.diagnostics import min_ess_per_param
        model_b = ConstrainedNonconjugateBayesianTensorFiltering(
            NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
            nembeds=NEMBEDS, tf_order=2, sigma2_init=0.5, lam2_init=0.1,
            W_init=W0, V_init=V0, gass_ngrid=100, seed=0,
            loglikelihood_block=poisson_loglik_block)
        model_b.run_gibbs(Y, nburn=nsweeps - 1, nthin=1, nsamples=1,
                          verbose=False)
        t0 = time.time()
        model_b.run_gibbs(Y, nburn=nsweeps - 1, nthin=1, nsamples=1,
                          verbose=False)
        blocked_sweeps = nsweeps / (time.time() - t0)
        ns = max(100, nsweeps)
        t0 = time.time()
        res = model_b.run_gibbs(Y, nburn=0, nthin=1, nsamples=ns, verbose=False)
        dt_s = time.time() - t0
        ess = min_ess_per_param(res, keys=("W", "lam2", "sigma2"),
                                max_params=128)
        ess_per_sec = ess / dt_s
    except Exception:
        pass

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench", "baseline_cpu.json")
    vs = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            vs = sweeps_per_sec / json.load(f)["sweeps_per_sec"]

    out = {
        "metric": "gibbs_sweeps_per_sec_gdelt_constrained_poisson",
        "value": round(sweeps_per_sec, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    if blocked_sweeps is not None:
        out["blocked_sampler_sweeps_per_sec"] = round(blocked_sweeps, 3)
    if ess_per_sec is not None:
        out["blocked_min_ess_per_sec"] = round(ess_per_sec, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
