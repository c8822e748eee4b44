"""Headline benchmark: the constrained-Poisson BTF on a GDELT-shaped tensor
(politics/benchmark.py:66-97 config: 19x19x228, k=5, tf_order=2, positivity
constraints, gass_ngrid=100).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "min-ESS/s", "vs_baseline": N, ...}

Headline semantics (fixed from round 5 on; VERDICT round-4 items 1 and 5):
  * `value` = min-across-params ESS/sec of the PRODUCTION RECIPE — the
    red-black blocked schedule with ASIS interweaving (the shipped
    defaults) — i.e. the quality-adjusted speed number, not raw sweeps/s.
  * Every kernel is additionally reported under FIXED keys each round:
    {joint,blocked,redblack}_sweeps_per_sec, {...}_min_ess_per_sec, the
    32-chain pooled figures, so rounds are comparable without reading the
    bench source.
  * `regressions` compares every shared numeric key against the newest
    BENCH_r*.json in the repo root and flags >10% drops.

vs_baseline divides by bench/baseline_cpu.json — the measured throughput /
min-ESS/sec of a faithful numpy reimplementation of the reference
algorithm (bench/reference_cpu.py; the reference's native deps are not
installable in this image), scaled by its politics nthreads=3.

The joint arm keeps interweave OFF: it is the reference-parity kernel
(the reference has no such move — factor.py:143-153), and its sweeps/s is
the apples-to-apples comparison. The blocked arm also runs interweave OFF
for round-over-round comparability with BENCH_r03/r04.
"""
import glob
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from functionalmf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from functionalmf_tpu import ConstrainedNonconjugateBayesianTensorFiltering
from functionalmf_tpu.utils.diagnostics import min_ess_per_param, pooled_min_ess

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


def poisson_cellfn(y, tau):
    # the ONE extra likelihood contract (loglikelihood_cells and
    # loglikelihood_block are derived from it, models/constrained.py):
    # elementwise, 0 on NaN, y-only terms omitted (they cancel in the
    # GASS slice test)
    rate = jnp.clip(tau, 1e-8, None)
    y0 = jnp.where(jnp.isnan(y), 0.0, y)
    return jnp.where(jnp.isnan(y), 0.0, y0 * jnp.log(rate) - rate)


def _make_model(W0, V0, Constraints, **kw):
    base = dict(nembeds=NEMBEDS, tf_order=2, sigma2_init=0.5, lam2_init=0.1,
                W_init=W0, V_init=V0, gass_ngrid=100, seed=0)
    base.update(kw)
    return ConstrainedNonconjugateBayesianTensorFiltering(
        NROWS, NCOLS, NDEPTH, poisson_loglik, Constraints, **base)


def _time_sweeps(model, Y, nsweeps):
    """Warm (compiles + reaches the timed executable), then time."""
    model.run_gibbs(Y, nburn=nsweeps - 1, nthin=1, nsamples=1, verbose=False)
    t0 = time.time()
    model.run_gibbs(Y, nburn=nsweeps - 1, nthin=1, nsamples=1, verbose=False)
    return nsweeps / (time.time() - t0)


def _measure_ess(model, Y, warm, draws):
    """min-ESS/sec on a converged chain: warm to stationarity, pre-compile
    the collecting executable, then time the collection window.

    The end-to-end rate includes jax.device_get of ~90 MB of draws, which
    on the axon tunnel runs at single-digit MB/s and varies run-to-run
    (the r3->r4 'joint 397->371' slip and the r4->r5 per-sec deltas trace
    to this transfer, not the sampler: min-ESS per SWEEP is stable across
    rounds). The caller also derives a compute-only figure from the
    separately timed sweep rate."""
    model.run_gibbs(Y, nburn=warm, nthin=1, nsamples=1, verbose=False)
    S_chunk = min(draws, model.max_sweeps_per_call)
    model.run_gibbs(Y, nburn=0, nthin=1, nsamples=S_chunk, verbose=False)
    t0 = time.time()
    res = model.run_gibbs(Y, nburn=0, nthin=1, nsamples=draws, verbose=False)
    dt = time.time() - t0
    ess, k_slow, j_slow = min_ess_per_param(
        res, keys=("W", "V", "lam2", "sigma2"), max_params=128, detail=True)
    return ess / dt, ess / draws, f"{k_slow}[{j_slow}]", res


def _regressions(out):
    """Compare shared numeric keys against the newest BENCH_r*.json."""
    here = os.path.dirname(os.path.abspath(__file__))
    prev_files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                        key=lambda p: int(re.search(r"r0*(\d+)", p).group(1)))
    if not prev_files:
        return None, {}
    with open(prev_files[-1]) as f:
        prev = json.load(f).get("parsed", {})
    # round-4 key aliases -> round-5 fixed keys
    alias = {"blocked_sampler_sweeps_per_sec": "blocked_sweeps_per_sec"}
    prev = {alias.get(k, k): v for k, v in prev.items()}
    regs = {}
    for k, v in out.items():
        pv = prev.get(k)
        if (isinstance(v, (int, float)) and isinstance(pv, (int, float))
                and pv > 0 and ("per_sec" in k)):
            delta = v / pv - 1.0
            if delta < -0.10:
                regs[k] = {"prev": pv, "now": round(v, 4),
                           "delta_pct": round(100 * delta, 1)}
    return os.path.basename(prev_files[-1]), regs


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

    nsweeps = int(os.environ.get("BENCH_SWEEPS", "200"))
    ess_warm = int(os.environ.get("BENCH_ESS_WARM", "2000"))
    ess_draws = int(os.environ.get("BENCH_ESS_DRAWS", "1000"))

    out = {}
    nan_fb = 0.0
    models = []

    def track(m):
        models.append(m)
        return m

    try:
        # --- joint reference-parity kernel (factor.py:759-845 semantics) ---
        m_joint = track(_make_model(W0, V0, Constraints, v_block_size=None,
                                    interweave=False))
        out["joint_sweeps_per_sec"] = round(_time_sweeps(m_joint, Y, nsweeps), 3)
        eps, eps_sw, slow, _ = _measure_ess(m_joint, Y, ess_warm, ess_draws)
        out.update(joint_min_ess_per_sec=round(eps, 4),
                   joint_min_ess_per_sweep=round(eps_sw, 6),
                   joint_slowest_param=slow,
                   joint_min_ess_per_sec_compute=round(
                       eps_sw * out["joint_sweeps_per_sec"], 4))

        # --- blocked sequential kernel (round-3/4 comparability arm) ---
        m_blk = track(_make_model(W0, V0, Constraints,
                                  loglikelihood_cellfn=poisson_cellfn,
                                  interweave=False))
        out["blocked_sweeps_per_sec"] = round(_time_sweeps(m_blk, Y, nsweeps), 3)
        eps, eps_sw, slow, _ = _measure_ess(m_blk, Y, ess_warm, ess_draws)
        out.update(blocked_min_ess_per_sec=round(eps, 4),
                   blocked_min_ess_per_sweep=round(eps_sw, 6),
                   blocked_slowest_param=slow,
                   blocked_min_ess_per_sec_compute=round(
                       eps_sw * out["blocked_sweeps_per_sec"], 4))

        # --- red-black production recipe (v_schedule='redblack', ASIS
        # interweaving ON — the shipped default) ---
        m_rb = track(_make_model(W0, V0, Constraints, v_schedule="redblack",
                                 loglikelihood_cellfn=poisson_cellfn))
        out["redblack_sweeps_per_sec"] = round(_time_sweeps(m_rb, Y, nsweeps), 3)
        eps, eps_sw, slow, _ = _measure_ess(m_rb, Y, ess_warm, ess_draws)
        out.update(redblack_min_ess_per_sec=round(eps, 4),
                   redblack_min_ess_per_sweep=round(eps_sw, 6),
                   redblack_slowest_param=slow,
                   # device-only rate: per-sweep ESS x the (collection-free)
                   # sweep rate; excludes the tunnel-limited device_get of
                   # the 90 MB draw tensor (see _measure_ess docstring)
                   redblack_min_ess_per_sec_compute=round(
                       eps_sw * out["redblack_sweeps_per_sec"], 4))

        # same kernel without interweaving: isolates the ASIS effect
        m_rbn = track(_make_model(W0, V0, Constraints, v_schedule="redblack",
                                  loglikelihood_cellfn=poisson_cellfn,
                                  interweave=False))
        eps, eps_sw, slow, _ = _measure_ess(m_rbn, Y, ess_warm, ess_draws)
        out.update(redblack_noiw_min_ess_per_sec=round(eps, 4),
                   redblack_noiw_min_ess_per_sweep=round(eps_sw, 6),
                   redblack_noiw_slowest_param=slow)

        # --- 32-chain single-chip aggregate (bench/chains.json optimum) ---
        nch = int(os.environ.get("BENCH_CHAINS", "32"))
        nsw_c = max(150, nsweeps // 2)
        m_mc = track(_make_model(W0, V0, Constraints, v_schedule="redblack",
                                 loglikelihood_cellfn=poisson_cellfn,
                                 nchains=nch))
        rate = _time_sweeps(m_mc, Y, nsw_c)
        out[f"chain{nch}_redblack_chain_sweeps_per_sec"] = round(rate * nch, 1)
        # pooled min-ESS/sec: warm all chains, then a timed collection
        # window; pooled ESS = sum of per-chain ESS (diagnostics)
        mc_warm = int(os.environ.get("BENCH_CHAIN_ESS_WARM", "1000"))
        mc_draws = int(os.environ.get("BENCH_CHAIN_ESS_DRAWS", "400"))
        m_mc.run_gibbs(Y, nburn=mc_warm, nthin=1, nsamples=1, verbose=False)
        S_chunk = min(mc_draws, m_mc.max_sweeps_per_call)
        m_mc.run_gibbs(Y, nburn=0, nthin=1, nsamples=S_chunk, verbose=False)
        t0 = time.time()
        res = m_mc.run_gibbs(Y, nburn=0, nthin=1, nsamples=mc_draws,
                             verbose=False)
        dt = time.time() - t0
        pess, k_slow, j_slow = pooled_min_ess(res, nch, max_params=128,
                                              detail=True)
        out[f"chain{nch}_redblack_pooled_min_ess_per_sec"] = round(pess / dt, 3)
        out[f"chain{nch}_redblack_pooled_slowest_param"] = f"{k_slow}[{j_slow}]"
        out[f"chain{nch}_redblack_max_rhat"] = res.get("rhat", {}).get("max")
    except Exception as e:  # pragma: no cover - bench must always emit JSON
        out["bench_error"] = repr(e)[:300]

    for m in models:
        nan_fb += float(np.asarray(m.state["nan_fallbacks"]).sum())
    out["nan_fallbacks"] = nan_fb

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench", "baseline_cpu.json")
    base = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("sweeps_per_sec"):
            for k in ("joint", "blocked", "redblack"):
                v = out.get(f"{k}_sweeps_per_sec")
                if v:
                    out[f"{k}_vs_baseline_sweeps"] = round(
                        v / base["sweeps_per_sec"], 2)
        if base.get("min_ess_per_sec"):
            for k in ("joint", "blocked", "redblack"):
                v = out.get(f"{k}_min_ess_per_sec")
                if v:
                    out[f"{k}_vs_baseline_min_ess"] = round(
                        v / base["min_ess_per_sec"], 2)

    # headline: the production recipe's quality-adjusted number
    value = out.get("redblack_min_ess_per_sec")
    vs = out.get("redblack_vs_baseline_min_ess")
    unit = "min-ESS/s"
    if value is None:  # fall back to raw sweeps if the ESS arm failed
        value = out.get("redblack_sweeps_per_sec") or \
            out.get("blocked_sweeps_per_sec") or out.get("joint_sweeps_per_sec")
        vs = None
        unit = "sweeps/s"
    prev_name, regs = _regressions(out)
    final = {
        "metric": "min_ess_per_sec_gdelt_constrained_poisson_redblack",
        "value": value,
        "unit": unit,
        "vs_baseline": vs,
        "value_kernel": "redblack_interweave_production",
    }
    final.update(out)
    final["regressions"] = regs
    final["regressions_vs"] = prev_name
    print(json.dumps(final))


if __name__ == "__main__":
    main()
