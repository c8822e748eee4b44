"""Callback-path throughput: host callback vs traced callback
(VERDICT round-2 item 6).

The doseresponse features pipeline (reference fit.py:102-150) resamples a
U embedding every Gibbs step. The reference-contract host `callback` costs
one dispatch per sweep plus a device_get per retained draw; the
`traced_callback` compiles the same U step INTO the chunked Gibbs
executables. This bench builds the pipeline at the reference sim scale
(sim.py defaults: 10 cells x 11 drugs x 9 doses x 6 replicates, 20 binary
features) and measures steady-state sweeps/s for the two modes plus the
no-callback chunked baseline.

Usage: python bench/callback_path.py [--nsweeps 200]
Writes bench/callback_path.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsweeps", type=int, default=200)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                  "callback_path.json"))
    args = ap.parse_args()

    import pandas as pd
    from functionalmf_tpu.apps.doseresponse import fit as fit_mod
    from functionalmf_tpu.apps.doseresponse.sim import simulate, write_csv
    from functionalmf_tpu.apps.doseresponse.empirical_bayes import \
        estimate_likelihood

    tmp = tempfile.mkdtemp()
    sim = simulate()  # reference sim scale
    write_csv(sim, tmp)
    df = pd.read_csv(os.path.join(tmp, "data.csv"), header=0)
    Y, likelihood, cells, drugs, concs, controls = estimate_likelihood(
        df, nbins=20, tensor_outcomes=True, verbose=False)
    fdf = pd.read_csv(os.path.join(tmp, "features.csv"), index_col=0, header=0)
    X = np.array([fdf.loc[c].values if c in fdf.index
                  else np.full(len(fdf.columns), np.nan) for c in cells],
                 dtype=float)

    class A:  # the argparse surface init_model expects
        nembeds, tf_order, lam2, seed = 5, 2, 1e-1, 0
        sample_features, nchains = True, 1
        # huge nburn: the host callback's own U collection never triggers
        # inside the timed window (collection cost is measured separately by
        # run_gibbs's draw snapshots); nsamples only sizes a small buffer
        nburn, nthin, nsamples = 10 ** 9, 1, 8

    model, U_samples, U0 = fit_mod.init_model(Y, likelihood, A, X=X)
    data = {"Y": Y, "X": X, "U": U0}

    N = args.nsweeps
    rec = {"shape": list(Y.shape), "nfeatures": int(X.shape[1]),
           "nsweeps": N}

    def run(mode):
        # fresh model per mode: identical start, no compile-cache bleed
        m, _, U0m = fit_mod.init_model(Y, likelihood, A, X=X)
        d = {"Y": Y, "X": X, "U": U0m}
        kw = {}
        if mode == "host":
            kw["callback"] = fit_mod.make_u_step(A, X, np.zeros((1,) + U0m.shape))
        elif mode == "traced":
            kw["traced_callback"] = fit_mod.make_traced_u_step(X)
            kw["collect_data_keys"] = ("U",)
        # warm-up with IDENTICAL call shapes: the chunked executables are
        # cached per (nburn-chunk, nsamples-chunk) size, so a smaller
        # warm-up would leave compilation inside the timed region
        m.run_gibbs(d, nburn=N - 8, nthin=1, nsamples=8, verbose=False, **kw)
        t0 = time.time()
        m.run_gibbs(d, nburn=N - 8, nthin=1, nsamples=8, verbose=False, **kw)
        dt = time.time() - t0
        return N / dt

    for mode in ("none", "host", "traced"):
        sps = run(mode)
        rec[f"sweeps_per_sec_{mode}"] = round(sps, 2)
        print(f"{mode:>7}: {sps:8.2f} sweeps/s", flush=True)
    rec["traced_vs_host"] = round(rec["sweeps_per_sec_traced"]
                                  / rec["sweeps_per_sec_host"], 2)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
