"""Fused GASS candidate-likelihood Pallas kernels.

The GASS hot loop evaluates a batched log-likelihood at `ngrid` candidate
points (reference gass.py:113-114); in the BTF models each candidate's
curve tensor tau = cands @ B is a (ngrid, ncells) intermediate that XLA
materializes in HBM before the elementwise likelihood reduces it — at the
roofline shape (128x128x256, k=16) that traffic is ~2 GB/sweep each for
the W and V updates while the sweep is bandwidth-bound at ~50% HBM util
(bench/roofline.json). These kernels fuse matmul -> elementwise cell
log-likelihood -> reduction in VMEM so tau never touches HBM.

The cell likelihood is a jax-traceable elementwise callable
``cell_fn(y, tau, *extras) -> ll`` (same-shape arrays in, per-cell ll
out) that MUST return 0 where y is NaN — padding cells are NaN-filled.
EP centering composes as extra per-cell operands (mu_ep, sigma_ep).

Two contract notes for cell_fn bodies:

* Omit terms that depend on ``y`` alone (e.g. the Poisson's
  ``-gammaln(y+1)``). They are additive constants across candidates AND
  across the current point — GASS evaluates ``cur_ll`` with the same
  function (samplers/gass.py:96), so they cancel exactly from the slice
  test and the Markov chain is unchanged.
* The body must lower through Pallas TPU, which supports the elementwise
  core (exp/log/pow/where/select and friends) but NOT ``lgamma`` — the
  main reason the previous point is a requirement in practice, not just
  an optimization. Interpret mode (CPU meshes) accepts anything
  traceable, so validate TPU-only primitives on a real device.

Numerics note: tau accumulates on the MXU at f32
(preferred_element_type), matching the dot_general the fused path
replaces; the per-cell lls accumulate in f32 lanes and reduce once at
the end — same reassociation class as the XLA reduction, validated
distributionally (tests/test_fused_ll.py) and by the politics-parity
flow.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_row_ll", "fused_col_block_ll"]

_LANES = 128


def _pad_to(x, size, axis, value):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _row_kernel(cell_fn, n_extras, cands_ref, b_ref, y_ref, *rest):
    extras = [r[0][None, :] for r in rest[:n_extras]]
    out_ref = rest[n_extras]
    tau = jnp.dot(cands_ref[:], b_ref[:],
                  preferred_element_type=jnp.float32)      # (Gp, ct)
    vals = cell_fn(y_ref[0][None, :], tau, *extras)        # (Gp, ct)
    gp, ct = vals.shape
    partial = vals.reshape(gp, ct // _LANES, _LANES).sum(axis=1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = partial

    @pl.when(pl.program_id(0) != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def fused_row_ll(cands, B, y, cell_fn, extras=(), c_tile=2048,
                 interpret=False):
    """ll[g] = sum_c cell_fn(y[c], (cands @ B)[g, c], *extras[c]).

    cands: (G, k); B: (k, C); y: (C,) with NaN = missing/padded;
    extras: per-cell (C,) arrays (padded with 1.0). Returns (G,) f32.
    Serves the W-update candidate evaluation: B = V.reshape(m*T, k).T,
    y = the row's flattened data.
    """
    G, k = cands.shape
    C = B.shape[1]
    gp = max(8, -(-G // 8) * 8)
    c_tile = min(c_tile, max(_LANES, -(-C // _LANES) * _LANES))
    cp = -(-C // c_tile) * c_tile
    cands_p = _pad_to(cands.astype(jnp.float32), gp, 0, 0.0)
    B_p = _pad_to(B.astype(jnp.float32), cp, 1, 0.0)
    y_p = _pad_to(y.astype(jnp.float32).reshape(1, -1), cp, 1, np.nan)
    extras_p = [_pad_to(e.astype(jnp.float32).reshape(1, -1), cp, 1, 1.0)
                for e in extras]

    grid = (cp // c_tile,)
    in_specs = [
        pl.BlockSpec((gp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, c_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, c_tile), lambda i: (0, i),
                      memory_space=pltpu.VMEM) for _ in extras_p]
    out = pl.pallas_call(
        functools.partial(_row_kernel, cell_fn, len(extras_p)),
        out_shape=jax.ShapeDtypeStruct((gp, _LANES), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gp, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cands_p, B_p, y_p, *extras_p)
    return out.sum(axis=1)[:G]


def _col_kernel(cell_fn, n_extras, cands_ref, w_ref, y_ref, *rest):
    extras = [r[0] for r in rest[:n_extras]]                # (1, nt)
    out_ref = rest[n_extras]
    tau = jnp.dot(cands_ref[0], w_ref[:],
                  preferred_element_type=jnp.float32)       # (Gp, nt)
    vals = cell_fn(y_ref[0], tau, *extras)
    gp, nt = vals.shape
    partial = vals.reshape(gp, nt // _LANES, _LANES).sum(axis=1)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        out_ref[:] = partial

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + partial


def fused_col_block_ll(cands3, Wn, y, cell_fn, extras=(), n_tile=2048,
                       interpret=False):
    """ll[g] = sum_{t,i} cell_fn(y[t,i], tau[g,t,i], *extras[t,i]) with
    tau[g, t, i] = sum_k cands3[g, t, k] Wn[i, k].

    cands3: (G, Tb, k) block candidates; Wn: (n, k); y: (Tb, n) with
    NaN = missing. Serves the blocked V-update candidate evaluation.

    Layout note: the t axis LEADS every blocked operand ((Tb, G, k)
    candidates, (Tb, 1, n) data) so each block's last two dims are either
    full array dims or (8, 128)-tile multiples — the Mosaic lowering
    rejects sub-tile blocks on the minor two axes (a constraint interpret
    mode does not check).
    """
    G, Tb, k = cands3.shape
    n = Wn.shape[0]
    gp = max(8, -(-G // 8) * 8)
    n_tile = min(n_tile, max(_LANES, -(-n // _LANES) * _LANES))
    npad = -(-n // n_tile) * n_tile
    cands_p = _pad_to(jnp.swapaxes(cands3.astype(jnp.float32), 0, 1),
                      gp, 1, 0.0)                           # (Tb, Gp, k)
    Wt = _pad_to(Wn.astype(jnp.float32).T, npad, 1, 0.0)    # (k, npad)
    y_p = _pad_to(y.astype(jnp.float32)[:, None, :], npad, 2, np.nan)
    extras_p = [_pad_to(e.astype(jnp.float32)[:, None, :], npad, 2, 1.0)
                for e in extras]                            # (Tb, 1, npad)

    grid = (Tb, npad // n_tile)
    in_specs = [
        pl.BlockSpec((1, gp, k), lambda t, j: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n_tile), lambda t, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_tile), lambda t, j: (t, 0, j),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, 1, n_tile), lambda t, j: (t, 0, j),
                      memory_space=pltpu.VMEM) for _ in extras_p]
    out = pl.pallas_call(
        functools.partial(_col_kernel, cell_fn, len(extras_p)),
        out_shape=jax.ShapeDtypeStruct((gp, _LANES), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gp, _LANES), lambda t, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cands_p, Wt, y_p, *extras_p)
    return out.sum(axis=1)[:G]
