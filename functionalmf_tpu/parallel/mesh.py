"""Device-mesh sharding for BTF Gibbs state.

The reference's "distributed backend" is a POSIX shared-memory segment plus
a process pool (factor.py:929-1000). The TPU-native equivalent is a
`jax.sharding.Mesh` with two axes:

  * ``dp``  — chains (pure data parallelism; the genlasso.py:38 TODO)
  * ``mp``  — rows/columns of the tensor (the reference's intra-sweep
    fan-out, factor.py:984-1000): W-row GASS/ridge updates shard over rows,
    V-column updates shard over columns. Cross-shard terms (the lam2 rate
    reduction, the opposite-embedding constraint assembly) lower to XLA
    collectives over ICI automatically under jit.

State arrays carry a leading chain axis; W/Tau2/V shard their first
model axis (rows / columns respectively) over ``mp``.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "state_shardings", "shard_state", "DP_AXIS", "MP_AXIS"]

DP_AXIS = "dp"
MP_AXIS = "mp"


def make_mesh(n_dp: int = 1, n_mp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, mp) mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    if n_mp is None:
        n_mp = len(devices) // n_dp
    devs = np.array(devices[: n_dp * n_mp]).reshape(n_dp, n_mp)
    return Mesh(devs, (DP_AXIS, MP_AXIS))


def state_shardings(mesh: Mesh, state: dict) -> dict:
    """PartitionSpecs for a BTF state dict (leading axis = chains).

    W (C, n, k) and Tau2 ladders (C, m, nD) shard their second axis over
    mp; V (C, m, T, k) shards columns over mp; scalars replicate over mp.
    """
    def spec(name, v):
        if v.ndim >= 3 and name in ("W", "V"):
            return P(DP_AXIS, MP_AXIS)
        if v.ndim == 3 and name.startswith("Tau2"):
            return P(DP_AXIS, MP_AXIS)
        if v.ndim >= 2 and name == "R":
            return P(DP_AXIS)
        if v.ndim >= 2 and name == "nu2":
            return P(DP_AXIS, MP_AXIS)
        return P(DP_AXIS)

    return {k: NamedSharding(mesh, spec(k, v)) for k, v in state.items()}


def shard_state(state: dict, mesh: Mesh) -> dict:
    shardings = state_shardings(mesh, state)
    return {k: jax.device_put(v, shardings[k]) for k, v in state.items()}
