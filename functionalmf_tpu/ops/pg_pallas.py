"""Fused Polya-Gamma sampling as a Pallas TPU kernel.

The PG augmentation is the hot op of the Binomial / Negative-Binomial
sweeps (one draw per tensor cell per sweep; ops/polyagamma.py). The plain
JAX path pays for counter-based threefry bits — tens of integer ops per
random number, times num_terms x rounds x 3 numbers per cell. This kernel
fuses the whole sampler — truncated sum-of-gammas with fixed-round
Marsaglia-Tsang rejection and exact tail-mean correction — into one VPU
pass using the TPU's hardware PRNG (pltpu.prng_random_bits), seeded
per (sweep, block) so draws stay reproducible and independent across grid
blocks.

Same estimator as ops/polyagamma.polya_gamma(use_mt=True): the mean is
exact; the variance deficit of the truncation is ~1e-4 at num_terms=16.

Status: measured ~0.4x the plain-XLA Marsaglia-Tsang path on a v5e chip —
XLA's fused threefry + transcendentals beat Mosaic's elementwise lowering
for this op, so the models default to ops/polyagamma.polya_gamma and this
kernel is kept as an alternative backend (it also does not yet batch under
vmap, which the chain axis requires). Revisit if the PG draw returns to the
profile top.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pg_pallas"]

_LANES = 128
_BLOCK_ROWS = 256  # (256, 128) f32 block = 128 KB per operand in VMEM


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # 24-bit mantissa uniform in (eps, 1). Mosaic lacks a uint32->f32 cast;
    # after >> 8 the value fits in 24 bits, so reinterpret as int32 first.
    i24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return i24.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-7


def _normal(shape):
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _pg_kernel(seed_ref, b_ref, c_ref, o_ref, *, num_terms, rounds):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    b = b_ref[:]
    c = c_ref[:]
    shape = b.shape

    pos = b > 0
    bs = jnp.where(pos, b, 1.0)
    small = bs < 1.0
    b_eff = jnp.where(small, bs + 1.0, bs)
    d = b_eff - 1.0 / 3.0
    cmt = jax.lax.rsqrt(9.0 * d)

    c_term = (c / (2.0 * jnp.pi)) ** 2
    two_pi_sq = 2.0 * jnp.pi**2

    acc = jnp.zeros(shape, jnp.float32)
    sum_inv = jnp.zeros(shape, jnp.float32)
    for k in range(num_terms):
        # --- one Gamma(b_eff, 1) draw via fixed-round Marsaglia-Tsang ---
        g = jnp.zeros(shape, jnp.float32)
        accepted = jnp.zeros(shape, jnp.bool_)
        for _ in range(rounds):
            x = _normal(shape)
            u = _uniform(shape)
            v = (1.0 + cmt * x) ** 3
            ok = (v > 0) & (jnp.log(u) < 0.5 * x * x + d - d * v
                            + d * jnp.log(jnp.where(v > 0, v, 1.0)))
            take = ok & (~accepted)
            g = jnp.where(take, d * v, g)
            accepted = accepted | ok
        g = jnp.where(accepted, g, b_eff)  # mean fallback, P < 2e-8/lane
        # small-shape boost: g(b) = g(b+1) * U^(1/b)
        ub = _uniform(shape)
        g = jnp.where(small, g * jnp.exp(jnp.log(ub) / bs), g)

        denom = (k + 0.5) ** 2 + c_term
        acc = acc + g / denom
        sum_inv = sum_inv + 1.0 / denom

    trunc = acc / two_pi_sq
    # exact tail mean: E[PG(b,c)] - E[truncated part]
    x = 0.5 * c
    small_c = jnp.abs(x) < 1e-4
    xs = jnp.where(small_c, 1.0, x)
    tanh_over = jnp.where(small_c, 1.0 - x * x / 3.0, jnp.tanh(xs) / xs)
    mean_full = 0.125 * bs * tanh_over * 2.0  # b/(2c) tanh(c/2) = b/4 * tanh_over
    mean_trunc = bs * sum_inv / two_pi_sq
    tail = jnp.maximum(mean_full - mean_trunc, 0.0)

    o_ref[:] = jnp.where(pos, trunc + tail, 0.0)


def pg_pallas(key, b, c, num_terms: int = 16, rounds: int = 6):
    """omega ~ PG(b, c) elementwise, as a single fused TPU kernel.

    Drop-in for ops/polyagamma.polya_gamma on TPU backends. The key is
    reduced to a 32-bit seed; grid blocks derive independent streams.
    """
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    shape = jnp.broadcast_shapes(b.shape, c.shape)
    b = jnp.broadcast_to(b, shape)
    c = jnp.broadcast_to(c, shape)

    n = 1
    for s in shape:
        n *= int(s)
    block = _BLOCK_ROWS * _LANES
    n_pad = -(-max(n, 1) // block) * block
    bf = jnp.pad(b.reshape(-1), (0, n_pad - n)).reshape(-1, _LANES)
    cf = jnp.pad(c.reshape(-1), (0, n_pad - n)).reshape(-1, _LANES)
    nblocks = bf.shape[0] // _BLOCK_ROWS

    seed = jax.random.randint(key, (1,), minval=jnp.iinfo(jnp.int32).min,
                              maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

    kernel = functools.partial(_pg_kernel, num_terms=num_terms, rounds=rounds)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(bf.shape, jnp.float32),
    )(seed, bf, cf)
    return out.reshape(-1)[:n].reshape(shape)
