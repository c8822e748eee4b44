"""Block-banded Cholesky/solve/sampling vs dense reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from functionalmf_tpu.ops.banded import (
    bands_to_dense,
    block_banded_cholesky,
    block_banded_solve,
    block_banded_solve_lower,
    block_banded_solve_upper,
    build_v_bands,
    sample_mvn_block_banded,
)
from functionalmf_tpu.ops.penalty import bayes_grid_penalty, penalty_half_bandwidth


def _make_system(rng, T=12, k=3, tf_order=2, m=2):
    p = penalty_half_bandwidth(tf_order)
    Delta = bayes_grid_penalty(T, tf_order)
    w = rng.gamma(2, 1, size=(m, Delta.shape[0]))
    DtLD = np.einsum("dt,jd,ds->jts", Delta, w, Delta)
    A = rng.normal(size=(m, T, k, 7))
    G = np.einsum("jtkr,jtlr->jtkl", A, A) * 0.3
    return jnp.asarray(DtLD, jnp.float32), jnp.asarray(G, jnp.float32), p


@pytest.mark.parametrize("tf_order", [0, 1, 2, 3])
def test_cholesky_matches_dense(rng, tf_order):
    DtLD, G, p = _make_system(rng, T=10, k=2, tf_order=tf_order)
    bands = build_v_bands(DtLD, G, p)
    Q = np.asarray(bands_to_dense(bands), dtype=np.float64)
    L = block_banded_cholesky(bands)
    Ld = np.asarray(bands_to_dense(L), dtype=np.float64)
    # L L^T == Q (bands_to_dense symmetrizes, so rebuild strictly lower)
    Ld = np.tril(Ld)
    for j in range(Q.shape[0]):
        np.testing.assert_allclose(Ld[j] @ Ld[j].T, Q[j], rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_solves_match_dense(rng):
    DtLD, G, p = _make_system(rng, T=14, k=3)
    bands = build_v_bands(DtLD, G, p)
    Q = np.asarray(bands_to_dense(bands), dtype=np.float64)
    L = block_banded_cholesky(bands)
    b = jnp.asarray(rng.normal(size=(2, 14, 3)), jnp.float32)
    x = np.asarray(block_banded_solve(L, b)).reshape(2, -1)
    for j in range(2):
        ref = np.linalg.solve(Q[j], np.asarray(b[j]).reshape(-1))
        np.testing.assert_allclose(x[j], ref, rtol=2e-3, atol=2e-3)

    # lower/upper individually
    z = np.asarray(block_banded_solve_lower(L, b)).reshape(2, -1)
    Ld = np.tril(np.asarray(bands_to_dense(L), dtype=np.float64))
    for j in range(2):
        np.testing.assert_allclose(z[j], np.linalg.solve(Ld[j], np.asarray(b[j]).reshape(-1)),
                                   rtol=2e-3, atol=2e-3)
    xu = np.asarray(block_banded_solve_upper(L, b)).reshape(2, -1)
    for j in range(2):
        np.testing.assert_allclose(xu[j],
                                   np.linalg.solve(Ld[j].T, np.asarray(b[j]).reshape(-1)),
                                   rtol=2e-3, atol=2e-3)


def test_sampling_moments(rng, key):
    DtLD, G, p = _make_system(rng, T=6, k=2, m=1)
    bands = build_v_bands(DtLD, G, p)
    Q = np.asarray(bands_to_dense(bands), dtype=np.float64)[0]
    mu_part = jnp.asarray(rng.normal(size=(1, 6, 2)), jnp.float32)

    draws = jax.vmap(lambda k_: sample_mvn_block_banded(
        k_, bands, mu_part=mu_part))(jax.random.split(key, 4000))
    X = np.asarray(draws)[:, 0].reshape(4000, -1)
    mean_ref = np.linalg.solve(Q, np.asarray(mu_part).reshape(-1))
    cov_ref = np.linalg.inv(Q)
    sd = np.sqrt(np.diag(cov_ref))
    assert np.all(np.abs(X.mean(0) - mean_ref) < 6 * sd / np.sqrt(4000) + 1e-3)
    np.testing.assert_allclose(np.cov(X.T), cov_ref, atol=6 * sd.max()**2 / np.sqrt(4000) + 1e-3)


@pytest.mark.slow
def test_conditional_block_draw(rng, key):
    """The blocked-V GASS machinery (models/constrained.py) relies on the
    conditional N(Q_bb^-1 (mu_b - Q_br x_r), Q_bb^-1) computed from band
    slices; verify mean and covariance against dense linear algebra."""
    from functionalmf_tpu.ops.banded import (
        block_banded_matvec, slice_bands, equilibrate_bands,
        block_banded_solve_upper)
    import jax
    T, k = 11, 2
    DtLD, G, p = _make_system(rng, T=T, k=k, m=1)
    bands = build_v_bands(DtLD, G, p)
    Q = np.asarray(bands_to_dense(bands), np.float64)[0]
    X = jnp.asarray(rng.normal(size=(1, T, k)), jnp.float32)
    mu_part = jnp.asarray(rng.normal(size=(1, T, k)), jnp.float32)

    s0, size = 4, 3
    sub = slice_bands(bands, s0, size)
    sub_e, scale = equilibrate_bands(sub)
    L = block_banded_cholesky(sub_e)
    qx = block_banded_matvec(bands, X)[:, s0:s0 + size]
    qbb = block_banded_matvec(sub, X[:, s0:s0 + size])
    rhs = mu_part[:, s0:s0 + size] - (qx - qbb)
    mu_b = np.asarray(block_banded_solve(L, rhs * scale) * scale)[0].reshape(-1)

    bidx = np.arange(s0 * k, (s0 + size) * k)
    ridx = np.setdiff1d(np.arange(T * k), bidx)
    Qbb = Q[np.ix_(bidx, bidx)]
    Qbr = Q[np.ix_(bidx, ridx)]
    xr = np.asarray(X).reshape(-1)[ridx]
    mu_ref = np.linalg.solve(Qbb, np.asarray(mu_part).reshape(-1)[bidx]
                             - Qbr @ xr)
    np.testing.assert_allclose(mu_b, mu_ref, rtol=1e-3, atol=1e-4)

    draws = jax.vmap(lambda kk: (block_banded_solve_upper(
        L, jax.random.normal(kk, (1, size, k))) * scale)[0])(
        jax.random.split(key, 20000))
    D = np.asarray(draws).reshape(20000, -1)
    cov_ref = np.linalg.inv(Qbb)
    np.testing.assert_allclose(np.cov(D.T), cov_ref,
                               atol=8 * np.abs(cov_ref).max() / np.sqrt(20000))


@pytest.mark.slow
def test_retiled_sampler_matches_dense(rng, key):
    """Super-block retiling is the same matrix: solve/sampling moments must
    match the dense reference, including non-divisible T (padding)."""
    import jax
    from functionalmf_tpu.ops.banded import sample_mvn_block_banded_retiled
    for T, B in [(12, 4), (13, 5), (7, 16)]:
        DtLD, G, p = _make_system(rng, T=T, k=2, m=1)
        bands = build_v_bands(DtLD, G, p)
        Q = np.asarray(bands_to_dense(bands), np.float64)[0]
        mu_part = jnp.asarray(rng.normal(size=(1, T, 2)), jnp.float32)
        draws = jax.vmap(lambda kk: sample_mvn_block_banded_retiled(
            kk, bands, mu_part=mu_part, B=B))(jax.random.split(key, 3000))
        X = np.asarray(draws)[:, 0].reshape(3000, -1)
        mean_ref = np.linalg.solve(Q, np.asarray(mu_part).reshape(-1))
        sd = np.sqrt(np.diag(np.linalg.inv(Q)))
        assert np.all(np.abs(X.mean(0) - mean_ref) < 7 * sd / np.sqrt(3000) + 2e-3), (T, B)
        np.testing.assert_allclose(X.std(0), sd, rtol=0.15, atol=1e-3)


def test_prior_only_bands(rng):
    # G=None builds the kron(I_1, DtLD) scalar-block system
    DtLD, _, p = _make_system(rng, T=9, k=1, m=3)
    bands = build_v_bands(DtLD, None, p)
    Q = np.asarray(bands_to_dense(bands), dtype=np.float64)
    L = block_banded_cholesky(bands)
    b = jnp.asarray(rng.normal(size=(3, 9, 1)), jnp.float32)
    x = np.asarray(block_banded_solve(L, b)).reshape(3, -1)
    for j in range(3):
        np.testing.assert_allclose(
            x[j], np.linalg.solve(Q[j], np.asarray(b[j]).reshape(-1)),
            rtol=2e-3, atol=2e-3)
