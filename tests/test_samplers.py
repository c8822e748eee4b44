"""ESS and GASS sampler correctness: exact-posterior and truncated-prior
distribution checks (replacing the reference's visual demos,
gass.py:326-395 and the benchmarks() harness)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from functionalmf_tpu.samplers.ess import elliptical_slice
from functionalmf_tpu.samplers.gass import gass


def _run_chain(step, x0, nsteps, key):
    def body(carry, i):
        x, ll = carry
        x, ll = step(jax.random.fold_in(key, i), x, ll)
        return (x, ll), x
    (_, _), xs = jax.lax.scan(body, (x0, step(key, x0, None)[1] * 0 - 1e30), jnp.arange(nsteps))
    return xs


def test_ess_gaussian_posterior(key):
    # prior x ~ N(0, 1), likelihood y=1.2 ~ N(x, 0.5^2)
    # posterior: N(y * 1/(1+0.25), ...) => mean = 1.2/(1.25)*... compute:
    s2_prior, s2_lik, y = 1.0, 0.25, 1.2
    post_var = 1.0 / (1 / s2_prior + 1 / s2_lik)
    post_mean = post_var * y / s2_lik

    def loglik(x):
        return -0.5 * (y - x[0]) ** 2 / s2_lik

    def step(k, x, ll):
        k1, k2 = jax.random.split(k)
        nu = jax.random.normal(k1, (1,)) * jnp.sqrt(s2_prior)
        return elliptical_slice(k2, x, nu, loglik, cur_ll=ll)

    xs = np.asarray(jax.jit(lambda k: _run_chain(step, jnp.zeros(1), 6000, k))(key))
    xs = xs[1000:, 0]
    np.testing.assert_allclose(xs.mean(), post_mean, atol=0.05)
    np.testing.assert_allclose(xs.var(), post_var, rtol=0.15)


def test_ess_with_mean_offset(key):
    # prior x ~ N(mu, 1) with flat likelihood => samples ~ N(mu, 1)
    mu = jnp.asarray([2.0])

    def loglik(x):
        return jnp.asarray(0.0)

    def step(k, x, ll):
        k1, k2 = jax.random.split(k)
        nu = jax.random.normal(k1, (1,))
        return elliptical_slice(k2, x, nu, loglik, cur_ll=ll, mu=mu)

    xs = np.asarray(jax.jit(lambda k: _run_chain(step, mu, 4000, k))(key))[500:, 0]
    np.testing.assert_allclose(xs.mean(), 2.0, atol=0.08)
    np.testing.assert_allclose(xs.var(), 1.0, rtol=0.15)


@pytest.mark.parametrize("method", ["grid", "shrink"])
def test_gass_truncated_normal(key, method):
    # x ~ N(0, 1) truncated to x >= 0.5, flat likelihood.
    # GASS must sample the truncated prior (with either kernel).
    A = jnp.asarray([[1.0]])
    c = jnp.asarray([0.5])

    def loglik(pts):
        return jnp.zeros(pts.shape[0])

    def step(k, x, ll):
        k1, k2 = jax.random.split(k)
        return gass(k2, x, lambda kk: jax.random.normal(kk, (1,)), loglik, A, c,
                    cur_ll=ll, method=method)

    def chain(k):
        def body(carry, i):
            x, ll = carry
            x, ll = step(jax.random.fold_in(k, i), x, ll)
            return (x, ll), x
        (_, _), xs = jax.lax.scan(body, (jnp.asarray([1.0]), jnp.asarray(0.0)),
                                  jnp.arange(20000))
        return xs

    xs = np.asarray(jax.jit(chain)(key))[2000:, 0]
    assert np.all(xs >= 0.5 - 1e-5)
    tn = stats.truncnorm(0.5, np.inf)
    np.testing.assert_allclose(xs.mean(), tn.mean(), atol=0.03)
    np.testing.assert_allclose(xs.std(), tn.std(), rtol=0.12)


@pytest.mark.parametrize("method", ["grid", "shrink"])
def test_gass_monotone_gp(key, method):
    """The reference's standalone demo (gass.py:326-395) at reduced scale:
    monotone-decreasing curve in [0.1, 1] bounds, iid normal likelihood."""
    T, nobs = 6, 5
    mu_truth = np.array([0.95, 0.8, 0.6, 0.45, 0.3, 0.15])
    sigma_truth = 0.2
    rng = np.random.default_rng(0)
    data = rng.normal(mu_truth[:, None], sigma_truth, size=(T, nobs))

    # constraints: x >= 0.1, -x >= -1 (x <= 1), x_t - x_{t+1} >= 0
    C_lo = np.concatenate([np.eye(T), np.full((T, 1), 0.1)], axis=1)
    C_hi = np.concatenate([-np.eye(T), np.full((T, 1), -1.0)], axis=1)
    C_mono = np.array([np.concatenate([np.zeros(i), [1, -1], np.zeros(T - i - 2), [0]])
                       for i in range(T - 1)])
    C = np.concatenate([C_lo, C_hi, C_mono], axis=0)
    A, c = jnp.asarray(C[:, :-1]), jnp.asarray(C[:, -1])

    mu_prior = jnp.full((T,), 0.5)
    data_j = jnp.asarray(data)

    def loglik(pts):  # (G, T)
        return jnp.sum(-0.5 * (data_j[None] - pts[:, :, None]) ** 2 / sigma_truth**2,
                       axis=(1, 2))

    def chain(k):
        x0 = jnp.asarray(np.clip((T - np.arange(T)) / T, 0.15, 0.99))
        def body(carry, i):
            x, ll = carry
            x, ll = gass(jax.random.fold_in(k, i), x,
                         lambda kk: jax.random.normal(kk, (T,)),
                         loglik, A, c, mu=mu_prior, cur_ll=ll, method=method)
            return (x, ll), x
        (_, _), xs = jax.lax.scan(body, (x0, loglik(x0[None])[0]), jnp.arange(4000))
        return xs

    xs = np.asarray(jax.jit(chain)(key))[1000:]
    # every sample satisfies the constraints
    assert xs.min() >= 0.1 - 1e-4
    assert xs.max() <= 1.0 + 1e-4
    assert np.all(np.diff(xs, axis=1) <= 1e-4)
    # posterior mean tracks the truth
    assert np.sqrt(np.mean((xs.mean(0) - mu_truth) ** 2)) < 0.1


def test_gass_dim_mask(key):
    # masked dim stays exactly at its current value (0)
    A = jnp.asarray([[1.0, 0.0]])
    c = jnp.asarray([-10.0])
    mask = jnp.asarray([1.0, 0.0])

    def loglik(pts):
        return jnp.zeros(pts.shape[0])

    x = jnp.asarray([0.3, 0.0])
    for i in range(20):
        x, _ = gass(jax.random.fold_in(key, i), x,
                    lambda kk: jax.random.normal(kk, (2,)), loglik, A, c,
                    dim_mask=mask)
    assert float(x[1]) == 0.0


def test_gass_stay_put_when_infeasible_slice(key):
    # contradictory constraints leave no valid arc: sampler must stay put
    A = jnp.asarray([[1.0], [-1.0]])
    c = jnp.asarray([0.99, -1.01])  # 0.99 <= x <= 1.01, current x = 1.0

    def loglik(pts):
        return jnp.full(pts.shape[0], -jnp.inf)  # slice rejects everything

    x = jnp.asarray([1.0])
    x_new, ll = gass(key, x, lambda kk: jax.random.normal(kk, (1,)),
                     loglik, A, c, cur_ll=jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(x_new), [1.0])


@pytest.mark.slow
def test_gass_callable_operator(key):
    """gass() with a factorized constraint operator must produce exactly the
    same draw as the dense matrix (the V updates pass A = CA (x) W as two
    small matmuls instead of a materialized matrix)."""
    import jax
    rng = np.random.default_rng(7)
    D, J = 6, 9
    A = jnp.asarray(rng.normal(size=(J, D)).astype(np.float32))
    x0 = jnp.asarray(np.full(D, 2.0, np.float32))  # strictly feasible for c
    c = jnp.asarray((np.asarray(A) @ np.asarray(x0) - 1.0).astype(np.float32))

    def loglik(pts):
        return -0.5 * jnp.sum(pts ** 2, axis=-1)

    v = jnp.asarray(rng.normal(size=D).astype(np.float32))
    x_dense, ll_dense = gass(key, x0, None, loglik, A, c, v=v, ngrid=32)

    _hp = jax.lax.Precision.HIGHEST
    x_op, ll_op = gass(key, x0, None, loglik,
                       lambda y: jnp.dot(A, y, precision=_hp), c,
                       v=v, ngrid=32)
    np.testing.assert_allclose(np.asarray(x_dense), np.asarray(x_op))
    np.testing.assert_allclose(float(ll_dense), float(ll_op))
    # and the draw is feasible and moved
    assert np.all(np.asarray(A) @ np.asarray(x_dense) >= np.asarray(c) - 1e-5)
