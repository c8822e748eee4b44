"""ESS / R-hat diagnostics and checkpoint-resume tests."""
import pytest
import numpy as np

from functionalmf_tpu.utils.diagnostics import (
    effective_sample_size, min_ess_per_param, split_rhat, pooled_min_ess)


def test_ess_iid(rng):
    x = rng.normal(size=4000)
    ess = effective_sample_size(x)
    assert 2500 < ess <= 4000


def test_ess_ar1(rng):
    # AR(1) with rho: ESS ~ n (1-rho)/(1+rho)
    rho, n = 0.9, 20000
    e = rng.normal(size=n)
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + e[i]
    ess = effective_sample_size(x)
    expect = n * (1 - rho) / (1 + rho)
    assert 0.5 * expect < ess < 2.0 * expect, (ess, expect)


def test_ess_constant():
    assert effective_sample_size(np.ones(100)) == 100.0


def test_min_ess_per_param(rng):
    d = {"W": rng.normal(size=(500, 3, 2)), "lam2": rng.normal(size=(500, 1))}
    ess = min_ess_per_param(d, keys=("W", "lam2"))
    assert 100 < ess <= 500


def test_pooled_min_ess(rng):
    """Pooled ESS of C chains of iid draws ~ total draw count; an AR(1)
    chain-major stack sums per-chain ESS, NOT C x per-draw count."""
    C, n = 4, 800
    iid = rng.normal(size=(C * n, 2))
    ess = pooled_min_ess({"W": iid}, C, keys=("W",))
    assert 0.5 * C * n < ess <= C * n
    rho = 0.95
    e = rng.normal(size=(C, n))
    x = np.zeros((C, n))
    for i in range(1, n):
        x[:, i] = rho * x[:, i - 1] + e[:, i]
    ess_ar = pooled_min_ess({"W": x.reshape(C * n, 1)}, C, keys=("W",))
    expect = C * n * (1 - rho) / (1 + rho)
    assert ess_ar < 0.2 * C * n
    assert 0.3 * expect < ess_ar < 3.0 * expect, (ess_ar, expect)
    # detail identifies the slowest key/index
    ess_d, k, j = pooled_min_ess({"W": x.reshape(C * n, 1)}, C,
                                 keys=("W",), detail=True)
    assert (ess_d, k, j) == (ess_ar, "W", 0)


def test_split_rhat(rng):
    good = rng.normal(size=(4, 1000))
    assert split_rhat(good) < 1.05
    bad = rng.normal(size=(4, 1000)) + np.arange(4)[:, None] * 3
    assert split_rhat(bad) > 1.5


@pytest.mark.slow
def test_checkpoint_resume(rng, tmp_path):
    from functionalmf_tpu import GaussianBayesianTensorFiltering
    Y = rng.normal(size=(4, 3, 5))
    ck = str(tmp_path / "chain.npz")

    m1 = GaussianBayesianTensorFiltering(4, 3, 5, nembeds=2, seed=7)
    m1.max_sweeps_per_call = 8
    full = m1.run_gibbs(Y, nburn=16, nthin=1, nsamples=12, verbose=False)

    # identical run, but crash after the first checkpointed chunks and resume
    m2 = GaussianBayesianTensorFiltering(4, 3, 5, nembeds=2, seed=7)
    m2.max_sweeps_per_call = 8
    m2.run_gibbs(Y, nburn=16, nthin=1, nsamples=12, verbose=False,
                 checkpoint_path=ck)
    assert (tmp_path / "chain.npz").exists()

    m3 = GaussianBayesianTensorFiltering(4, 3, 5, nembeds=2, seed=7)
    m3.max_sweeps_per_call = 8
    resumed = m3.run_gibbs(Y, nburn=16, nthin=1, nsamples=12, verbose=False,
                           checkpoint_path=ck, resume=True)
    # resume from a *complete* checkpoint reproduces the run exactly
    np.testing.assert_allclose(resumed["W"], full["W"], rtol=1e-5)


@pytest.mark.slow
def test_checkpoint_resume_traced_callback(rng, tmp_path):
    """Mid-run resume of a traced_callback run is bitwise-identical to an
    uninterrupted run (VERDICT r3 #4): the hook's cumulative data-pytree
    updates must be persisted with the chain head, not re-prepared."""
    import jax
    import jax.numpy as jnp
    from functionalmf_tpu import GaussianBayesianTensorFiltering

    Y = rng.normal(size=(4, 3, 5))
    ck = str(tmp_path / "tc_chain.npz")

    # a hook that accumulates key-dependent multiplicative noise on a data
    # leaf the sweep reads — resuming without the carried pdata would
    # restart the accumulation and diverge
    def tc(state, pdata, key, step):
        bump = 1.0 + 0.01 * jax.random.normal(key, ())
        return state, dict(pdata, ysum=pdata["ysum"] * bump)

    def make():
        m = GaussianBayesianTensorFiltering(4, 3, 5, nembeds=2, seed=7)
        m.max_sweeps_per_call = 8
        return m

    full = make().run_gibbs(Y, nburn=16, nthin=1, nsamples=12, verbose=False,
                            traced_callback=tc,
                            collect_data_keys=("ysum",))

    # interrupted run: stop after 4 collected samples (burn 16 + 4 steps),
    # then resume the SAME request from the checkpoint
    make().run_gibbs(Y, nburn=16, nthin=1, nsamples=4, verbose=False,
                     traced_callback=tc, collect_data_keys=("ysum",),
                     checkpoint_path=ck)
    resumed = make().run_gibbs(Y, nburn=16, nthin=1, nsamples=12,
                               verbose=False, traced_callback=tc,
                               collect_data_keys=("ysum",),
                               checkpoint_path=ck, resume=True)

    # bitwise: the resumed run replays the identical key schedule from the
    # identical carried (state, pdata)
    np.testing.assert_array_equal(resumed["W"], full["W"])
    np.testing.assert_array_equal(resumed["V"], full["V"])
    np.testing.assert_array_equal(resumed["ysum"], full["ysum"])
