"""DIC hyperparameter selection (genlasso.py:69-136 semantics)."""
import pytest
import numpy as np

from functionalmf_tpu import GaussianBayesianTensorFiltering
from functionalmf_tpu.ops.penalty import bayes_grid_penalty


@pytest.mark.slow
def test_select_hyperparams_dic(rng):
    nrows, ncols, ndepth, k = 5, 4, 6, 2
    W = rng.normal(size=(nrows, k))
    W[np.triu_indices(k, 1)] = 0
    V = rng.normal(size=(ncols, ndepth, k))
    Y = rng.normal(np.einsum("nk,mtk->nmt", W, V), 0.5)

    model = GaussianBayesianTensorFiltering(nrows, ncols, ndepth, nembeds=k,
                                            nu2_init=1.0, seed=0)
    out = model.select_hyperparams_DIC(
        Y, verbose=False, lam2=[0.01, 1.0],
        nburn=30, nthin=1, nsamples=30)
    assert set(out.keys()) == {"scores", "options", "best", "fit"}
    assert len(out["scores"]) == 2
    assert out["best"]["lam2"] in (0.01, 1.0)
    assert out["fit"]["W"].shape == (30, nrows, k)
    # the model adopts the winning hyperparameter
    assert float(model.lam2) == out["best"]["lam2"]


def test_top_level_exports():
    import functionalmf_tpu as f
    for name in f.__all__:
        assert getattr(f, name) is not None


@pytest.mark.slow
@pytest.mark.parametrize("lam2_gen", [1e-3, 10.0])
def test_dic_selects_true_smoothness_regime(lam2_gen):
    """DIC picks the generating lam2 regime when the truth is drawn from
    the model's own trend-filtering prior at a known lam2 (VERDICT r3
    item 7). Design notes, learned by calibration (RESULTS.md round 4):

    * W is fixed (W_true): otherwise factor rotation/label switching
      across draws makes the posterior-MEAN parameters meaningless and
      D(mean) explodes, corrupting DIC for every grid point.
    * nu2 and Tau2 are fixed: a sampled nu2 collapses when the flexible
      arm interpolates noise (deviance swamps p_D), and a sampled Tau2
      ladder absorbs a mis-set lam2 (grid only weakly identified).
    * The anchored penalty (ops/penalty.py bayes_grid_penalty) shrinks
      the curve LEVEL to zero along with its roughness, so "smooth truth
      at an arbitrary level" is NOT in the small-lam2 model; the
      generating prior is the only calibrated notion of 'true regime'.

    Margins at this config are wide: the wrong arm scores 3-600x worse
    (measured across 5 seeds per direction).
    """
    grid = [1e-3, 10.0]
    hits = 0
    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        nrows, ncols, ndepth, k = 6, 5, 30, 1
        D = np.asarray(bayes_grid_penalty(ndepth, 2))
        cov = np.linalg.inv(D.T @ D / lam2_gen)
        L = np.linalg.cholesky(cov + 1e-12 * np.eye(ndepth))
        W = np.abs(rng.normal(1.0, 0.2, size=(nrows, k)))
        V = (L @ rng.normal(size=(ndepth, ncols))).T[..., None]
        Y = rng.normal(np.einsum("nk,mtk->nmt", W, V), 0.25)
        model = GaussianBayesianTensorFiltering(
            nrows, ncols, ndepth, nembeds=k, nu2_true=0.0625, W_true=W,
            lam2_true=1.0, Tau2_true=np.ones((ncols, D.shape[0])),
            seed=seed)
        out = model.select_hyperparams_DIC(
            Y, verbose=False, lam2=grid, nburn=200, nthin=2, nsamples=100)
        assert set(out["scores"].shape) == {len(grid)}
        if out["best"]["lam2"] == lam2_gen:
            hits += 1
    assert hits == 2, f"DIC picked the wrong regime ({hits}/2 correct)"
