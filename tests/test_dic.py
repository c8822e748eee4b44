"""DIC hyperparameter selection (genlasso.py:69-136 semantics)."""
import pytest
import numpy as np

from functionalmf_tpu import GaussianBayesianTensorFiltering


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
