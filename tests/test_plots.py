"""Smoke tests for the dose-response plotting module (Agg backend)."""
import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")


@pytest.mark.slow
def test_plot_embeddings(tmp_path, rng):
    from functionalmf_tpu.apps.doseresponse.plots import plot_embeddings
    Ws = rng.normal(size=(10, 6, 3))
    feats = rng.integers(0, 2, size=(6, 2)).astype(float)
    W2 = plot_embeddings(Ws, str(tmp_path), features=feats,
                         feature_names=["f0", "f1"])
    assert W2.shape == (6, 2)
    assert (tmp_path / "embeddings.pdf").exists()
    assert (tmp_path / "embeddings-f0.pdf").exists()


def test_plot_curves(tmp_path, rng):
    from functionalmf_tpu.apps.doseresponse.plots import plot_curves
    Y = rng.normal(size=(2, 2, 5, 3))
    Mu_hat = rng.normal(size=(20, 2, 2, 5))
    plot_curves(Y, Mu_hat, str(tmp_path), big_plot=True)
    assert (tmp_path / "all.pdf").exists()
