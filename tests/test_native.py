"""Native host library (C++ PAV / NNLS) parity tests."""
import numpy as np
import pytest

native = pytest.importorskip("functionalmf_tpu.utils.native")


def test_pav_parity(rng):
    from functionalmf_tpu.utils.pav import _pav_numpy
    for _ in range(100):
        y = rng.normal(size=rng.integers(1, 40))
        np.testing.assert_allclose(native.pav(y), _pav_numpy(y), atol=1e-12)


def test_pav_weighted(rng):
    y = np.array([3.0, 1.0, 2.0])
    w = np.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(native.pav_weighted(y, w), native.pav(y))
    # heavy weight pins the pooled value toward that element
    w2 = np.array([100.0, 1.0, 1.0])
    out = native.pav_weighted(y, w2)
    assert out[0] > 2.9


def test_nnls_optimality(rng):
    from scipy.optimize import nnls as scipy_nnls
    for _ in range(100):
        m, n = rng.integers(3, 40), rng.integers(1, 8)
        A = rng.normal(size=(m, n))
        b = rng.normal(size=m)
        x = native.nnls(A, b)
        assert x.min() >= -1e-12
        r_native = np.linalg.norm(A @ x - b)
        r_scipy = np.linalg.norm(A @ scipy_nnls(A, b)[0] - b)
        assert r_native <= r_scipy + 1e-8


def test_nnls_batch(rng):
    A = rng.normal(size=(20, 4))
    B = rng.normal(size=(10, 20))
    X = native.nnls_batch(A, B)
    for i in range(10):
        np.testing.assert_allclose(X[i], native.nnls(A, B[i]), atol=1e-10)
