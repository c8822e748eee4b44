"""Penalty-matrix construction must exactly match the reference semantics
(functionalmf/utils.py:56-98): dense reconstruction of the scipy.sparse
pipeline."""
import numpy as np

from functionalmf_tpu.ops.penalty import (
    bayes_delta,
    bayes_grid_penalty,
    first_difference_matrix,
    get_delta,
    grid_penalty_matrix,
    num_penalty_rows,
    penalty_half_bandwidth,
)


def ref_get_1d_penalty_matrix(N):
    # dense transliteration of reference utils.py:93-98
    D = np.zeros((N - 1, N))
    for i in range(N - 1):
        D[i, i] = -1
        D[i, i + 1] = 1
    return D


def ref_get_delta(D, k):
    result = D
    for i in range(k):
        result = D.T @ result if i % 2 == 0 else D @ result
    return result


def ref_bayes_delta(D, K, anchor=0):
    Dbayes = np.zeros((1, D.shape[1]))
    Dbayes[0, anchor] = 1
    for k in range(K + 1):
        Dbayes = np.concatenate([Dbayes, ref_get_delta(D, k)], axis=0)
    return Dbayes


def test_first_difference_matrix():
    for n in (2, 5, 20):
        np.testing.assert_array_equal(first_difference_matrix(n),
                                      ref_get_1d_penalty_matrix(n))


def test_get_delta_orders():
    D = first_difference_matrix(12)
    for k in range(4):
        np.testing.assert_allclose(get_delta(D, k), ref_get_delta(D, k))


def test_bayes_grid_penalty_matches_reference():
    for T in (5, 20):
        for k in (0, 1, 2, 3):
            ours = bayes_grid_penalty(T, k)
            ref = ref_bayes_delta(ref_get_1d_penalty_matrix(T), k)
            np.testing.assert_allclose(ours, ref)
            assert ours.shape[0] == num_penalty_rows(T, k)


def test_penalty_bandwidth():
    for T in (10, 25):
        for k in (0, 1, 2, 3):
            Delta = bayes_grid_penalty(T, k)
            gram = Delta.T @ np.diag(np.random.rand(Delta.shape[0]) + 0.1) @ Delta
            p = penalty_half_bandwidth(k)
            # everything beyond the claimed half-bandwidth is exactly zero
            for i in range(T):
                for j in range(T):
                    if abs(i - j) > p:
                        assert gram[i, j] == 0.0


def test_grid_penalty_2d():
    # 2x3 grid has 1*3 + 2*2 = 7 edges
    D = grid_penalty_matrix((2, 3), 0)
    assert D.shape == (7, 6)
    # each row sums to zero (difference operator)
    np.testing.assert_allclose(D.sum(axis=1), 0)
