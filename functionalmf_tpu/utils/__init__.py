"""Host-side support utilities (initializers, projections, metrics, EP)."""

from functionalmf_tpu.utils.metrics import (
    ilogit, mse, mae, moving_average, cross_entropy, random_holdouts,
    coverage_at,
)
from functionalmf_tpu.utils.pav import pav, factor_pav
from functionalmf_tpu.utils.nmf import tensor_nmf
from functionalmf_tpu.utils.ep import grid_ep_approx, ep_from_mf
from functionalmf_tpu.utils.binary_mf import (
    binary_mf, logistic_regression_loss, logistic_regression_grad,
)

# Penalty builders are re-exported here for parity with the reference's
# functionalmf.utils module surface (utils.py:56-98).
from functionalmf_tpu.ops.penalty import (
    bayes_delta, bayes_grid_penalty, get_delta, grid_penalty_matrix,
    hypercube_edges, matrix_from_edges,
)

__all__ = [
    "ilogit", "mse", "mae", "moving_average", "cross_entropy",
    "random_holdouts", "coverage_at", "pav", "factor_pav", "tensor_nmf",
    "grid_ep_approx", "ep_from_mf", "binary_mf",
    "logistic_regression_loss", "logistic_regression_grad",
    "bayes_delta", "bayes_grid_penalty", "get_delta", "grid_penalty_matrix",
    "hypercube_edges", "matrix_from_edges",
]
