from mpopis_tpu.ops.controls import (
    action_bounds_tiled,
    block_diag_repeat,
    clamp_controls,
    controls_from_flat,
    roll_controls,
)
from mpopis_tpu.ops.covariance import (
    lw_shrinkage_cov,
    mean_and_cov,
    oas_shrinkage_cov,
    rblw_shrinkage_cov,
    sample_cov,
    shrinkage_cov,
    ss_shrinkage_cov,
    weighted_mean_and_cov,
)
from mpopis_tpu.ops.sampling import (
    cholesky_psd,
    multinomial_resample_counts,
    multinomial_resample_indices,
    mvnormal_samples,
)
from mpopis_tpu.ops.weights import (
    cross_entropy_weights,
    information_theoretic_weights,
)

__all__ = [
    "action_bounds_tiled",
    "block_diag_repeat",
    "clamp_controls",
    "controls_from_flat",
    "roll_controls",
    "lw_shrinkage_cov",
    "mean_and_cov",
    "oas_shrinkage_cov",
    "rblw_shrinkage_cov",
    "sample_cov",
    "shrinkage_cov",
    "ss_shrinkage_cov",
    "weighted_mean_and_cov",
    "cholesky_psd",
    "multinomial_resample_counts",
    "multinomial_resample_indices",
    "mvnormal_samples",
    "cross_entropy_weights",
    "information_theoretic_weights",
]
