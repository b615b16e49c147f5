from mpopis_tpu.parallel.collectives import (
    global_it_weights,
    global_mean_cov,
    global_top_k,
    global_weighted_mean_cov,
)
from mpopis_tpu.parallel.mesh import (
    SAMPLE_AXIS,
    distributed_init,
    make_sample_mesh,
    replicated,
    sample_sharding,
)

__all__ = [
    "global_it_weights",
    "global_mean_cov",
    "global_top_k",
    "global_weighted_mean_cov",
    "SAMPLE_AXIS",
    "distributed_init",
    "make_sample_mesh",
    "replicated",
    "sample_sharding",
]
