"""Importance-weighting kernels.

Reference semantics: MPOPIS `src/utils.jl:79-86` (information-theoretic
softmax weights) and the `Cross_Entropy` weight-method tag declared at
`src/MPOPIS.jl:58-61` (the reference never implements its weight kernel;
here it is provided as uniform weights over the elite set).

All functions are pure jax.numpy and safe under jit/vmap/shard_map. The
global min-reduction that stabilizes the softmax is a plain `jnp.min`; the
sharded variant lives in `mpopis_tpu.parallel` and swaps it for `lax.pmin`.
"""

from __future__ import annotations

import jax.numpy as jnp


def information_theoretic_weights(costs: jnp.ndarray, lam) -> jnp.ndarray:
    """Softmax importance weights: w_k = exp(-(c_k - min c)/λ), normalized.

    Ref: utils.jl:79-86. `costs` has shape (K,); returns shape (K,) summing
    to 1.
    """
    rho = jnp.min(costs)
    w = jnp.exp(-(costs - rho) / lam)
    return w / jnp.sum(w)


def cross_entropy_weights(costs: jnp.ndarray, num_elite: int) -> jnp.ndarray:
    """Uniform weights over the `num_elite` lowest-cost samples.

    The reference declares Cross_Entropy(elite_threshold, num_elite) as a
    weight method (MPOPIS.jl:58-61) but its `compute_weights` overload is
    missing (the `:CE` constructor branch at mppi_mpopi_policies.jl:85-87
    references an undefined variable and would throw). This is the natural
    completion: elites get weight 1/m, the rest 0.
    """
    k = costs.shape[0]
    # threshold = cost of the num_elite-th smallest entry
    sorted_costs = jnp.sort(costs)
    thresh = sorted_costs[num_elite - 1]
    mask = costs <= thresh
    # Ties at the threshold may select more than num_elite; normalize by the
    # actual selected count for a proper distribution.
    w = mask.astype(costs.dtype)
    return w / jnp.sum(w)
