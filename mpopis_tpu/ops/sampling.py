"""Gaussian control-noise sampling and multinomial resampling.

Reference semantics: `rand(rng, MvNormal(Σ), K)` draws throughout
mppi_mpopi_policies.jl (e.g. :154-156, :447-448) and the PMC categorical
resampling at :803-806. The reference's MersenneTwister stream cannot (and
should not) be reproduced on TPU; we use JAX's counter-based threefry keys.
Parity vs the Julia reference is defined at matched sampling *moments*
(BASELINE.json), and `mvnormal_samples` accepts externally injected standard
normals (`z`) so exact-match debugging against any RNG is possible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_psd(sigma: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Lower Cholesky factor with optional diagonal jitter."""
    d = sigma.shape[0]
    if jitter:
        sigma = sigma + jitter * jnp.eye(d, dtype=sigma.dtype)
    return jnp.linalg.cholesky(sigma)


def mvnormal_samples(
    key: jax.Array,
    chol: jnp.ndarray,
    num_samples: int,
    z: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Draw (d, K) samples from N(0, L Lᵀ) as E = L @ Z.

    `z` (d, K) standard normals can be injected for cross-implementation
    exact-match testing; otherwise drawn from `key`.
    """
    d = chol.shape[0]
    if z is None:
        z = jax.random.normal(key, (d, num_samples), dtype=chol.dtype)
    return chol @ z


def multinomial_resample_indices(
    key: jax.Array, weights: jnp.ndarray, num_draws: int
) -> jnp.ndarray:
    """K iid draws from Categorical(weights) via inverse-CDF.

    Ref: mppi_mpopi_policies.jl:803-806 (PMC). Static shapes; O(K log K) via
    searchsorted on the weight CDF — no host round-trip.
    """
    cdf = jnp.cumsum(weights)
    cdf = cdf / cdf[-1]
    u = jax.random.uniform(key, (num_draws,), dtype=weights.dtype)
    return jnp.searchsorted(cdf, u, side="left").astype(jnp.int32)
