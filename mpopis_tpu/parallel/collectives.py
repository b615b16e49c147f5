"""Collective formulations of the cross-sample reductions, for use inside
shard_map blocks where the K sample axis is sharded across devices.

These are the multi-host-safe versions of the reductions the reference does
locally (SURVEY.md §2.4): global min-cost for the softmax baseline
(utils.jl:81) via pmin, cost/moment sums via psum, weighted covariance as a
psum of per-shard outer-product accumulators Σ wᵢεᵢεᵢᵀ (never gathering the
full cs×K sample matrix), and global elite selection as per-shard top-k +
all-gather + re-top-k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def global_it_weights(costs_shard: jnp.ndarray, lam, axis: str) -> jnp.ndarray:
    """Information-theoretic softmax weights over a sharded cost vector.

    Input: this shard's (K_local,) costs. Output: this shard's (K_local,)
    weights, globally normalized (global Σw = 1). Uses pmin for the
    stabilizing baseline and psum for the normalizer.
    """
    rho = lax.pmin(jnp.min(costs_shard), axis)
    w = jnp.exp(-(costs_shard - rho) / lam)
    eta = lax.psum(jnp.sum(w), axis)
    return w / eta


def global_weighted_mean_cov(e_shard: jnp.ndarray, w_shard: jnp.ndarray, axis: str):
    """Probability-weighted mean/cov of a column-sharded sample matrix.

    `e_shard` is (d, K_local), `w_shard` (K_local,) with GLOBAL Σw = 1.
    Returns replicated (μ (d,), Σ (d,d)) — each shard accumulates its
    Σ wᵢxᵢ and Σ wᵢxᵢxᵢᵀ contributions and psums, so the full (d, K) matrix
    never materializes on one device.
    """
    s1 = lax.psum(e_shard @ w_shard, axis)  # global weighted mean
    # E[w x xᵀ] − μμᵀ form: psum of per-shard weighted outer products
    s2 = lax.psum((e_shard * w_shard[None, :]) @ e_shard.T, axis)
    cov = s2 - jnp.outer(s1, s1)
    return s1, cov


def global_mean_cov(e_shard: jnp.ndarray, axis: str, k_global: int, corrected: bool = True):
    """Unweighted mean/cov (corrected ⇒ /(K-1)) of a column-sharded matrix."""
    s1 = lax.psum(jnp.sum(e_shard, axis=1), axis) / k_global
    xc = e_shard - s1[:, None]
    s2 = lax.psum(xc @ xc.T, axis)
    denom = (k_global - 1) if corrected else k_global
    return s1, s2 / denom


def global_top_k(costs_shard: jnp.ndarray, k: int, axis: str):
    """Global k smallest costs and their global indices over a sharded axis.

    Hierarchical: each shard contributes its top min(k, K_local) candidates
    (when k > K_local — e.g. the reference's m_elite=30 at K=150 over 8
    devices, K_local=19 — a shard simply contributes ALL its elements,
    padded to k slots with +inf losers, which keeps the result exact: any
    member of the global top-k lives in some shard's contribution).
    Candidates are gathered via a psum of one-hot slot placements (psum
    outputs are statically replicated, which JAX's varying-manual-axes
    checker accepts where all_gather is not), then re-top-k'd replicated.
    Returns (values (k,), global_indices (k,)).

    Pad slots carry index −1: if a genuine cost is +inf (a diverged
    rollout) its negated value ties the always-losing pads and the
    re-top-k may return a pad slot for that elite — callers must treat
    index −1 as "no sample" and never gather with it. Finite costs are
    unaffected (pads strictly lose).
    """
    k_local = costs_shard.shape[0]
    n_shards = lax.axis_size(axis)
    i = lax.axis_index(axis)
    m = min(k, k_local)
    neg_vals, local_idx = lax.top_k(-costs_shard, m)
    global_idx = (local_idx + i * k_local).astype(jnp.int32)
    if m < k:  # pad to k slots with -inf (negated: always-losing values)
        pad = jnp.full((k - m,), -jnp.inf, dtype=costs_shard.dtype)
        neg_vals = jnp.concatenate([neg_vals, pad])
        global_idx = jnp.concatenate(
            [global_idx, jnp.full((k - m,), -1, dtype=jnp.int32)]
        )
    val_buf = jnp.full((n_shards, k), -jnp.inf, dtype=costs_shard.dtype)
    val_buf = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (n_shards, k), 0) == i,
        neg_vals[None, :], val_buf,
    )
    idx_buf = jnp.zeros((n_shards, k), dtype=jnp.int32).at[i].set(global_idx)
    all_vals = lax.pmax(val_buf, axis).reshape(-1)
    all_idx = lax.psum(idx_buf, axis).reshape(-1)
    top_vals, pos = lax.top_k(all_vals, k)
    return -top_vals, all_idx[pos]
