"""Fused AIS-update kernels vs the pure-jnp strategy math.

The kernels (kernels/ais_update.py) fuse each strategy's refit -> shrinkage
-> jitter -> Cholesky chain into one Pallas program (the round-2 measured
bottleneck: ~0.55 ms/iteration of small-linalg latency at K=8192, cs=100).
These tests pin the kernels — in interpret mode on CPU — against the exact
jnp composition the unfused path runs, per estimator, including the chunked
K-accumulation and the K-padding path, plus strategy-level fused==unfused
for CEMPPI / muSigma-AIS / PMC / CMA via the MPOPIS_FUSED_UPDATE=1 override.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # retired opt-in kernels; interpret-mode equality is expensive

from mpopis_tpu.kernels.ais_update import (
    cma_update_chol,
    masked_refit_chol,
    weighted_refit_chol,
)
from mpopis_tpu.ops.covariance import shrinkage_cov_masked, weighted_mean_and_cov
from mpopis_tpu.policies.config import PolicyConfig
from mpopis_tpu.policies.strategies import AISCarry, _jittered, make_strategy

CS, K, M = 24, 512, 40


def _data(seed, k=K):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(CS, k)).astype(np.float32)
    idx = rng.choice(k, M, replace=False)
    mask = np.zeros(k, np.float32)
    mask[idx] = 1.0
    return jnp.asarray(e), jnp.asarray(mask)


@pytest.mark.parametrize("method", ["mle", "lw", "ss", "rblw", "oas"])
def test_masked_refit_matches_oracle(method):
    e, mask = _data(0)
    mu = (e @ mask) / M
    l = masked_refit_chol(e, mask, mu, M, method, 1e-8, interpret=True)
    sigma = _jittered(shrinkage_cov_masked(e, mask, M, method), 1e-8)
    ref = jnp.linalg.cholesky(sigma)
    np.testing.assert_allclose(
        np.asarray(l), np.asarray(ref), rtol=5e-4, atol=5e-5
    )


def test_masked_refit_chunked_and_padded():
    """K > chunk (2048) exercises the grid accumulation; K=2500 also forces
    zero-padding to the chunk multiple (padded columns carry mask 0)."""
    e, mask = _data(1, k=2500)
    mu = (e @ mask) / M
    l = masked_refit_chol(e, mask, mu, M, "ss", 1e-8, interpret=True)
    sigma = _jittered(shrinkage_cov_masked(e, mask, M, "ss"), 1e-8)
    ref = jnp.linalg.cholesky(sigma)
    np.testing.assert_allclose(
        np.asarray(l), np.asarray(ref), rtol=5e-4, atol=5e-5
    )


def test_weighted_refit_matches_oracle():
    e, _ = _data(2)
    rng = np.random.default_rng(7)
    w = rng.exponential(size=K).astype(np.float32)
    w = jnp.asarray(w / w.sum())
    mu, sigma = weighted_mean_and_cov(e, w)
    ref = jnp.linalg.cholesky(_jittered(sigma, 1e-8))
    l = weighted_refit_chol(e, w, mu, corrected=False, jitter=1e-8,
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(l), np.asarray(ref), rtol=5e-4, atol=5e-5
    )


def test_weighted_refit_corrected_matches_pmc_moments():
    """PMC's resampled moments: w = counts/K with the /(K-1) correction."""
    e, _ = _data(3)
    rng = np.random.default_rng(9)
    counts = rng.multinomial(K, np.ones(K) / K).astype(np.float32)
    counts_j = jnp.asarray(counts)
    mu = e @ (counts_j / K)
    xc = e - mu[:, None]
    sigma = (xc * counts_j[None, :]) @ xc.T / (K - 1)
    ref = jnp.linalg.cholesky(_jittered(sigma, 1e-8))
    l = weighted_refit_chol(e, counts_j / K, mu, corrected=True, jitter=1e-8,
                            interpret=True)
    np.testing.assert_allclose(
        np.asarray(l), np.asarray(ref), rtol=5e-4, atol=5e-5
    )


def _run_strategy(kind, monkeypatch, fused: bool, **cfg_kw):
    monkeypatch.setenv("MPOPIS_FUSED_UPDATE", "1" if fused else "0")
    cs, k = 12, 64
    cfg = PolicyConfig(kind=kind, num_samples=k, horizon=6, opt_its=3,
                       **cfg_kw)
    strat = make_strategy(cfg, cs, jnp.float32)
    rng = np.random.default_rng(4)
    e = rng.normal(size=(cs, k)).astype(np.float32)
    costs = (rng.normal(size=(k,)).astype(np.float32)) ** 2
    sigma0 = (0.3 * np.eye(cs)).astype(np.float32)
    extra = (
        strat.make_extra(jnp.asarray(sigma0))
        if hasattr(strat, "make_extra")
        else None
    )
    carry = AISCarry(
        U=jnp.zeros(cs, jnp.float32),
        chol=jnp.asarray(np.linalg.cholesky(sigma0).astype(np.float32)),
        E=jnp.asarray(e),
        costs=jnp.asarray(costs),
        trajs=None,
        done=jnp.asarray(False),
        key=jax.random.PRNGKey(0),
        extra=extra,
    )
    new, stop = strat.update(
        carry, jax.random.PRNGKey(1), carry.U, jnp.asarray(1)
    )
    return new, stop


@pytest.mark.parametrize(
    "kind,cfg_kw",
    [
        ("cemppi", dict(sigma_est="lw")),
        ("musigmaaismppi", dict()),
        ("pmcmppi", dict()),
        ("cmamppi", dict(cma_fast_sqrt=True)),
    ],
)
def test_strategy_fused_matches_unfused(kind, monkeypatch, cfg_kw):
    """MPOPIS_FUSED_UPDATE=1 on CPU routes the strategies through the
    interpreted kernels; the result must match the pure-jnp path (CMA is
    compared against its Newton-Schulz form, which is what the fused
    kernel implements — cfg.cma_fast_sqrt semantics)."""
    a, stop_a = _run_strategy(kind, monkeypatch, fused=True, **cfg_kw)
    b, stop_b = _run_strategy(kind, monkeypatch, fused=False, **cfg_kw)
    assert bool(stop_a) == bool(stop_b)
    np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.chol), np.asarray(b.chol),
                               rtol=5e-3, atol=5e-4)
    if a.extra is not None:
        for key in a.extra:
            np.testing.assert_allclose(
                np.asarray(a.extra[key]), np.asarray(b.extra[key]),
                rtol=5e-3, atol=5e-4, err_msg=key,
            )
