"""Unit tests for the functional core against hand-computed / numpy values."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpopis_tpu import ops


def test_it_weights_hand_values():
    costs = jnp.array([1.0, 2.0, 3.0])
    lam = 1.0
    w = np.asarray(ops.information_theoretic_weights(costs, lam))
    raw = np.exp(-(np.array([1.0, 2.0, 3.0]) - 1.0))
    np.testing.assert_allclose(w, raw / raw.sum(), rtol=1e-12)
    assert abs(w.sum() - 1.0) < 1e-12


def test_it_weights_invariant_to_cost_shift():
    costs = np.random.default_rng(0).normal(size=64)
    w1 = np.asarray(ops.information_theoretic_weights(jnp.array(costs), 3.0))
    w2 = np.asarray(
        ops.information_theoretic_weights(jnp.array(costs + 1234.5), 3.0)
    )
    np.testing.assert_allclose(w1, w2, rtol=1e-9)


def test_ce_weights_uniform_over_elites():
    costs = jnp.array([5.0, 1.0, 3.0, 2.0, 4.0])
    w = np.asarray(ops.cross_entropy_weights(costs, 2))
    np.testing.assert_allclose(w, [0.0, 0.5, 0.0, 0.5, 0.0])


def test_block_diag_repeat_vector_and_matrix():
    out = np.asarray(ops.block_diag_repeat(jnp.array([0.0625, 0.1]), 2))
    np.testing.assert_allclose(out, np.diag([0.0625, 0.1, 0.0625, 0.1]))
    block = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    out = np.asarray(ops.block_diag_repeat(block, 2))
    expected = np.zeros((4, 4))
    expected[:2, :2] = [[1, 2], [3, 4]]
    expected[2:, 2:] = [[1, 2], [3, 4]]
    np.testing.assert_allclose(out, expected)


def test_clamp_controls():
    v = jnp.array([[-2.0, 0.5], [3.0, -0.7]])
    out = np.asarray(ops.clamp_controls(v, [-1.0, -0.6], [1.0, 0.6]))
    np.testing.assert_allclose(out, [[-1.0, 0.5], [1.0, -0.6]])


def test_roll_controls_reference_quirk():
    # horizon=3, as=2: cs=6. The reference shifts left by as then refills the
    # tail from U0[(end-as):end] — as+1 elements (utils.jl:96).
    w = jnp.arange(1.0, 7.0)  # weighted controls
    u0 = jnp.full(6, -9.0)
    out = np.asarray(ops.roll_controls(w, u0, 2, reference_quirk=True))
    # shifted: [3,4,5,6,*,*]; tail overwrite from index cs-as-1=3: [-9,-9,-9]
    np.testing.assert_allclose(out, [3.0, 4.0, 5.0, -9.0, -9.0, -9.0])
    out_fixed = np.asarray(ops.roll_controls(w, u0, 2, reference_quirk=False))
    np.testing.assert_allclose(out_fixed, [3.0, 4.0, 5.0, 6.0, -9.0, -9.0])


def test_roll_controls_horizon_one():
    w = jnp.array([1.0, 2.0])
    u0 = jnp.zeros(2)
    np.testing.assert_allclose(np.asarray(ops.roll_controls(w, u0, 2)), [1.0, 2.0])


def test_weighted_mean_and_cov_matches_numpy():
    rng = np.random.default_rng(1)
    e = rng.normal(size=(4, 32))
    w = rng.uniform(size=32)
    w = w / w.sum()
    mu, cov = ops.weighted_mean_and_cov(jnp.array(e), jnp.array(w))
    mu_np = e @ w
    xc = e - mu_np[:, None]
    cov_np = (xc * w) @ xc.T
    np.testing.assert_allclose(np.asarray(mu), mu_np, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cov), cov_np, rtol=1e-10)


def test_mean_and_cov_corrected_matches_numpy():
    rng = np.random.default_rng(2)
    e = rng.normal(size=(3, 50))
    mu, cov = ops.mean_and_cov(jnp.array(e), corrected=True)
    np.testing.assert_allclose(np.asarray(mu), e.mean(axis=1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cov), np.cov(e), rtol=1e-10)


def test_sample_cov_mle_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 5))
    s = np.asarray(ops.sample_cov(jnp.array(x), corrected=False))
    np.testing.assert_allclose(s, np.cov(x.T, bias=True), rtol=1e-10)


@pytest.mark.parametrize("method", ["mle", "lw", "ss", "rblw", "oas"])
def test_shrinkage_estimators_psd_and_sane(method):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(30, 8)) @ np.diag([1, 1, 2, 2, 3, 3, 4, 4])
    sig = np.asarray(ops.shrinkage_cov(jnp.array(x), method))
    assert sig.shape == (8, 8)
    np.testing.assert_allclose(sig, sig.T, atol=1e-10)
    evals = np.linalg.eigvalsh(sig)
    assert evals.min() > -1e-9
    # shrinkage should pull toward the target but keep the scale: trace
    # within 2x of the MLE trace
    s_mle = np.cov(x.T, bias=True)
    assert 0.5 < np.trace(sig) / np.trace(s_mle) < 2.0


def test_shrinkage_large_n_converges_to_mle():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(20000, 4))
    s_mle = np.asarray(ops.shrinkage_cov(jnp.array(x), "mle"))
    for method in ["lw", "ss", "rblw", "oas"]:
        sig = np.asarray(ops.shrinkage_cov(jnp.array(x), method))
        np.testing.assert_allclose(sig, s_mle, atol=0.02)


def test_multinomial_resample_distribution():
    import jax

    w = jnp.array([0.1, 0.2, 0.3, 0.4])
    idx = np.asarray(
        ops.multinomial_resample_indices(jax.random.PRNGKey(0), w, 40000)
    )
    freqs = np.bincount(idx, minlength=4) / 40000
    np.testing.assert_allclose(freqs, [0.1, 0.2, 0.3, 0.4], atol=0.01)


def test_mvnormal_samples_moments():
    import jax

    sigma = np.array([[2.0, 0.5], [0.5, 1.0]])
    chol = ops.cholesky_psd(jnp.array(sigma))
    e = np.asarray(ops.mvnormal_samples(jax.random.PRNGKey(1), chol, 200000))
    np.testing.assert_allclose(np.cov(e), sigma, atol=0.05)


def test_mvnormal_injected_z_exact():
    sigma = np.array([[4.0]])
    chol = ops.cholesky_psd(jnp.array(sigma))
    z = jnp.array([[1.0, -2.0, 0.5]])
    e = np.asarray(ops.mvnormal_samples(None, chol, 3, z=z))
    np.testing.assert_allclose(e, [[2.0, -4.0, 1.0]])


def test_multinomial_counts_equal_indices_bucketing():
    """multinomial_resample_counts must produce the exact draw counts of
    multinomial_resample_indices on the same key (the PMC strategy relies
    on this bitwise equivalence)."""
    import jax

    from mpopis_tpu.ops import (
        multinomial_resample_counts,
        multinomial_resample_indices,
    )

    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.uniform(0.01, 1.0, 64))
    w = w / w.sum()
    key = jax.random.key(123)
    idx = np.asarray(multinomial_resample_indices(key, w, 64))
    counts_ref = np.bincount(idx, minlength=64).astype(float)
    counts = np.asarray(multinomial_resample_counts(key, w, 64))
    np.testing.assert_array_equal(counts, counts_ref)


def test_masked_shrinkage_matches_gathered():
    """shrinkage_cov_masked over 0/1-masked columns == shrinkage_cov of the
    gathered elite matrix, for every estimator."""
    from mpopis_tpu.ops.covariance import shrinkage_cov, shrinkage_cov_masked

    rng = np.random.default_rng(9)
    d, k, m = 7, 40, 12
    e = jnp.asarray(rng.normal(size=(d, k)))
    idx = rng.choice(k, size=m, replace=False)
    mask = np.zeros(k)
    mask[idx] = 1.0
    for method in ("mle", "lw", "ss", "rblw", "oas"):
        ref = shrinkage_cov(e[:, np.sort(idx)].T, method)
        got = shrinkage_cov_masked(e, jnp.asarray(mask), m, method)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-10, atol=1e-12
        )


def test_newton_schulz_inv_sqrt():
    """The CMA fast-sqrt iteration matches the eigendecomposition Σ^-1/2
    on a well-conditioned matrix, and its error signal fires on an
    indefinite one (triggering the eigh fallback)."""
    from mpopis_tpu.policies.strategies import (
        _eigh_inv_sqrt,
        _inv_sqrt_newton_schulz,
    )

    rng = np.random.default_rng(11)
    a = rng.normal(size=(20, 20)) * 0.3
    spd = jnp.asarray(a @ a.T + np.eye(20))
    c_ns, err = _inv_sqrt_newton_schulz(spd)
    assert float(err) < 1e-6
    c_ref = _eigh_inv_sqrt(spd, False, jnp.float64)
    np.testing.assert_allclose(np.asarray(c_ns), np.asarray(c_ref),
                               rtol=1e-6, atol=1e-8)
    indef = spd - 3.0 * jnp.eye(20)
    _, err2 = _inv_sqrt_newton_schulz(indef)
    assert not (float(err2) < 1e-3) or not np.isfinite(float(err2))
