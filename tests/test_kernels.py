"""Pallas kernel vs vmap-path equivalence (interpret mode on CPU).

The vmap rollout is the correctness oracle for the fused kernel
(SURVEY.md §7 stage 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.kernels.car_rollout import car_rollout_costs
from mpopis_tpu.models import CarRacingEnv, rollout_batch


def _random_controls(key, k, t):
    return jax.random.uniform(key, (k, t, 2), minval=-1.0, maxval=1.0)


def test_car_kernel_matches_vmap_oracle():
    env = CarRacingEnv(dtype=jnp.float32)
    s0 = env.reset()
    controls = _random_controls(jax.random.PRNGKey(0), 64, 12).astype(jnp.float32)
    oracle, _ = rollout_batch(env, s0, controls, log_states=False)
    kern = car_rollout_costs(env, s0.x, controls, 12, interpret=True)
    assert kern.shape == (64,)
    np.testing.assert_allclose(
        np.asarray(kern), np.asarray(oracle), rtol=2e-4, atol=2e-3
    )


def test_car_kernel_padding_and_blocks():
    env = CarRacingEnv(dtype=jnp.float32)
    s0 = env.reset()
    # K not a multiple of 128 exercises the padding path
    controls = _random_controls(jax.random.PRNGKey(1), 150, 5).astype(jnp.float32)
    oracle, _ = rollout_batch(env, s0, controls, log_states=False)
    kern = car_rollout_costs(env, s0.x, controls, 5, interpret=True)
    assert kern.shape == (150,)
    np.testing.assert_allclose(
        np.asarray(kern), np.asarray(oracle), rtol=2e-4, atol=2e-3
    )


def test_multicar_kernel_matches_vmap_oracle():
    from mpopis_tpu.models import MultiCarRacingEnv

    env = MultiCarRacingEnv(num_cars=3, dtype=jnp.float32)
    s0 = env.reset()
    controls = jax.random.uniform(
        jax.random.PRNGKey(2), (40, 6, 6), minval=-1.0, maxval=1.0
    ).astype(jnp.float32)
    oracle, _ = rollout_batch(env, s0, controls, log_states=False)
    from mpopis_tpu.kernels.car_rollout import car_rollout_costs as crc

    kern = crc(env, s0.x, controls, 6, interpret=True)
    assert kern.shape == (40,)
    np.testing.assert_allclose(
        np.asarray(kern), np.asarray(oracle), rtol=2e-4, atol=2e-2
    )


def test_cholesky_kernel_matches_oracle():
    """Pallas single-program Cholesky (interpret mode) vs jnp.linalg."""
    from mpopis_tpu.kernels.linalg import _chol_pallas

    rng = np.random.default_rng(3)
    for n in (4, 100):
        a = rng.normal(size=(n, n)).astype(np.float32) * 0.2
        spd = (a @ a.T + np.eye(n, dtype=np.float32)).astype(np.float32)
        l = np.asarray(_chol_pallas(jnp.asarray(spd), interpret=True))
        ref = np.linalg.cholesky(spd.astype(np.float64))
        np.testing.assert_allclose(l, ref, rtol=5e-5, atol=5e-6)
        # strictly lower-triangular output (upper must be exactly zero)
        assert np.all(l[np.triu_indices(n, 1)] == 0.0)


def test_forward_solve_kernel_matches_oracle():
    from mpopis_tpu.kernels.linalg import _chol_pallas, _fwd_solve_pallas

    rng = np.random.default_rng(4)
    n = 100
    a = rng.normal(size=(n, n)).astype(np.float32) * 0.2
    spd = (a @ a.T + np.eye(n, dtype=np.float32)).astype(np.float32)
    l = _chol_pallas(jnp.asarray(spd), interpret=True)
    b = rng.normal(size=(2, n)).astype(np.float32)
    y = np.asarray(_fwd_solve_pallas(l, jnp.asarray(b), interpret=True))
    import scipy.linalg

    ref = scipy.linalg.solve_triangular(
        np.asarray(l).astype(np.float64), b.T.astype(np.float64), lower=True
    ).T
    np.testing.assert_allclose(y, ref, rtol=5e-5, atol=5e-6)
