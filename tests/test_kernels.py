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
