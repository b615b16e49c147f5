"""Exact-match debugging harness: injected standard normals fully determine
the policy update, so the whole GMPPI step can be checked against a
hand-written numpy reference computation."""

import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models import MountainCarEnv
from mpopis_tpu.models.rollout import rollout_batch
from mpopis_tpu.policies import PolicyConfig, make_policy


def test_injected_noise_reproduces_hand_computed_gmppi():
    env = MountainCarEnv(dtype=jnp.float64)
    k, t = 8, 4
    cfg = PolicyConfig(kind="gmppi", num_samples=k, horizon=t, lam=0.1, opt_its=1)
    sigma = 1.5
    pol = make_policy(env, cfg, cov_mat=[sigma])
    ps = pol.init_state(0)
    s = env.reset()

    rng = np.random.default_rng(42)
    z = rng.normal(size=(1, t, k))  # (opt_its, cs, K)
    act, _, info = pol.step(s, ps, z=jnp.asarray(z))

    # hand computation: E = chol(Σ) @ z = sqrt(1.5)·z; V = U + E; clamp;
    # rollout; IT weights; weighted noise; first action clamped.
    e = np.sqrt(sigma) * z[0]  # (cs, K)
    controls = np.clip(e.T.reshape(k, t, 1), -1, 1)
    base, _ = rollout_batch(env, s, jnp.asarray(controls), False)
    costs = np.asarray(base)
    w = np.exp(-(costs - costs.min()) / 0.1)
    w = w / w.sum()
    weighted = e @ w  # U = 0
    expected_action = np.clip(weighted[0], -1, 1)
    np.testing.assert_allclose(float(act[0]), expected_action, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(info["weights"]), w, rtol=1e-9)


def test_injected_noise_mppi_deterministic():
    env = MountainCarEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="mppi", num_samples=8, horizon=4, lam=0.1)
    pol = make_policy(env, cfg, cov_mat=[1.5])
    s = env.reset()
    z = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4, 1)))
    a1, _, _ = pol.step(s, pol.init_state(0), z=z)
    a2, _, _ = pol.step(s, pol.init_state(999), z=z)  # different key, same z
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-12)
