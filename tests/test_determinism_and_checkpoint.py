"""Determinism (the pure-functional replacement for race detection),
checkpoint/resume, and self-golden regression tests.

Cross-implementation goldens against the Julia reference require a Julia
runtime (not available in this image); parity there is defined at the
moment level (BASELINE.json) and exact-match debugging is supported by
injecting external standard normals (ops.sampling.mvnormal_samples(z=...)).
These self-goldens pin OUR control sequences for fixed seeds so numerical
regressions are caught across refactors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpopis_tpu.models import CarRacingEnv, MountainCarEnv
from mpopis_tpu.policies import PolicyConfig, make_policy
from mpopis_tpu.utils import load_checkpoint, save_checkpoint


def _run(env, cfg, seed, steps, cov):
    pol = make_policy(env, cfg, cov_mat=cov)
    ps = pol.init_state(seed)
    s = env.reset()
    actions = []
    for _ in range(steps):
        a, ps, _ = pol.step(s, ps)
        s = env.step(s, a)
        actions.append(np.asarray(a))
    return np.stack(actions), s, ps


@pytest.mark.parametrize("kind", ["mppi", "cemppi", "cmamppi", "pmcmppi"])
def test_same_seed_same_trajectory(kind):
    env = MountainCarEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind=kind, num_samples=16, horizon=8, lam=0.1, opt_its=3)
    a1, s1, _ = _run(env, cfg, 7, 5, [1.5])
    a2, s2, _ = _run(env, cfg, 7, 5, [1.5])
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))


def test_different_seed_different_trajectory():
    env = MountainCarEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="cemppi", num_samples=16, horizon=8, lam=0.1, opt_its=3)
    a1, _, _ = _run(env, cfg, 7, 3, [1.5])
    a2, _, _ = _run(env, cfg, 8, 3, [1.5])
    assert not np.array_equal(a1, a2)


def test_checkpoint_resume_bitexact(tmp_path):
    """Resuming from a checkpoint must continue the exact trajectory."""
    env = CarRacingEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="cemppi", num_samples=16, horizon=8, lam=10.0,
                       opt_its=2, sigma_est="ss")
    cov = np.diag([0.0625, 0.1])
    pol = make_policy(env, cfg, cov_mat=cov)
    ps = pol.init_state(3)
    s = env.reset()
    for _ in range(3):
        a, ps, _ = pol.step(s, ps)
        s = env.step(s, a)
    path = save_checkpoint(str(tmp_path / "ck"), ps, s, step=3)

    # continue directly
    a_direct = []
    s_d, ps_d = s, ps
    for _ in range(3):
        a, ps_d, _ = pol.step(s_d, ps_d)
        s_d = env.step(s_d, a)
        a_direct.append(np.asarray(a))

    # resume from disk
    ps_r, s_r, step, _ = load_checkpoint(path, dtype=jnp.float64)
    assert step == 3
    a_resumed = []
    for _ in range(3):
        a, ps_r, _ = pol.step(s_r, ps_r)
        s_r = env.step(s_r, a)
        a_resumed.append(np.asarray(a))
    np.testing.assert_array_equal(np.stack(a_direct), np.stack(a_resumed))


# Self-golden control sequences (f64, CPU). On first run the golden file is
# created; subsequent runs compare against it. Delete tests/goldens/ to
# regenerate after an intentional semantic change.
def test_self_golden_mountaincar_cemppi():
    env = MountainCarEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="cemppi", num_samples=20, horizon=15, lam=0.1,
                       opt_its=5, sigma_est="mle")
    actions, _, _ = _run(env, cfg, 11, 3, [1.5])
    import json
    import os

    golden_path = os.path.join(os.path.dirname(__file__), "goldens",
                               "mc_cemppi_seed11.json")
    if not os.path.exists(golden_path):
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        with open(golden_path, "w") as f:
            json.dump(actions.tolist(), f)
        pytest.skip("golden created; rerun to compare")
    with open(golden_path) as f:
        golden = np.asarray(json.load(f))
    np.testing.assert_allclose(actions, golden, rtol=1e-10, atol=1e-12)


def test_self_golden_car_racing_cemppi():
    env = CarRacingEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="cemppi", num_samples=32, horizon=12, lam=10.0,
                       opt_its=3, sigma_est="ss")
    actions, _, _ = _run(env, cfg, 13, 3, np.diag([0.0625, 0.1]))
    import json
    import os

    golden_path = os.path.join(os.path.dirname(__file__), "goldens",
                               "car_cemppi_seed13.json")
    if not os.path.exists(golden_path):
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        with open(golden_path, "w") as f:
            json.dump(actions.tolist(), f)
        pytest.skip("golden created; rerun to compare")
    with open(golden_path) as f:
        golden = np.asarray(json.load(f))
    np.testing.assert_allclose(actions, golden, rtol=1e-10, atol=1e-12)


import json
import os

import pytest as _pytest


@_pytest.mark.parametrize("kind", ["mppi", "gmppi", "imppi", "cemppi",
                                   "cmamppi", "muaismppi", "musigmaaismppi",
                                   "pmcmppi", "nesmppi"])
def test_self_golden_all_policies(kind):
    """Pin 2 control steps of every policy variant on MountainCar (f64)."""
    env = MountainCarEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind=kind, num_samples=16, horizon=8, lam=0.1,
                       opt_its=3, lambda_ais=0.1, sigma_est="lw",
                       cma_sigma=0.75)
    actions, _, _ = _run(env, cfg, 17, 2, [1.5])
    path = os.path.join(os.path.dirname(__file__), "goldens",
                        f"all_{kind}_seed17.json")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(actions.tolist(), f)
        _pytest.skip("golden created; rerun to compare")
    with open(path) as f:
        golden = np.asarray(json.load(f))
    np.testing.assert_allclose(actions, golden, rtol=1e-10, atol=1e-12)
