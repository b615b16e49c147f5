"""On-device Reacher vs the real MuJoCo: constants, trajectories (incl. the
soft joint limit), gym obs/reward parity, and policy control quality."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import ReacherDeviceEnv, make_state
from mpopis_tpu.models import reacher_device as rd


def _mj():
    import os

    import gymnasium.envs.mujoco as gm

    xml = os.path.join(os.path.dirname(gm.__file__), "assets", "reacher.xml")
    m = mujoco.MjModel.from_xml_path(xml)
    return m, mujoco.MjData(m)


def test_constants_match_mjmodel():
    """Re-derive the hardcoded inertial constants from mj_fullM."""
    m, d = _mj()
    assert m.opt.timestep == rd._H
    assert float(m.actuator_gear[0, 0]) == rd._GEAR
    assert float(m.dof_damping[1]) == rd._DAMPING
    M = {}
    for q2 in (0.0, 0.7):
        d.qpos[:] = [0.3, q2, 0.1, -0.1]
        d.qvel[:] = 0
        mujoco.mj_forward(m, d)
        full = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, full)
        M[q2] = full
    b = (M[0.0][0, 1] - M[0.7][0, 1]) / (1 - np.cos(0.7))
    a = M[0.0][0, 0] - 2 * b
    i2 = M[0.0][1, 1] - float(m.dof_armature[1])
    np.testing.assert_allclose(b, rd._B, rtol=1e-9)
    np.testing.assert_allclose(a, rd._A, rtol=1e-9)
    np.testing.assert_allclose(i2, rd._I2, rtol=1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("scale,steps", [(0.5, 60), (1.0, 120)])
def test_trajectory_matches_mj_step(scale, steps):
    """Frame-skipped trajectories match mj_step exactly — including when
    strong actions drive joint1 into its ±3.0 soft limit (scale=1.0 does;
    the limit model must then reproduce MuJoCo's constraint force)."""
    m, d = _mj()
    env = ReacherDeviceEnv(dtype=jnp.float64)
    mujoco.mj_resetData(m, d)
    s = env.reset()
    np.testing.assert_allclose(np.asarray(s.x[:4]), np.r_[d.qpos[:2], d.qvel[:2]])
    rng = np.random.default_rng(3)
    step = jax.jit(env.step)
    hit_limit = False
    for _ in range(steps):
        a = rng.uniform(-1, 1, 2) * scale
        d.ctrl[:] = a
        for _ in range(rd._FRAME_SKIP):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        hit_limit = hit_limit or abs(d.qpos[1]) > 2.999
        # agreement is bounded by MuJoCo's Newton solver tolerance once
        # the limit constraint has fired (measured ~6e-9 over 120 steps)
        np.testing.assert_allclose(
            np.asarray(s.x[:2]), d.qpos[:2], rtol=1e-7, atol=3e-8
        )
        np.testing.assert_allclose(
            np.asarray(s.x[2:4]), d.qvel[:2], rtol=1e-6, atol=3e-6
        )
    if scale == 1.0:
        assert hit_limit, "test should exercise the joint limit"


def test_obs_and_reward_match_gymnasium():
    g = gymnasium.make("Reacher-v4").unwrapped
    g.reset(seed=0)
    g.set_state(g.init_qpos, g.init_qvel)
    env = ReacherDeviceEnv(dtype=jnp.float64)
    s = env.reset()
    np.testing.assert_allclose(np.asarray(env.observation(s)), g._get_obs(),
                               atol=1e-12)
    rng = np.random.default_rng(5)
    for _ in range(20):
        a = rng.uniform(-1, 1, 2) * 0.6
        og, rg, *_ = g.step(a)
        s2, r = env.step_reward(s, jnp.asarray(a))
        np.testing.assert_allclose(float(r), rg, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(env.observation(s2)), og,
                                   rtol=1e-6, atol=1e-9)
        s = s2


def test_policy_reaches_target():
    """CEMPPI on the device env drives the fingertip to the target."""
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = ReacherDeviceEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="cemppi", num_samples=64, horizon=15, lam=0.05,
                       opt_its=3, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.02, 0.02])
    s, ps = env.reset(), pol.init_state(2)
    d0 = -float(env.reward(s))
    env_step = jax.jit(env.step)
    for _ in range(30):
        a, ps, _ = pol.step(s, ps)
        s = env_step(s, a)
    d1 = -float(env.reward(s))
    assert d1 < 0.5 * d0, (d0, d1)
    assert d1 < 0.03
