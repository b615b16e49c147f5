"""On-device Walker2d (contacts, dual legs) vs the real MuJoCo."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import Walker2dDeviceEnv
from mpopis_tpu.models import walker2d_device as wd


def _mj():
    import os

    import gymnasium.envs.mujoco as gm

    xml = os.path.join(os.path.dirname(gm.__file__), "assets", "walker2d.xml")
    m = mujoco.MjModel.from_xml_path(xml)
    return m, mujoco.MjData(m)


def test_constants_match_mjmodel():
    m, _ = _mj()
    np.testing.assert_allclose(
        [b.mass for b in wd._BODIES], m.body_mass[1:], rtol=1e-12
    )
    np.testing.assert_allclose(m.dof_damping, wd.MODEL.damping, rtol=1e-12)
    np.testing.assert_allclose(m.dof_armature, wd.MODEL.armature, rtol=1e-12)
    np.testing.assert_allclose(
        m.dof_invweight0, wd._DOF_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.body_invweight0[1:, 0], wd._BODY_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.jnt_range[3:], [(l, h) for _, l, h in wd._LIMITS], rtol=1e-12
    )
    np.testing.assert_allclose(m.actuator_gear[:, 0], wd._GEAR, rtol=1e-12)
    assert m.opt.timestep == wd._H
    assert m.opt.integrator == 1  # RK4


@pytest.mark.slow
def test_contact_qacc_matches_mj_forward():
    """Constrained forward dynamics on multi-contact states matches
    mj_forward at machine precision."""
    m, d = _mj()
    rng = np.random.default_rng(0)
    hit_contact = 0
    for _ in range(4):
        qp = np.array([0, 1.25] + [0] * 7) + rng.uniform(-0.5, 0.5, 9)
        qv = rng.uniform(-2, 2, 9)
        ctrl = rng.uniform(-1, 1, 6)
        d.qpos[:] = qp
        d.qvel[:] = qv
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        hit_contact += d.ncon > 0
        qt = tuple(jnp.float64(v) for v in qp)
        vt = tuple(jnp.float64(v) for v in qv)
        tau = (0.0,) * 3 + tuple(wd._GEAR[i] * ctrl[i] for i in range(6))
        acc = jax.jit(lambda q, v: wd._qacc(q, v, tau, 6, 40))(qt, vt)
        acc = np.array([float(x) for x in acc])
        scale = max(1.0, np.abs(d.qacc).max())
        np.testing.assert_allclose(acc / scale, d.qacc / scale, atol=1e-9)
    assert hit_contact >= 2


@pytest.mark.slow
def test_trajectory_matches_mj_step():
    """90 frame-skipped random-action steps (falls flat, deep two-contact
    foot states, joint limits — the regime that exposed active-set
    cycling/stalling and is now handled by the projected arc search):
    tracks mj_step at solver tolerance."""
    m, d = _mj()
    mujoco.mj_resetData(m, d)
    env = Walker2dDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
    s = env.reset()
    step = jax.jit(env.step)
    rng = np.random.default_rng(1)
    for t in range(90):
        a = rng.uniform(-1, 1, 6)
        d.ctrl[:] = a
        for _ in range(wd._FRAME_SKIP):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        np.testing.assert_allclose(
            np.asarray(s.x[:9]), d.qpos, rtol=1e-8, atol=1e-10
        )


@pytest.mark.slow
def test_obs_and_reward_match_gymnasium():
    g = gymnasium.make("Walker2d-v4", reset_noise_scale=0.0).unwrapped
    g.reset(seed=0)
    env = Walker2dDeviceEnv(dtype=jnp.float64)
    s = env.reset()
    np.testing.assert_allclose(np.asarray(env.observation(s)), g._get_obs(),
                               atol=0)
    sr = jax.jit(env.step_reward)
    rng = np.random.default_rng(5)
    for _ in range(15):
        a = rng.uniform(-1, 1, 6)
        og, rg, *_ = g.step(a)
        s, r = sr(s, jnp.asarray(a))
        np.testing.assert_allclose(float(r), rg, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(env.observation(s)), og,
                                   rtol=1e-6, atol=1e-8)
