"""On-device Hopper (contacts + self-collision) vs the real MuJoCo."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import HopperDeviceEnv
from mpopis_tpu.models import hopper_device as hd


def _mj():
    import os

    import gymnasium.envs.mujoco as gm

    xml = os.path.join(os.path.dirname(gm.__file__), "assets", "hopper.xml")
    m = mujoco.MjModel.from_xml_path(xml)
    return m, mujoco.MjData(m)


def test_constants_match_mjmodel():
    m, _ = _mj()
    np.testing.assert_allclose(
        [b.mass for b in hd._BODIES], m.body_mass[1:], rtol=1e-12
    )
    np.testing.assert_allclose(m.dof_damping, hd.MODEL.damping, rtol=1e-12)
    np.testing.assert_allclose(m.dof_armature, hd.MODEL.armature, rtol=1e-12)
    np.testing.assert_allclose(
        m.dof_invweight0, hd._DOF_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.body_invweight0[1:, 0], hd._BODY_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.jnt_range[3:], [(l, h) for _, l, h in hd._LIMITS], rtol=1e-12
    )
    np.testing.assert_allclose(
        m.actuator_gear[:, 0], hd._GEAR, rtol=1e-12
    )
    assert m.opt.timestep == hd._H
    assert m.opt.integrator == 1  # RK4


def test_mass_matrix_and_contact_qacc_match_mj_forward():
    """Constrained forward dynamics (floor contacts + limits) matches
    mj_forward at machine precision."""
    m, d = _mj()
    rng = np.random.default_rng(0)
    hit_contact = 0
    for _ in range(5):
        qp = np.array([0, 1.25, 0, 0, 0, 0]) + rng.uniform(-0.5, 0.5, 6)
        qv = rng.uniform(-2, 2, 6)
        ctrl = rng.uniform(-1, 1, 3)
        d.qpos[:] = qp
        d.qvel[:] = qv
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        hit_contact += d.ncon > 0
        full = np.zeros((6, 6))
        mujoco.mj_fullM(m, d, full)
        qt = tuple(jnp.float64(v) for v in qp)
        vt = tuple(jnp.float64(v) for v in qv)
        me = jax.jit(hd._mass_entries)(qt)
        for i in range(6):
            for j in range(i + 1):
                np.testing.assert_allclose(
                    float(me[i][j]), full[i, j], rtol=1e-10, atol=1e-12
                )
        tau = (0.0,) * 3 + tuple(hd._GEAR[i] * ctrl[i] for i in range(3))
        acc = jax.jit(lambda q, v: hd._qacc(q, v, tau, 6, 40))(qt, vt)
        acc = np.array([float(x) for x in acc])
        scale = max(1.0, np.abs(d.qacc).max())
        np.testing.assert_allclose(acc / scale, d.qacc / scale, atol=1e-9)
    assert hit_contact >= 2  # the sweep must actually exercise contacts


@pytest.mark.slow
def test_trajectory_matches_mj_step():
    """100 frame-skipped random-action steps (drop, hop, crumple — floor
    contacts, the torso↔foot capsule-capsule self-contact at ~step 71,
    and joint limits all fire): the on-device RK4 trajectory tracks
    mj_step at solver tolerance."""
    m, d = _mj()
    mujoco.mj_resetData(m, d)
    env = HopperDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
    s = env.reset()
    step = jax.jit(env.step)
    rng = np.random.default_rng(1)
    for t in range(100):
        a = rng.uniform(-1, 1, 3)
        d.ctrl[:] = a
        for _ in range(hd._FRAME_SKIP):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        np.testing.assert_allclose(
            np.asarray(s.x[:6]), d.qpos, rtol=1e-8, atol=1e-10
        )


def test_obs_and_reward_match_gymnasium():
    g = gymnasium.make("Hopper-v4", reset_noise_scale=0.0).unwrapped
    g.reset(seed=0)
    env = HopperDeviceEnv(dtype=jnp.float64)
    s = env.reset()
    np.testing.assert_allclose(np.asarray(env.observation(s)), g._get_obs(),
                               atol=0)
    sr = jax.jit(env.step_reward)
    rng = np.random.default_rng(5)
    for _ in range(15):
        a = rng.uniform(-1, 1, 3)
        og, rg, *_ = g.step(a)
        s, r = sr(s, jnp.asarray(a))
        np.testing.assert_allclose(float(r), rg, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(env.observation(s)), og,
                                   rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_policy_hops_forward():
    """CEMPPI makes the on-device hopper move forward."""
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = HopperDeviceEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="cemppi", num_samples=24, horizon=12, lam=1.0,
                       opt_its=2, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.25] * 3)
    s, ps = env.reset(), pol.init_state(1)
    env_step = jax.jit(env.step)
    for _ in range(25):
        a, ps, _ = pol.step(s, ps)
        s = env_step(s, a)
    assert float(s.x[0]) > 0.1, float(s.x[0])
    assert float(s.x[1]) > 0.5, float(s.x[1])  # still upright-ish
