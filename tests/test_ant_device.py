"""On-device Ant-v4 (3D spatial contacts) vs the real MuJoCo.

The first 3D task: free-joint quaternion root, 8 hinge dofs, 25
sphere/capsule-end floor candidates with 3D pyramidal cones. Mirrors the
planar exactness suites (test_cheetah_device.py); the constrained-qacc
and trajectory tests are the load-bearing checks.

The spatial scalar graph is much larger than the planar ones (n=14, 108
QP rows, RK4 = 4 constrained solves per substep), so every jit here
lowers with _fast_jit (reduced XLA backend optimization effort —
identical math, CPU-only tests) to keep compile times in minutes.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import AntDeviceEnv
from mpopis_tpu.models import ant_device as ad
from mpopis_tpu.models.spatial_contact import (
    bias_analytic,
    frames,
    mass_entries_analytic,
)
from mpopis_tpu.utils.fastjit import fast_jit


def _mj():
    import os

    import gymnasium.envs.mujoco as gm

    xml = os.path.join(os.path.dirname(gm.__file__), "assets", "ant.xml")
    m = mujoco.MjModel.from_xml_path(xml)
    return m, mujoco.MjData(m)


def _rand_state(rng, drop=0.35):
    """Random tilted mid-air/contact state (torso low enough to load
    several leg contacts)."""
    qp = np.zeros(15)
    qp[0:3] = [rng.uniform(-1, 1), rng.uniform(-1, 1), drop]
    v = rng.normal(size=3)
    v /= np.linalg.norm(v)
    th = rng.uniform(0.0, 1.0)
    qp[3:7] = np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * v])
    qp[7:] = rng.uniform(-0.5, 0.5, size=8)
    qv = rng.normal(size=14)
    return qp, qv


def test_constants_match_mjmodel():
    m, _ = _mj()
    np.testing.assert_allclose(
        [b[5] for b in ad._BODIES], m.body_mass[1:], rtol=1e-12
    )
    np.testing.assert_allclose(m.dof_damping, ad._DAMPING, rtol=1e-12)
    np.testing.assert_allclose(m.dof_armature, ad._ARMATURE, rtol=1e-12)
    np.testing.assert_allclose(
        m.dof_invweight0, ad._DOF_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.body_invweight0[1:, 0], ad._BODY_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.jnt_range[1:], [(lo, hi) for _, lo, hi, _, _ in ad._LIMITS],
        rtol=1e-12,
    )
    assert m.opt.timestep == ad._H
    assert int(m.opt.integrator) == 1  # RK4
    # actuator map: trnid dof order and gears
    np.testing.assert_allclose(m.actuator_gear[:, 0],
                               [g for _, g in ad._ACTUATORS], rtol=1e-12)


def test_fk_mass_bias_match_mj_forward():
    """World FK, mass matrix and bias forces match MuJoCo to machine
    precision on random tilted states (the 3D probes, as a pinned test)."""
    m, d = _mj()
    rng = np.random.default_rng(3)

    @fast_jit
    def fk_m_bias(q, qv):
        fr = frames(ad.MODEL, q)
        mm = mass_entries_analytic(ad.MODEL, q, fr)
        b = bias_analytic(ad.MODEL, q, qv, fr)
        xp = jnp.stack([jnp.stack(fr.origin[bi]) for bi in range(13)])
        mj = jnp.stack([
            jnp.stack([mm[i][j] if i >= j else mm[j][i] for j in range(14)])
            for i in range(14)
        ])
        return xp, mj, jnp.stack(b)

    for _ in range(3):
        qp, qv = _rand_state(rng)
        d.qpos[:] = qp
        d.qvel[:] = qv
        mujoco.mj_forward(m, d)
        xp, mj, b = fk_m_bias(
            tuple(jnp.float64(x) for x in qp),
            tuple(jnp.float64(x) for x in qv),
        )
        np.testing.assert_allclose(np.asarray(xp), d.xpos[1:], atol=1e-13)
        full = np.zeros((14, 14))
        mujoco.mj_fullM(m, d, full)
        np.testing.assert_allclose(np.asarray(mj), full, atol=1e-12)
        np.testing.assert_allclose(np.asarray(b), d.qfrc_bias, atol=1e-11)


def test_constrained_qacc_matches_mj_forward():
    """Constrained forward dynamics (3D contacts + joint limits through
    the box-QP) matches mj_forward at solver tolerance on states with
    many active contacts."""
    m, d = _mj()
    rng = np.random.default_rng(0)

    @fast_jit
    def qacc(q, qv, tau):
        return jnp.stack(ad._qacc_constrained(q, qv, tau, 6, 40))

    checked = 0
    for i in range(4):
        qp, qv = _rand_state(rng, drop=0.3 + 0.05 * i)
        ctrl = rng.uniform(-1, 1, 8)
        d.qpos[:] = qp
        d.qvel[:] = qv
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        tau = np.zeros(14)
        for k, (dof, gear) in enumerate(ad._ACTUATORS):
            tau[dof] = gear * ctrl[k]
        acc = np.asarray(
            qacc(
                tuple(jnp.float64(x) for x in qp),
                tuple(jnp.float64(x) for x in qv),
                tuple(jnp.float64(x) for x in tau),
            )
        )
        scale = max(1.0, np.abs(d.qacc).max())
        np.testing.assert_allclose(acc / scale, d.qacc / scale, atol=1e-8)
        checked += d.ncon
    assert checked >= 6  # the states genuinely load contacts


@pytest.mark.slow
def test_trajectory_matches_mj_step():
    """Frame-skipped steps of random full-range actions from the gym
    init (ankle limits violated at t=0, drop, impact): the on-device
    trajectory tracks mj_step like the planar suites do."""
    m, d = _mj()
    mujoco.mj_resetData(m, d)
    env = AntDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
    s = env.reset()
    step = fast_jit(env.step)
    rng = np.random.default_rng(1)
    for t in range(20):
        a = rng.uniform(-1, 1, 8)
        d.ctrl[:] = a
        for _ in range(ad._FRAME_SKIP):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        np.testing.assert_allclose(
            np.asarray(s.x[:15]), d.qpos, rtol=3e-5, atol=3e-6
        )
        np.testing.assert_allclose(
            np.asarray(s.x[29]), d.xpos[1][0], rtol=3e-5, atol=3e-6
        )


def test_obs_and_reward_match_gymnasium():
    g = gymnasium.make("Ant-v4", reset_noise_scale=0.0).unwrapped
    g.reset(seed=0)
    env = AntDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
    s = env.reset()
    np.testing.assert_allclose(np.asarray(env.observation(s)), g._get_obs(),
                               atol=0)
    sr = fast_jit(env.step_reward)
    rng = np.random.default_rng(5)
    for _ in range(8):
        a = rng.uniform(-1, 1, 8)
        og, rg, *_ = g.step(a)
        s, r = sr(s, jnp.asarray(a))
        np.testing.assert_allclose(float(r), rg, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(env.observation(s)), og,
                                   rtol=1e-5, atol=1e-6)


def test_policy_stays_healthy():
    """CEMPPI on the on-device Ant keeps the torso up (the healthy-bonus
    + forward-velocity objective through the full MPC loop)."""
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = AntDeviceEnv(dtype=jnp.float64, solver_outer=3, solver_cg=8)
    cfg = PolicyConfig(kind="cemppi", num_samples=16, horizon=8, lam=1.0,
                       opt_its=2, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.25] * 8, jit=False)

    @fast_jit
    def mpc(s, ps):
        a, ps2, _ = pol.step(s, ps)
        return env.step(s, a), ps2

    s, ps = env.reset(), pol.init_state(1)
    for _ in range(10):
        s, ps = mpc(s, ps)
    assert float(s.x[2]) > 0.3  # torso stays up
