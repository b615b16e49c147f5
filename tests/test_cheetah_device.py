"""On-device HalfCheetah (contacts!) vs the real MuJoCo."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import CheetahDeviceEnv
from mpopis_tpu.models import cheetah_device as chd


def _mj():
    import os

    import gymnasium.envs.mujoco as gm

    xml = os.path.join(os.path.dirname(gm.__file__), "assets",
                       "half_cheetah.xml")
    m = mujoco.MjModel.from_xml_path(xml)
    return m, mujoco.MjData(m)


def test_constants_match_mjmodel():
    m, _ = _mj()
    np.testing.assert_allclose(
        [b[4] for b in chd._BODIES], m.body_mass[1:], rtol=1e-12
    )
    np.testing.assert_allclose(m.dof_damping, chd._DAMPING, rtol=1e-12)
    np.testing.assert_allclose(m.jnt_stiffness, chd._STIFFNESS, rtol=1e-12)
    np.testing.assert_allclose(m.dof_armature, chd._ARMATURE, rtol=1e-12)
    np.testing.assert_allclose(m.dof_invweight0, chd._DOF_INVWEIGHT0, rtol=1e-12)
    np.testing.assert_allclose(
        m.body_invweight0[1:, 0], chd._BODY_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.jnt_range[3:], [(l, h) for _, l, h in chd._LIMITS], rtol=1e-12
    )


def test_mass_matrix_and_contact_qacc_match_mj_forward():
    """Constrained forward dynamics on deep-contact states (10 contacts,
    40 pyramid rows) matches mj_forward at solver tolerance."""
    m, d = _mj()
    states = [
        (np.array([0, -0.48, 0.05, 0.2, -0.3, 0.2, -0.3, 0.2, -0.2]),
         np.array([1.0, -0.8, 0.3, 0.5, -0.5, 0.4, -0.4, 0.3, -0.3]),
         np.array([0.3, -0.2, 0.1, -0.1, 0.2, -0.3])),
        (np.array([0, -0.33, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
         np.zeros(9), np.zeros(6)),
        # joint limits + contacts simultaneously
        (np.array([0, -0.4, 0.1, 1.1, -0.8, 0.8, -1.05, 0.9, -0.55]),
         np.ones(9), np.full(6, 0.5)),
    ]
    for qp, qv, ctrl in states:
        d.qpos[:] = qp
        d.qvel[:] = qv
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        full = np.zeros((9, 9))
        mujoco.mj_fullM(m, d, full)
        qt = tuple(jnp.float64(v) for v in qp)
        vt = tuple(jnp.float64(v) for v in qv)
        me = jax.jit(chd._mass_entries)(qt)
        for i in range(9):
            for j in range(i + 1):
                np.testing.assert_allclose(
                    float(me[i][j]), full[i, j], rtol=1e-10, atol=1e-12
                )
        tau = (0.0,) * 3 + tuple(chd._GEAR[i] * ctrl[i] for i in range(6))

        def qacc_me(q, v):
            mm = chd._mass_entries(q)
            l = chd.chol_unrolled(mm, 9)
            smooth = chd._qfrc_smooth(q, v, tau)
            a_sm = chd.chol_solve_unrolled(l, smooth, 9)
            zero = jnp.zeros_like(q[0])
            rows = chd._contact_rows(q, v, zero)
            qf = chd._solve_qp(rows, zero, l, a_sm, 6, 40)
            return tuple(
                chd.chol_solve_unrolled(
                    l, [smooth[i] + qf[i] for i in range(9)], 9
                )
            )

        acc = np.array([float(x) for x in jax.jit(qacc_me)(qt, vt)])
        scale = max(1.0, np.abs(d.qacc).max())
        np.testing.assert_allclose(acc / scale, d.qacc / scale, atol=1e-9)


@pytest.mark.slow
def test_trajectory_matches_mj_step():
    """60 frame-skipped steps of random full-range actions (drop, impact,
    scrambling — contacts and limits constantly active): the on-device
    trajectory tracks mj_step at the level MuJoCo tracks ITSELF under a
    1e-12 perturbation (contact dynamics are chaotic; measured control
    curve in git history)."""
    m, d = _mj()
    mujoco.mj_resetData(m, d)
    env = CheetahDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
    s = env.reset()
    step = jax.jit(env.step)
    rng = np.random.default_rng(1)
    for t in range(60):
        a = rng.uniform(-1, 1, 6)
        d.ctrl[:] = a
        for _ in range(chd._FRAME_SKIP):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        np.testing.assert_allclose(
            np.asarray(s.x[:9]), d.qpos, rtol=2e-5, atol=2e-7
        )


def test_obs_and_reward_match_gymnasium():
    g = gymnasium.make("HalfCheetah-v4", reset_noise_scale=0.0).unwrapped
    g.reset(seed=0)
    # parity-grade solver: this pins the obs/reward formulas over chained
    # steps, so the dynamics must track mj_step tightly throughout
    env = CheetahDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
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


def test_policy_runs_forward():
    """CEMPPI makes the on-device cheetah run forward."""
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = CheetahDeviceEnv(dtype=jnp.float64, solver_outer=4, solver_cg=24)
    cfg = PolicyConfig(kind="cemppi", num_samples=24, horizon=12, lam=1.0,
                       opt_its=2, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.25] * 6)
    s, ps = env.reset(), pol.init_state(1)
    env_step = jax.jit(env.step)
    for _ in range(25):
        a, ps, _ = pol.step(s, ps)
        s = env_step(s, a)
    assert float(s.x[0]) > 0.4, float(s.x[0])
