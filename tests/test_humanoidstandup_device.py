"""On-device HumanoidStandup-v4 (3D spatial contacts + self-collision
+ cfrc_ext reward term) vs the real MuJoCo.

The 11th and last envpool task to come on-device. Same humanoid tree as
Humanoid-v4 but authored lying down; the extra machinery under test
here is the contact-force (cfrc_ext) reconstruction that the reward's
quad_impact_cost reads — spatial_contact.contact_force_ssq.

SOLVER NOTE: like gym's humanoid.xml, humanoidstandup.xml pins
`solver="PGS" iterations="50"`, which does not converge on deep
multi-contact states (see tests/test_humanoid_device.py's measured
PGS-vs-Newton residuals). The exactness pins below run
mj_forward/mj_step with opt.solver=Newton (same physics model and
constraint data — only the numerical QP method differs).

HumanoidStandup-v4 hardcodes reset noise (uniform ±0.01, no
reset_noise_scale kwarg), so every comparison pins the state with
env.set_state first.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import HumanoidStandupDeviceEnv
from mpopis_tpu.models import humanoidstandup_device as hd
from mpopis_tpu.models.spatial_contact import (
    bias_analytic,
    contact_force_ssq,
    frames,
    mass_entries_analytic,
)
from mpopis_tpu.utils.fastjit import fast_jit


def _mj(newton: bool = True):
    import os

    import gymnasium.envs.mujoco as gm

    xml = os.path.join(
        os.path.dirname(gm.__file__), "assets", "humanoidstandup.xml"
    )
    m = mujoco.MjModel.from_xml_path(xml)
    if newton:  # converged reference (see module docstring)
        m.opt.solver = 2
        m.opt.iterations = 200
        m.opt.tolerance = 1e-15
    return m, mujoco.MjData(m)


def _thrash_states(n, seed=0, every=(10, 30, 60, 120, 250)):
    """States along a random-action trajectory from the supine init
    (the humanoid writhes on the floor — contact-rich from step 1);
    returns (qpos, qvel) snapshots, preferring self-contact-rich
    ones."""
    env = gymnasium.make("HumanoidStandup-v4").unwrapped
    m, d = env.model, env.data
    env.reset(seed=seed)
    env.set_state(m.qpos0.copy(), np.zeros(m.nv))
    rng = np.random.default_rng(seed)
    out = []
    for i in range(300):
        env.step(rng.uniform(-0.4, 0.4, 17))
        nself = sum(1 for c in d.contact if c.geom1 != 0)
        if i in every or (nself >= 2 and len(out) < n):
            out.append((d.qpos.copy(), d.qvel.copy()))
        if len(out) >= n:
            break
    env.close()
    return out[:n]


def test_constants_match_mjmodel():
    m, _ = _mj(newton=False)
    np.testing.assert_allclose(
        [b[5] for b in hd._BODIES], m.body_mass[1:], rtol=1e-12
    )
    np.testing.assert_allclose(m.dof_damping, hd._DAMPING, rtol=1e-12)
    np.testing.assert_allclose(m.dof_armature, hd._ARMATURE, rtol=1e-12)
    np.testing.assert_allclose(
        m.dof_invweight0, hd._DOF_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.body_invweight0[1:, 0], hd._BODY_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.jnt_range[1:], [(lo, hi) for _, lo, hi, _, _ in hd._LIMITS],
        rtol=1e-12,
    )
    assert m.opt.timestep == hd._H
    assert int(m.opt.integrator) == 1  # RK4
    np.testing.assert_allclose(m.actuator_gear[:, 0],
                               [g for _, g in hd._ACTUATORS], rtol=1e-12)
    # the supine init + the one joint-range diff vs Humanoid-v4
    np.testing.assert_allclose(m.qpos0[2], 0.105)
    assert hd._LIMITS[9][1] == pytest.approx(-2.0943951023931953)
    assert hd.MODEL.n_rows == 242


def test_fk_mass_bias_match_mj_forward():
    """World FK, mass matrix and bias forces match MuJoCo to machine
    precision on contact-rich supine states."""
    m, d = _mj(newton=False)

    @fast_jit
    def fk_m_bias(q, qv):
        fr = frames(hd.MODEL, q)
        mm = mass_entries_analytic(hd.MODEL, q, fr)
        b = bias_analytic(hd.MODEL, q, qv, fr)
        xp = jnp.stack([jnp.stack(fr.origin[bi]) for bi in range(13)])
        mj = jnp.stack([
            jnp.stack([mm[i][j] if i >= j else mm[j][i] for j in range(23)])
            for i in range(23)
        ])
        return xp, mj, jnp.stack(b)

    for qp, qv in _thrash_states(3, seed=3):
        d.qpos[:] = qp
        d.qvel[:] = qv
        mujoco.mj_forward(m, d)
        xp, mj, b = fk_m_bias(
            tuple(jnp.float64(x) for x in qp),
            tuple(jnp.float64(x) for x in qv),
        )
        np.testing.assert_allclose(np.asarray(xp), d.xpos[1:], atol=1e-12)
        full = np.zeros((23, 23))
        mujoco.mj_fullM(m, d, full)
        np.testing.assert_allclose(np.asarray(mj), full, atol=1e-11)
        np.testing.assert_allclose(np.asarray(b), d.qfrc_bias, atol=1e-9)


@pytest.mark.slow
def test_cfrc_ext_ssq_matches_mj():
    """contact_force_ssq reconstructs Σ‖data.cfrc_ext‖² from the QP's λ
    at mj_forward states (Newton-converged so both solvers agree on
    efc_force)."""
    m, d = _mj(newton=True)

    @fast_jit
    def dev_ssq(q, qv, tau):
        from mpopis_tpu.models.spatial_contact import (
            chol_solve_unrolled,
            chol_unrolled,
        )
        # one constrained forward at (q, qv, tau), then decode λ
        fr = frames(hd.MODEL, q)
        mm = mass_entries_analytic(hd.MODEL, q, fr)
        l = chol_unrolled(mm, 23)
        sm = hd._qfrc_smooth_fn(q, qv, tau, fr)
        a_sm = chol_solve_unrolled(l, sm, 23)
        zero = jnp.zeros_like(q[0])
        from mpopis_tpu.models.planar_contact import solve_qp_dense
        from mpopis_tpu.models.spatial_contact import contact_rows
        rows = contact_rows(hd.MODEL, q, qv, zero, fr)
        _qf, lam = solve_qp_dense(rows, zero, l, a_sm, 6, 40, 23,
                                  return_lam=True)
        return contact_force_ssq(hd.MODEL, q, lam, fr)

    rng = np.random.default_rng(2)
    checked = 0
    for qp, qv in _thrash_states(4, seed=1):
        ctrl = rng.uniform(-0.4, 0.4, 17)
        d.qpos[:] = qp
        d.qvel[:] = qv
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        mujoco.mj_rnePostConstraint(m, d)
        tau = np.zeros(23)
        for k, (dof, gear) in enumerate(hd._ACTUATORS):
            tau[dof] = gear * ctrl[k]
        ssq = float(dev_ssq(
            tuple(jnp.float64(x) for x in qp),
            tuple(jnp.float64(x) for x in qv),
            tuple(jnp.float64(x) for x in tau),
        ))
        ref = float((d.cfrc_ext ** 2).sum())
        np.testing.assert_allclose(ssq, ref, rtol=1e-6, atol=1e-8)
        if ref > 1.0:
            checked += 1
    assert checked >= 2  # genuinely nonzero contact forces were compared


@pytest.mark.slow
def test_trajectory_matches_mj_step_newton():
    """Frame-skipped steps of random full-range actions from the supine
    init: the on-device trajectory tracks the Newton-solver mj_step,
    and the stage-4 cfrc_ext quirk matches data.cfrc_ext."""
    m, d = _mj(newton=True)
    mujoco.mj_resetData(m, d)
    env = HumanoidStandupDeviceEnv(
        dtype=jnp.float64, solver_outer=6, solver_cg=40
    )
    s = env.reset()
    step = fast_jit(env.step)
    rng = np.random.default_rng(1)
    for t in range(15):
        a = rng.uniform(-0.4, 0.4, 17)
        d.ctrl[:] = a
        for _ in range(hd._FRAME_SKIP):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        # measured max relative error 1.0e-14 over the 15 steps (round-5
        # sweep; the earlier rtol=3e-5 was a stale conservative bound) —
        # asserted at the planar suites' exactness grade
        np.testing.assert_allclose(
            np.asarray(s.x[:24]), d.qpos, rtol=1e-12, atol=1e-13
        )
    mujoco.mj_rnePostConstraint(m, d)
    # stage-4 cfrc_ext reconstruction: measured 1.1e-14 relative
    np.testing.assert_allclose(
        float(s.x[47]), (d.cfrc_ext ** 2).sum(), rtol=1e-12
    )


@pytest.mark.slow
def test_obs_and_reward_match_gymnasium_newton():
    """Obs (kinematic prefix) and the full reward (uph − ctrl − impact
    + 1) vs the gym env with the solver switched to Newton."""
    g = gymnasium.make("HumanoidStandup-v4").unwrapped
    g.reset(seed=0)
    g.model.opt.solver = 2
    g.model.opt.iterations = 200
    g.model.opt.tolerance = 1e-15
    g.set_state(g.model.qpos0.copy(), np.zeros(g.model.nv))
    env = HumanoidStandupDeviceEnv(
        dtype=jnp.float64, solver_outer=6, solver_cg=40
    )
    s = env.reset()
    np.testing.assert_allclose(
        np.asarray(env.observation(s)), g._get_obs()[:45], atol=0
    )
    sr = fast_jit(env.step_reward)
    rng = np.random.default_rng(5)
    saw_impact = False
    for _ in range(8):
        a = rng.uniform(-0.4, 0.4, 17)
        og, rg, _, _, info = g.step(a)
        s, r = sr(s, jnp.asarray(a))
        np.testing.assert_allclose(float(r), rg, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(env.observation(s)), og[:45],
                                   rtol=1e-5, atol=1e-6)
        if info["reward_impact"] < -1e-4:
            saw_impact = True
    assert saw_impact  # the impact term was genuinely exercised


@pytest.mark.slow
def test_policy_raises_torso():
    """CEMPPI on the on-device HumanoidStandup raises the torso above
    the zero-action floor-writhe (the uph objective through the full
    MPC loop; a tiny-K smoke test, not a trained controller).

    Policy and env steps jitted separately — see
    test_humanoid_device.test_policy_keeps_torso_up (the fused 242-row
    module breaks XLA:CPU's LLVM backend); marked slow for the same
    compile-cost reason."""
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = HumanoidStandupDeviceEnv(
        dtype=jnp.float64, solver_outer=3, solver_cg=6
    )
    cfg = PolicyConfig(kind="cemppi", num_samples=12, horizon=6, lam=1.0,
                       opt_its=2, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.04] * 17, jit=False)

    pol_step = fast_jit(lambda s, ps: pol.step(s, ps)[:2])
    step = fast_jit(env.step)

    s, ps = env.reset(), pol.init_state(1)
    for _ in range(6):
        a, ps = pol_step(s, ps)
        s = step(s, a)
    z_mpc = float(s.x[2])
    s0 = env.reset()
    for _ in range(6):
        s0 = step(s0, jnp.zeros(17))
    assert z_mpc >= float(s0.x[2]) - 0.02  # at least matches passivity
    assert z_mpc > 0.08  # torso not driven into the floor
