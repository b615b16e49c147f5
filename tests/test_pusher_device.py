"""On-device Pusher-v4 (spatial pipeline, Euler, zero gravity) vs MuJoCo.

The parity oracle is the INSTALLED mujoco (3.x) stepping the gymnasium
`pusher.xml` — the exact physics the native host engine
(native/envpool_lite.cc) exposes. gymnasium.make refuses Pusher-v4 on
mujoco>=3 (Farama #950: cylinder collision behavior changed in MuJoCo 3,
which also makes the object nearly immovable under v4's tiny
density-1e-5 cylinder — R ≈ 4e6 on the pair rows), so the obs/reward
cross-check runs against the host engine instead of gymnasium.

The arm-object capsule-cylinder contact is analytic and EXACT: the
capsule-axis witness point is the true minimizer of the point-to-solid-
cylinder distance over the segment (bisection on the convex distance's
derivative — spatial_contact._capsule_cylinder), which is the optimum
MuJoCo's native CCD (GJK) iterates toward. Probed over this module's
pushing episode on mujoco 3.10: dist agrees to 6e-11, position to 6e-7,
normal to 4e-5 — the residual is mujoco's OWN GJK convergence
tolerance, not model error. (The pre-round-5 code used the closest
point to the cylinder AXIS segment instead, which was ~5e-4 wrong on
rim contacts — 19% of the episode's contacts — and the old "multi-point
CCD manifold" explanation was a misdiagnosis: the episode's pair
contacts are single-point throughout.) Trajectories through the
contact-rich pushing episode now track mj_step to ~1e-10, the same
exactness grade as the planar tasks.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import PusherDeviceEnv
from mpopis_tpu.models import pusher_device as pu
from mpopis_tpu.models.spatial_contact import (
    bias_analytic,
    frames,
    mass_entries_analytic,
)
from mpopis_tpu.utils.fastjit import fast_jit


def _mj():
    from mpopis_tpu.models.mujoco_host import _TASKS, _gym_asset

    m = mujoco.MjModel.from_xml_path(_gym_asset(_TASKS["Pusher-v4"][0]))
    return m, mujoco.MjData(m)


_LIMS = np.array([(lo, hi) for _, lo, hi, _, _ in pu._LIMITS[:7]])


def _rand_state(rng):
    qp = np.zeros(11)
    qp[:7] = rng.uniform(_LIMS[:, 0], _LIMS[:, 1])
    qp[7] = rng.uniform(-0.6, 0.6)  # object y slide
    qp[8] = rng.uniform(-0.3, 0.4)  # object x slide
    qv = rng.normal(size=11) * 0.5
    qv[9:] = 0.0  # goal never moves
    return qp, qv


def test_constants_match_mjmodel():
    m, _ = _mj()
    np.testing.assert_allclose(
        [b[5] for b in pu._BODIES], m.body_mass[1:], rtol=1e-12
    )
    np.testing.assert_allclose(m.dof_damping, pu._DAMPING, rtol=1e-12)
    np.testing.assert_allclose(m.dof_armature, pu._ARMATURE, rtol=1e-12)
    np.testing.assert_allclose(
        m.dof_invweight0, pu._DOF_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.body_invweight0[1:, 0], pu._BODY_INVWEIGHT0, rtol=1e-12
    )
    np.testing.assert_allclose(
        m.jnt_range, [(lo, hi) for _, lo, hi, _, _ in pu._LIMITS],
        rtol=1e-12,
    )
    assert m.opt.timestep == pu._H
    assert int(m.opt.integrator) == 0  # Euler
    assert m.opt.gravity[2] == 0.0
    plane = [g for g in range(m.ngeom) if m.geom_type[g] == 0]
    assert float(m.geom_pos[plane[0]][2]) == pu._FLOOR_Z
    np.testing.assert_allclose(m.actuator_ctrlrange[:, 0], [-2.0] * 7)
    np.testing.assert_allclose(m.actuator_ctrlrange[:, 1], [2.0] * 7)


def test_fk_mass_bias_match_mj_forward():
    m, d = _mj()
    rng = np.random.default_rng(2)
    for _ in range(3):
        qp, qv = _rand_state(rng)
        d.qpos[:] = qp
        d.qvel[:] = qv
        mujoco.mj_forward(m, d)
        q64 = tuple(jnp.float64(x) for x in qp)
        v64 = tuple(jnp.float64(x) for x in qv)
        fr = frames(pu.MODEL, q64)
        for bi in range(12):
            np.testing.assert_allclose(
                [float(c) for c in fr.origin[bi]], d.xpos[bi + 1],
                atol=1e-14,
            )
        mm = np.zeros((11, 11))
        mujoco.mj_fullM(m, d, mm)
        ours = mass_entries_analytic(pu.MODEL, q64, fr)
        for i in range(11):
            for j in range(i + 1):
                np.testing.assert_allclose(
                    float(ours[i][j]), mm[i, j], atol=1e-12
                )
        b = bias_analytic(pu.MODEL, q64, v64, fr)
        np.testing.assert_allclose(
            [float(x) for x in b], d.qfrc_bias, atol=1e-11
        )


def test_constrained_qacc_matches_mj_forward():
    """qacc through the 20-row box-QP matches mj_forward at solver
    tolerance on states with table contacts and joint-limit violations
    (the capsule-cylinder pair rows are exercised separately below)."""
    m, d = _mj()
    rng = np.random.default_rng(0)

    @fast_jit
    def qacc(q, qv, tau):
        return jnp.stack(pu._qacc_constrained(q, qv, tau, 6, 40))

    from mpopis_tpu.models.spatial_contact import _capsule_cylinder

    checked = 0
    n = 0
    while n < 4:
        qp, qv = _rand_state(rng)
        fr = frames(pu.MODEL, tuple(map(float, qp)))
        dists = [
            float(_capsule_cylinder(pu.MODEL, fr, p)[0])
            for p in pu.MODEL.pairs
        ]
        if min(dists) < 0.02:  # near/in pair contact: covered by the
            continue  # contact-rich episode test below
        n += 1
        ctrl = rng.uniform(-2, 2, 7)
        d.qpos[:] = qp
        d.qvel[:] = qv
        d.ctrl[:] = ctrl
        mujoco.mj_forward(m, d)
        tau = tuple(float(c) for c in ctrl) + (0.0,) * 4
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
    assert checked >= 4  # genuinely loaded (incl. the inert table rows)


@pytest.mark.slow
def test_trajectory_matches_mj_step():
    """120 frame-skipped control steps of random torques from the gym
    init: mj_step-exact while the fingertips stay off the object (the
    table-contact and limit rows are live throughout)."""
    m, d = _mj()
    mujoco.mj_resetData(m, d)
    env = PusherDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
    s = env.reset()
    step = fast_jit(env.step)
    rng = np.random.default_rng(3)
    acts = 0.3 * rng.standard_normal((60, 7))
    acts[:, 0] -= 0.3
    acts[:, 1] += 0.8
    acts[:, 3] -= 0.4
    for t in range(60):
        a = np.clip(acts[t], -2, 2)
        d.ctrl[:] = a
        for _ in range(pu._FRAME_SKIP):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(s.x[:11]), d.qpos, atol=1e-10)
        xp = np.concatenate([d.xpos[10], d.xpos[11], d.xpos[12]])
        np.testing.assert_allclose(np.asarray(s.x[22:]), xp, atol=1e-10)


@pytest.mark.slow
def test_pushing_episode_tracks_mj_step():
    """A contact-rich pushing episode (fingertips repeatedly touching
    the object cylinder): the exact-witness pair contact (see module
    docstring) tracks mj_step to ~1e-10 — measured max 1.4e-10 over the
    40 steps; asserted at 1e-9 for headroom."""
    m, d = _mj()
    qp0 = np.zeros(11)
    qp0[:7] = [1.34114189, 1.05089310, 0.22015290, -1.70443648,
               0.83345573, -0.92149615, -0.22016646]
    qp0[7] = -0.11166181478485476
    qp0[8] = -0.1801337188662778
    d.qpos[:] = qp0
    mujoco.mj_forward(m, d)
    env = PusherDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
    from mpopis_tpu.models.base import make_state

    x0 = np.zeros(31)
    x0[:11] = qp0
    x0[22:25] = d.xpos[10]
    x0[25:28] = d.xpos[11]
    x0[28:31] = d.xpos[12]
    s = make_state(jnp.asarray(x0))
    step = fast_jit(env.step)
    rng = np.random.default_rng(11)
    acts = 0.15 * rng.standard_normal((40, 7))
    acts[:, 0] -= 0.5
    pair_contacts = 0
    for t in range(40):
        a = np.clip(acts[t], -2, 2)
        d.ctrl[:] = a
        for _ in range(pu._FRAME_SKIP):
            mujoco.mj_step(m, d)
            for c in range(d.ncon):
                g1, g2 = int(d.contact.geom1[c]), int(d.contact.geom2[c])
                if {g1, g2} & {13, 14, 15} and 19 in (g1, g2):
                    pair_contacts += 1
        s = step(s, jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(s.x[:22]),
                                   np.concatenate([d.qpos, d.qvel]),
                                   atol=1e-9)
    assert pair_contacts >= 10  # the episode genuinely touches the object


def test_obs_and_reward_match_host_engine():
    """Obs layout and pre-step-xpos reward vs the native host engine
    stepping the same action sequence (the gymnasium oracle is
    unavailable for Pusher-v4 on mujoco>=3)."""
    from mpopis_tpu.models.mujoco_host import MujocoBatchedEnv

    try:
        host = MujocoBatchedEnv("Pusher-v4", num_envs=1, frame_skip=5)
    except Exception as exc:  # pragma: no cover - build env dependent
        pytest.skip(f"host engine unavailable: {exc}")
    env = PusherDeviceEnv(dtype=jnp.float64, solver_outer=6, solver_cg=40)
    s = env.reset()
    np.testing.assert_allclose(
        np.asarray(env.observation(s)), host.state[0], atol=1e-12
    )
    sr = fast_jit(env.step_reward)
    rng = np.random.default_rng(5)
    for _ in range(8):
        a = rng.uniform(-2, 2, 7)
        obs_h, rew_h = host.step(np.tile(a, (1, 1)))
        s, r = sr(s, jnp.asarray(a))
        np.testing.assert_allclose(float(r), rew_h[0], rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(env.observation(s)), obs_h[0], rtol=1e-8, atol=1e-8
        )


def test_policy_reaches_toward_object():
    """CEMPPI on the on-device Pusher reduces the tips-object distance
    (the -0.5*dist(obj,tips) shaping term through the full MPC loop)."""
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = PusherDeviceEnv(dtype=jnp.float64, solver_outer=3, solver_cg=6)
    cfg = PolicyConfig(kind="cemppi", num_samples=16, horizon=8, lam=1.0,
                       opt_its=2, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.25] * 7, jit=False)

    @fast_jit
    def mpc(s, ps):
        a, ps2, _ = pol.step(s, ps)
        return env.step(s, a), ps2

    s, ps = env.reset(), pol.init_state(1)
    d0 = float(env.reward(s))
    for _ in range(10):
        s, ps = mpc(s, ps)
    assert np.isfinite(np.asarray(s.x)).all()
    assert float(env.reward(s)) > d0  # shaped reward improves
