"""On-device Swimmer vs the real MuJoCo: constants, constrained forward
dynamics, trajectories, gym obs/reward parity, and control quality."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import SwimmerDeviceEnv
from mpopis_tpu.models import swimmer_device as sd


def _mj():
    import os

    import gymnasium.envs.mujoco as gm

    xml = os.path.join(os.path.dirname(gm.__file__), "assets", "swimmer.xml")
    m = mujoco.MjModel.from_xml_path(xml)
    return m, mujoco.MjData(m)


def test_constants_match_mjmodel():
    m, d = _mj()
    assert m.opt.timestep == sd._H
    np.testing.assert_allclose(m.body_mass[1], sd._MASS, rtol=1e-12)
    np.testing.assert_allclose(m.body_inertia[1][0], sd._I_MAX, rtol=1e-12)
    np.testing.assert_allclose(m.body_inertia[1][2], sd._I_MIN, rtol=1e-12)
    np.testing.assert_allclose(m.dof_invweight0[3:5], sd._INVWEIGHT, rtol=1e-12)
    np.testing.assert_allclose(m.jnt_range[3], [-sd._LIMIT, sd._LIMIT], rtol=1e-12)
    assert m.opt.density == sd._RHO and m.opt.viscosity == sd._VISC


def test_mass_matrix_and_qacc_match_mj_forward():
    """Constrained forward dynamics at random states, including single and
    double active joint limits — machine-precision agreement."""
    m, d = _mj()
    rng = np.random.default_rng(1)
    states = [
        (rng.uniform(-1, 1, 5), rng.uniform(-3, 3, 5)) for _ in range(3)
    ]
    states.append((np.array([0.1, -0.2, 0.3, 1.80, -0.5]), rng.uniform(-2, 2, 5)))
    states.append((np.array([0.1, -0.2, 0.3, 1.80, -1.79]), rng.uniform(-2, 2, 5)))
    for qp, qv in states:
        d.qpos[:] = qp
        d.qvel[:] = qv
        d.ctrl[:] = [0.4, -0.3]
        mujoco.mj_forward(m, d)
        full = np.zeros((5, 5))
        mujoco.mj_fullM(m, d, full)
        qt = tuple(jnp.float64(v) for v in qp)
        vt = tuple(jnp.float64(v) for v in qv)
        me = jax.jit(sd._mass_entries)(qt)
        for i in range(5):
            for j in range(i + 1):
                np.testing.assert_allclose(
                    float(me[i][j]), full[i, j], rtol=1e-12, atol=1e-12
                )
        mine_a = np.asarray(
            jax.jit(sd._qacc)(qt, vt, jnp.float64(150 * 0.4),
                              jnp.float64(150 * -0.3))
        )
        np.testing.assert_allclose(mine_a, d.qacc, rtol=1e-9, atol=1e-9)


@pytest.mark.slow
def test_trajectory_matches_mj_step():
    """120 frame-skipped steps under full-scale random actions (limits are
    regularly hit) stay machine-exact vs mj_step."""
    m, d = _mj()
    mujoco.mj_resetData(m, d)
    env = SwimmerDeviceEnv(dtype=jnp.float64)
    s = env.reset()
    step = jax.jit(env.step)
    rng = np.random.default_rng(3)
    for _ in range(120):
        a = rng.uniform(-1, 1, 2)
        d.ctrl[:] = a
        for _ in range(sd._FRAME_SKIP):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(s.x[:5]), d.qpos, rtol=1e-9,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(s.x[5:]), d.qvel, rtol=1e-9,
                                   atol=1e-9)


def test_obs_and_reward_match_gymnasium():
    g = gymnasium.make("Swimmer-v4", reset_noise_scale=0.0).unwrapped
    g.reset(seed=0)
    env = SwimmerDeviceEnv(dtype=jnp.float64)
    s = env.reset()
    np.testing.assert_allclose(np.asarray(env.observation(s)), g._get_obs(),
                               atol=0)
    sr = jax.jit(env.step_reward)
    rng = np.random.default_rng(5)
    for _ in range(25):
        a = rng.uniform(-1, 1, 2)
        og, rg, *_ = g.step(a)
        s, r = sr(s, jnp.asarray(a))
        np.testing.assert_allclose(float(r), rg, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(env.observation(s)), og,
                                   rtol=1e-9, atol=1e-10)


def test_policy_swims_forward():
    """CEMPPI on the device env produces forward locomotion."""
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = SwimmerDeviceEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="cemppi", num_samples=48, horizon=20, lam=1.0,
                       opt_its=2, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.4, 0.4])
    s, ps = env.reset(), pol.init_state(4)
    env_step = jax.jit(env.step)
    for _ in range(40):
        a, ps, _ = pol.step(s, ps)
        s = env_step(s, a)
    x_final = float(s.x[0])
    assert x_final > 0.15, x_final  # moved forward
