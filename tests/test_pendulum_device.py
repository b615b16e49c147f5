"""On-device InvertedPendulum/InvertedDoublePendulum vs the real MuJoCo."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

import jax
import jax.numpy as jnp

from mpopis_tpu.models import (
    InvertedDoublePendulumDeviceEnv,
    InvertedPendulumDeviceEnv,
)
from mpopis_tpu.models import pendulum_device as pdd


def _mj(name):
    import os

    import gymnasium.envs.mujoco as gm

    xml = os.path.join(os.path.dirname(gm.__file__), "assets", name)
    m = mujoco.MjModel.from_xml_path(xml)
    return m, mujoco.MjData(m)


def test_constants_match_mjmodel():
    m, _ = _mj("inverted_pendulum.xml")
    np.testing.assert_allclose(m.body_mass[1], pdd._IP_M_CART, rtol=1e-12)
    np.testing.assert_allclose(m.body_mass[2], pdd._IP_M_POLE, rtol=1e-12)
    np.testing.assert_allclose(m.body_inertia[2][1], pdd._IP_I_POLE, rtol=1e-12)
    np.testing.assert_allclose(m.body_ipos[2][[0, 2]], pdd._IP_COM, rtol=1e-12)
    np.testing.assert_allclose(m.dof_invweight0, pdd._IP_INVWEIGHT, rtol=1e-12)
    m2, _ = _mj("inverted_double_pendulum.xml")
    np.testing.assert_allclose(m2.body_mass[2], pdd._IDP_M_POLE, rtol=1e-12)
    np.testing.assert_allclose(m2.body_inertia[2][1], pdd._IDP_I_POLE, rtol=1e-12)
    np.testing.assert_allclose(
        m2.dof_invweight0[0], pdd._IDP_INVWEIGHT_SLIDE, rtol=1e-12
    )
    assert float(m2.jnt_margin[0]) == pdd._IDP_MARGIN


@pytest.mark.parametrize(
    "name,env_cls,nq,skip",
    [
        ("inverted_pendulum.xml", InvertedPendulumDeviceEnv, 2, 2),
        ("inverted_double_pendulum.xml", InvertedDoublePendulumDeviceEnv, 3, 5),
    ],
)
@pytest.mark.slow
def test_trajectory_matches_mj_step(name, env_cls, nq, skip):
    """150 frame-skipped steps under full-range random forces (slide and
    hinge limits are hit) stay machine-exact vs mj_step."""
    m, d = _mj(name)
    mujoco.mj_resetData(m, d)
    env = env_cls(dtype=jnp.float64)
    s = env.reset()
    step = jax.jit(env.step)
    rng = np.random.default_rng(7)
    for _ in range(150):
        a = rng.uniform(env.action_low, env.action_high)
        d.ctrl[:] = a
        for _ in range(skip):
            mujoco.mj_step(m, d)
        s = step(s, jnp.asarray(a))
        # agreement bounded by MuJoCo Newton-solver tolerance; the IDP
        # trajectory under full-range random forces is chaotic (poles spin
        # dozens of radians) yet the error stays ~1e-9
        np.testing.assert_allclose(
            np.asarray(s.x[:nq]), d.qpos, rtol=1e-7, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(s.x[nq : 2 * nq]), d.qvel, rtol=1e-6, atol=1e-6
        )


def test_idp_obs_and_reward_match_gymnasium():
    g = gymnasium.make("InvertedDoublePendulum-v4").unwrapped
    g.reset(seed=0)
    g.set_state(g.init_qpos, g.init_qvel)
    env = InvertedDoublePendulumDeviceEnv(dtype=jnp.float64)
    s = env.reset()
    np.testing.assert_allclose(
        np.asarray(env.observation(s)), g._get_obs(), atol=1e-12
    )
    step = jax.jit(env.step)
    rng = np.random.default_rng(5)
    for _ in range(25):
        a = rng.uniform(-1, 1, 1)
        og, rg, *_ = g.step(a)
        s = step(s, jnp.asarray(a))
        np.testing.assert_allclose(
            float(env.reward(s)), rg, rtol=1e-9, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(env.observation(s)), og, rtol=1e-8, atol=1e-9
        )


def test_policy_balances_double_pendulum():
    """CEMPPI keeps the double pendulum upright (near-max 10/step reward)
    against the tiny destabilizing x-gravity."""
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = InvertedDoublePendulumDeviceEnv(dtype=jnp.float64)
    cfg = PolicyConfig(kind="cemppi", num_samples=32, horizon=15, lam=0.1,
                       opt_its=2, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.1])
    s, ps = env.reset(), pol.init_state(3)
    env_step = jax.jit(env.step)
    total = 0.0
    for _ in range(30):
        a, ps, _ = pol.step(s, ps)
        s = env_step(s, a)
        total += float(env.reward(s))
    assert total > 9.0 * 30, total
