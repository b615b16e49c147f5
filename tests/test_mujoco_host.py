"""envpool-lite subsystem tests: native engine vs gymnasium equivalence,
snapshot/restore, action-CSV replay cross-check, host policy end-to-end."""

import warnings

warnings.filterwarnings("ignore")

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

from mpopis_tpu.models.mujoco_host import MujocoBatchedEnv
from mpopis_tpu.policies.config import PolicyConfig
from mpopis_tpu.policies.host_driver import make_host_policy


@pytest.fixture(scope="module")
def cheetah_env():
    env = MujocoBatchedEnv("HalfCheetah-v4", num_envs=4, frame_skip=5)
    yield env
    env.close()


def test_native_engine_builds(cheetah_env):
    assert cheetah_env._backend == "native"
    assert cheetah_env.obs_dim == 17
    assert cheetah_env.action_dim == 6
    assert cheetah_env.dt == pytest.approx(0.05)


def test_native_matches_gymnasium_bitexact(cheetah_env):
    g = gymnasium.make("HalfCheetah-v4", reset_noise_scale=0.0).unwrapped
    og, _ = g.reset(seed=0)
    o0 = cheetah_env.reset()
    np.testing.assert_allclose(o0[0], og, atol=0)
    rng = np.random.default_rng(0)
    tot_g, tot_e = 0.0, 0.0
    for _ in range(15):
        a = rng.uniform(-1, 1, 6)
        og, rg, *_ = g.step(a)
        oe, re = cheetah_env.step(np.tile(a, (4, 1)))
        tot_g += rg
        tot_e += re[0]
    np.testing.assert_allclose(oe[0], og, atol=0)
    np.testing.assert_allclose(tot_e, tot_g, atol=0)


@pytest.mark.parametrize(
    "task",
    [
        "Hopper-v4",
        "Humanoid-v4",
        "HumanoidStandup-v4",
        "InvertedPendulum-v4",
        "InvertedDoublePendulum-v4",
        "Reacher-v4",
    ],
)
def test_native_task_matches_gymnasium(task):
    """Obs and reward of every supported task match gymnasium v4 on the
    same action sequence. (Pusher-v4 runs on the native engine but
    gymnasium refuses it under mujoco>=3, so it has no oracle here;
    InvertedPendulum rewards are compared only while healthy — the engine
    gates the alive bonus where gym terminates.)"""
    try:
        g = gymnasium.make(task, reset_noise_scale=0.0).unwrapped
    except TypeError:
        g = gymnasium.make(task).unwrapped
    g.reset(seed=0)
    g.set_state(g.init_qpos, g.init_qvel)
    e = MujocoBatchedEnv(task, num_envs=2, frame_skip=g.frame_skip)
    assert e._backend == "native"
    og = g._get_obs()
    o0 = e.reset()
    np.testing.assert_allclose(o0[0], og, atol=0)
    rng = np.random.default_rng(1)
    for _ in range(10):
        a = rng.uniform(e.action_low, e.action_high) * 0.5
        og, rg, term, *_ = g.step(a)
        oe, re = e.step(np.tile(a, (2, 1)))
        np.testing.assert_allclose(oe[0], og, atol=0)
        if task == "InvertedPendulum-v4" and (term or abs(g.data.qpos[1]) > 0.2):
            break
        np.testing.assert_allclose(re[0], rg, rtol=1e-12, atol=1e-15)
    e.close()


def test_pusher_runs_native_only():
    """Pusher-v4 has no gymnasium oracle under mujoco>=3 (Farama #950);
    assert the native engine still loads and steps it sanely."""
    e = MujocoBatchedEnv("Pusher-v4", num_envs=2, frame_skip=5)
    assert e._backend == "native"
    assert (e.obs_dim, e.action_dim) == (23, 7)
    obs, rew = e.step(np.zeros((2, 7)))
    assert np.isfinite(obs).all() and np.isfinite(rew).all()
    e.close()


def test_snapshot_restore_exact(cheetah_env):
    cheetah_env.reset()
    cheetah_env.step(np.full((4, 6), 0.3))
    cheetah_env.snapshot()
    obs_ref, rew_ref = cheetah_env.step(np.full((4, 6), -0.2))
    cheetah_env.restore()
    obs2, rew2 = cheetah_env.step(np.full((4, 6), -0.2))
    np.testing.assert_allclose(obs2, obs_ref, atol=0)
    np.testing.assert_allclose(rew2, rew_ref, atol=0)


def test_acts_csv_replay_crosscheck(tmp_path, cheetah_env):
    """The reference's make_mujoco_gif.py scheme: engine total reward for a
    recorded action sequence must match a vanilla gymnasium replay."""
    cheetah_env.reset()
    rng = np.random.default_rng(3)
    total_engine = 0.0
    for _ in range(10):
        a = rng.uniform(-0.5, 0.5, 6)
        _, rews = cheetah_env.step(a)  # broadcast + record
        total_engine += rews[0]
    csv = cheetah_env.write_acts_to_file(str(tmp_path / "acts"))
    from scripts.replay_mujoco import replay

    total_replay = replay(csv, "HalfCheetah-v4")
    np.testing.assert_allclose(total_engine, total_replay, rtol=1e-12)


def test_host_policy_end_to_end():
    env = MujocoBatchedEnv("HalfCheetah-v4", num_envs=12, frame_skip=5)
    cfg = PolicyConfig(
        kind="cemppi", num_samples=12, horizon=6, opt_its=2, lam=1.0,
        sigma_est="ss",
    )
    pol = make_host_policy(env, cfg, cov_mat=0.25 * np.eye(6))
    ps = pol.init_state(1)
    total = 0.0
    for _ in range(5):
        act, ps, info = pol.step(ps)
        assert np.isfinite(act).all()
        env.step(act)
        total += env.rews[0]
    assert np.isfinite(total)
    w = info["weights"]
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    env.close()


def test_host_policy_mppi_and_other_tasks():
    env = MujocoBatchedEnv("Swimmer-v4", num_envs=8, frame_skip=5)
    cfg = PolicyConfig(kind="mppi", num_samples=8, horizon=5, lam=1.0)
    pol = make_host_policy(env, cfg, cov_mat=0.25 * np.eye(env.action_dim))
    ps = pol.init_state(0)
    act, ps, _ = pol.step(ps)
    assert act.shape == (env.action_dim,)
    assert np.isfinite(act).all()
    env.close()


def test_python_fallback_backend():
    env = MujocoBatchedEnv("HalfCheetah-v4", num_envs=2, frame_skip=5, native=False)
    assert env._backend == "python"
    obs, rew = env.step(np.zeros((2, 6)))
    assert obs.shape == (2, 17)
    env.snapshot()
    env.step(np.ones((2, 6)))
    env.restore()
    obs2, _ = env.step(np.zeros((2, 6)))
    assert np.isfinite(obs2).all()
    env.close()


def test_harness_inverted_double_pendulum():
    """simulate_mujoco end-to-end on a non-locomotion task."""
    from mpopis_tpu.harness.simulate_mujoco import simulate_mujoco

    metrics = simulate_mujoco(
        "InvertedDoublePendulum-v4",
        num_trials=1,
        num_steps=10,
        policy_type="cemppi",
        num_samples=12,
        horizon=8,
        ais_its=2,
        lam=1.0,
        seed=3,
        print_output=False,
    )
    # alive bonus is 10/step minus small penalties: a sane controller stays
    # near 10 reward/step over 10 steps
    assert metrics["rewards"][0] > 60.0
