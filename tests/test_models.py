"""Dynamics-model tests: hand-stepped values, geometry queries, invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models import (
    CarRacingEnv,
    CartPoleEnv,
    MountainCarEnv,
    MultiCarRacingEnv,
    Track,
    distance_query,
    rollout_batch,
)


def test_mountain_car_hand_step():
    env = MountainCarEnv(dtype=jnp.float64)
    s = env.reset()  # pos=-0.5, v=0
    s1 = env.step(s, jnp.array([1.0]))
    # v = 0 + 1*0.0015 - cos(3*-0.5)*0.0025
    v_expected = 0.0015 - np.cos(-1.5) * 0.0025
    pos_expected = -0.5 + v_expected
    np.testing.assert_allclose(float(s1.x[1]), v_expected, rtol=1e-12)
    np.testing.assert_allclose(float(s1.x[0]), pos_expected, rtol=1e-12)
    assert not bool(s1.done)


def test_mountain_car_goal_and_reward():
    env = MountainCarEnv(dtype=jnp.float64)
    s = env.reset()
    # non-terminal step: reward = |v| - 1
    s1 = env.step(s, jnp.array([1.0]))
    r = float(env.reward(s1))
    np.testing.assert_allclose(r, abs(float(s1.x[1])) - 1.0, rtol=1e-9)
    # state at the goal: +1e5 + |v|, done → no -1
    from mpopis_tpu.models.base import EnvState

    sg = EnvState(
        x=jnp.array([0.5, 0.05]), t=jnp.asarray(5, jnp.int32), done=jnp.asarray(True)
    )
    np.testing.assert_allclose(float(env.reward(sg)), 100000.0 + 0.05, rtol=1e-9)


def test_cartpole_hand_step():
    env = CartPoleEnv(dtype=jnp.float64)
    from mpopis_tpu.models.base import make_state

    s = make_state(jnp.array([0.0, 0.0, 0.02, 0.0]))
    a = jnp.array([0.5])  # force = 5.0
    s1 = env.step(s, a)
    # replicate the Euler update in numpy
    force, g = 5.0, 9.8
    mc, mp, hl = 1.0, 0.1, 0.5
    tm, pml = mc + mp, mp * hl
    x, xd, th, thd = 0.0, 0.0, 0.02, 0.0
    tmp = (force + pml * thd**2 * np.sin(th)) / tm
    thacc = (g * np.sin(th) - np.cos(th) * tmp) / (
        hl * (4 / 3 - mp * np.cos(th) ** 2 / tm)
    )
    xacc = tmp - pml * thacc * np.cos(th) / tm
    expected = [x + 0.02 * xd, xd + 0.02 * xacc, th + 0.02 * thd, thd + 0.02 * thacc]
    # XLA's transcendentals differ from libm at the ulp level
    np.testing.assert_allclose(np.asarray(s1.x), expected, rtol=1e-7, atol=1e-9)
    assert float(env.reward(s1)) == 1.0


def test_cartpole_termination():
    env = CartPoleEnv(dtype=jnp.float64)
    from mpopis_tpu.models.base import make_state

    s = make_state(jnp.array([2.5, 0.0, 0.0, 0.0]))  # |x| > 2.4 after step
    s1 = env.step(s, jnp.array([0.0]))
    assert bool(s1.done)
    assert float(env.reward(s1)) == 0.0


def test_track_query_center_and_outside():
    track = Track.load("curve")
    pts, widths = track.query_arrays(jnp.float64)
    # a point on the centerline is within, distance ~ 0
    p = jnp.array([track.xs[3], track.ys[3]])
    within, dist = distance_query(pts, widths, p)
    assert bool(within)
    assert float(dist) < 1e-9
    # a point 100m off the first centerline point is outside
    tangent = np.array(
        [track.xs[1] - track.xs[0], track.ys[1] - track.ys[0]]
    )
    normal = np.array([-tangent[1], tangent[0]])
    normal = normal / np.linalg.norm(normal)
    far = np.array([track.xs[0], track.ys[0]]) + 100.0 * normal
    within, dist = distance_query(pts, widths, jnp.array(far))
    assert not bool(within)
    assert float(dist) > 15.0


def test_car_racing_reset_and_straight_drive():
    env = CarRacingEnv(dtype=jnp.float64)
    s = env.reset()
    np.testing.assert_allclose(
        np.asarray(s.x), [0, 0, np.pi / 2, 10, 0, 0, 0, 0], atol=1e-12
    )
    # full throttle straight: car should accelerate and move +y (heading 90°)
    for _ in range(5):
        s = env.step(s, jnp.array([0.0, 1.0]))
    x = np.asarray(s.x)
    assert x[3] > 10.0  # sped up
    assert x[1] > 4.0  # moved along +y
    assert abs(x[0]) < 0.5  # stayed near centerline
    assert np.all(np.isfinite(x))
    # reward near centerline should be positive-ish (speed term dominates)
    r = float(env.reward(s))
    assert r > 0.0


def test_car_racing_braking_slows_car():
    env = CarRacingEnv(dtype=jnp.float64)
    s = env.reset()
    s1 = env.step(s, jnp.array([0.0, -1.0]))
    assert float(s1.x[3]) < 10.0


def test_car_racing_off_track_penalty():
    env = CarRacingEnv(dtype=jnp.float64)
    s = env.reset()
    s = s.replace(x=s.x.at[0].set(200.0))  # way off track
    assert float(env.reward(s)) < -999000.0


def test_multi_car_reset_stagger_and_collision():
    env = MultiCarRacingEnv(num_cars=3, dtype=jnp.float64)
    s = env.reset()
    cars = np.asarray(s.x).reshape(3, 8)
    np.testing.assert_allclose(cars[:, 0], [0.0, 5.0, -5.0])
    np.testing.assert_allclose(cars[:, 3], [10.0, 10.0, 10.0])
    # pairwise distances 5,5,10 — cars at 5m apart are "collided" (≤ 4m? no:
    # 5 > 4, no collision). Move car2 to 3m → two collision pairs? only 1-2.
    r_no_collision = float(env.reward(s))
    x2 = np.asarray(s.x).copy()
    x2[8] = 3.0  # car2 x position
    s2 = s.replace(x=jnp.asarray(x2))
    r_collision = float(env.reward(s2))
    assert r_collision < r_no_collision - 10000.0


def test_multi_car_step_matches_single():
    single = CarRacingEnv(dtype=jnp.float64)
    multi = MultiCarRacingEnv(num_cars=2, dtype=jnp.float64)
    s_m = multi.reset()
    a = jnp.array([0.3, 0.8])
    s_m2 = multi.step(s_m, jnp.concatenate([a, a]))
    # car 1 of the multi env starts identically to the single env
    s_s = single.reset()
    s_s2 = single.step(s_s, a)
    np.testing.assert_allclose(
        np.asarray(s_m2.x)[:8], np.asarray(s_s2.x), rtol=1e-12
    )


def test_rollout_batch_shapes_and_log():
    env = MountainCarEnv(dtype=jnp.float64)
    s0 = env.reset()
    controls = jnp.zeros((7, 5, 1))
    costs, trajs = rollout_batch(env, s0, controls, log_states=True)
    assert costs.shape == (7,)
    assert trajs.shape == (7, 5, 2)
    costs2, trajs2 = rollout_batch(env, s0, controls, log_states=False)
    assert trajs2 is None
    np.testing.assert_allclose(np.asarray(costs), np.asarray(costs2))
