"""Harness tests: drivers run end-to-end, stats match the reference's
order-statistic CI scheme, plots render."""

import jax.numpy as jnp
import pytest
import numpy as np

from mpopis_tpu.harness import quantile_ci, simulate_car_racing, simulate_mountaincar
from mpopis_tpu.harness.stats import summary_value


def test_quantile_ci_hand_check():
    x = np.arange(1.0, 101.0)
    lo, med, hi = quantile_ci(x)
    assert med == 50.5
    # z-based rank bounds for n=100, q=0.5: j=ceil(50-1.96*5)=41, k=ceil(50+1.96*5)=60
    assert lo == 41.0
    assert hi == 60.0


def test_summary_values():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    assert summary_value("AVE", x) == 2.5
    assert abs(summary_value("STD", x) - np.std(x, ddof=1)) < 1e-12
    assert summary_value("MIN", x) == 1.0
    assert summary_value("MAX", x) == 4.0


def test_simulate_mountaincar_end_to_end(capsys):
    metrics = simulate_mountaincar(
        num_trials=2,
        num_steps=200,
        policy_type="cemppi",
        num_samples=20,
        horizon=15,
        lam=0.1,
        cov_mat=[1.5],
        ais_its=5,
        seed=1,
        dtype=jnp.float64,
    )
    out = capsys.readouterr().out
    assert "MountainCar" in out
    assert "Trials AVE" in out
    assert metrics["rewards"].shape == (2,)
    # at least one trial should reach the goal (the +1e5 bonus)
    assert metrics["rewards"].max() > 90000.0


def test_simulate_car_racing_short(capsys):
    metrics = simulate_car_racing(
        num_trials=1,
        num_steps=15,
        policy_type="cemppi",
        num_samples=32,
        horizon=12,
        ais_its=3,
        seed=2,
        laps=2,
        dtype=jnp.float64,
    )
    out = capsys.readouterr().out
    assert "Num Cars:" in out
    assert metrics["steps"][0] == 15.0
    # the car should make forward progress without violations in 15 steps
    assert metrics["track_violations"][0] == 0
    assert metrics["mean_vs"][0] > 5.0


def test_simulate_multicar_short():
    metrics = simulate_car_racing(
        num_trials=1,
        num_steps=6,
        num_cars=2,
        policy_type="cmamppi",
        num_samples=24,
        horizon=8,
        ais_its=2,
        seed=3,
        dtype=jnp.float64,
        print_output=False,
    )
    assert metrics["steps"][0] == 6.0
    assert np.isfinite(metrics["rewards"][0])


def test_chunked_loop_matches_per_step():
    """steps_per_call>1 (lax.scan over control steps, one transfer per
    chunk) must reproduce the step-by-step loop exactly — including early
    termination falling mid-chunk (num_steps=15 with chunk=4 discards the
    chunk's overshoot)."""
    kwargs = dict(
        num_trials=2, num_steps=15, policy_type="cemppi", num_samples=32,
        horizon=12, ais_its=3, seed=2, laps=2, dtype=jnp.float64,
        print_output=False,
    )
    m1 = simulate_car_racing(steps_per_call=1, **kwargs)
    m4 = simulate_car_racing(steps_per_call=4, **kwargs)
    for key in ("rewards", "steps", "mean_vs", "max_vs", "beta_violations",
                "track_violations", "lap_times"):
        np.testing.assert_allclose(m4[key], m1[key], rtol=1e-12, err_msg=key)

    mc_kwargs = dict(
        num_trials=1, num_steps=60, policy_type="mppi", num_samples=16,
        horizon=10, lam=0.1, cov_mat=[1.5], seed=5, dtype=jnp.float64,
        print_output=False,
    )
    s1 = simulate_mountaincar(steps_per_call=1, **mc_kwargs)
    s7 = simulate_mountaincar(steps_per_call=7, **mc_kwargs)
    np.testing.assert_allclose(s7["rewards"], s1["rewards"], rtol=1e-12)
    np.testing.assert_array_equal(s7["steps"], s1["steps"])


def test_render_frame_and_gif(tmp_path):
    import jax

    from mpopis_tpu.harness import plotting
    from mpopis_tpu.models import CarRacingEnv

    env = CarRacingEnv(dtype=jnp.float64)
    s = env.reset()
    fig = plotting.render_frame(env, s)
    arr = plotting.figure_to_array(fig)
    plotting.close(fig)
    assert arr.ndim == 3 and arr.shape[2] == 3
    gif = tmp_path / "t.gif"
    plotting.save_gif([arr, arr], str(gif), fps=10)
    assert gif.exists() and gif.stat().st_size > 0


def test_simulate_mujoco_on_device_smoke():
    """The on-device MuJoCo harness path end-to-end (chunked)."""
    pytest.importorskip("mujoco")
    from mpopis_tpu.harness.simulate import simulate_mujoco_on_device

    metrics = simulate_mujoco_on_device(
        "InvertedPendulum-v4",
        num_trials=1,
        num_steps=20,
        policy_type="cemppi",
        num_samples=16,
        horizon=10,
        lam=0.1,
        ais_its=2,
        seed=4,
        print_output=False,
        dtype=jnp.float64,
    )
    # balanced pendulum: healthy-gated 1.0 per step
    assert metrics["rewards"][0] >= 19.0

    with pytest.raises(ValueError):
        # all 11 envpool tasks are on-device; unknown names still raise
        simulate_mujoco_on_device("NotATask-v0")
    with pytest.raises(ValueError):
        # solver_iters only applies to envs with a contact solver
        simulate_mujoco_on_device("Reacher-v4", solver_iters=(6, 40))


def test_on_device_traj_overlay_gif(tmp_path, monkeypatch):
    """plot_traj=True renders the logged K sampled rollouts per control
    step (weight-graded, plots.jl:96-126 analog) into a gif for an
    on-device MuJoCo task."""
    pytest.importorskip("mujoco")
    from mpopis_tpu.harness.simulate import simulate_mujoco_on_device

    monkeypatch.chdir(tmp_path)
    simulate_mujoco_on_device(
        "InvertedPendulum-v4",
        num_trials=1, num_steps=4, policy_type="cemppi", num_samples=8,
        horizon=5, lam=0.1, ais_its=2, seed=4, print_output=False,
        dtype=jnp.float64, plot_traj=True, save_gif=True,
        gif_name="overlay.gif",
    )
    gif = tmp_path / "overlay.gif"
    assert gif.exists() and gif.stat().st_size > 0


def test_on_device_acts_export_and_replay(tmp_path, monkeypatch):
    """The on-device driver's executed-action CSV replays in vanilla
    gymnasium to the same total reward — the reference's de-facto
    cross-implementation check (envpool_env.jl:184-197 +
    make_mujoco_gif.py), now closed for the on-device path."""
    pytest.importorskip("mujoco")
    pytest.importorskip("gymnasium")
    import glob
    import os
    import sys

    monkeypatch.chdir(tmp_path)
    from mpopis_tpu.harness.simulate import simulate_mujoco_on_device

    metrics = simulate_mujoco_on_device(
        "HalfCheetah-v4",
        num_trials=1,
        num_steps=10,
        num_samples=16,
        horizon=8,
        ais_its=2,
        lam=1.0,
        seed=3,
        print_output=False,
        dtype=jnp.float64,
        solver_iters=(6, 40),  # parity-grade so the replay matches tightly
        output_acts_file=True,
    )
    csvs = glob.glob(str(tmp_path / "acts" / "*.csv"))
    assert len(csvs) == 1
    acts = np.loadtxt(csvs[0], delimiter=",", ndmin=2)
    # the driver loop runs num_steps+1 policy steps (reference loop
    # bound semantics); every executed action is exported
    assert acts.shape == (11, 6)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from replay_mujoco import replay

    total = replay(csvs[0], "HalfCheetah-v4")
    np.testing.assert_allclose(total, metrics["rewards"][0], rtol=1e-6,
                               atol=1e-6)


def test_progress_meter_tty_only(monkeypatch, capsys):
    """The ProgressMeter analog (car_example.jl:190,238,305-311): renders
    an in-place bar only on a real TTY, erases it on finish, and stays
    byte-silent when piped (bench.py capture must remain clean)."""
    import io

    from mpopis_tpu.harness.simulate import _Progress

    # piped stdout (pytest capture): no output at all
    prog = _Progress(True, 1, 2, 10)
    prog.update(5)
    prog.finish()
    assert capsys.readouterr().out == ""

    # simulated TTY: bar rendered, then erased with \r + ANSI clear
    class Tty(io.StringIO):
        def isatty(self):
            return True

    fake = Tty()
    monkeypatch.setattr("sys.stdout", fake)
    prog = _Progress(True, 1, 2, 10)
    prog.update(5)
    prog.finish()
    out = fake.getvalue()
    assert "Trial 1/2" in out and "5/10 steps" in out
    assert out.endswith("\r\x1b[K")

    # disabled printing: silent even on a TTY
    fake2 = Tty()
    monkeypatch.setattr("sys.stdout", fake2)
    prog = _Progress(False, 1, 1, 10)
    prog.update(3)
    prog.finish()
    assert fake2.getvalue() == ""
