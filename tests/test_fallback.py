"""Fused-kernel compile-failure fallback (utils/fallback.py + the
make_policy / harness probes): a Mosaic compile regression must degrade
to the generic vmap rollout with a warning, not crash the task
(VERDICT r3 item 2)."""

import warnings

import numpy as np
import pytest

import jax.numpy as jnp

from mpopis_tpu.models import CarRacingEnv
from mpopis_tpu.policies import PolicyConfig, make_policy
from mpopis_tpu.utils.fallback import is_kernel_compile_error


def test_is_kernel_compile_error_matches_known_shapes():
    assert is_kernel_compile_error(
        RuntimeError(
            "INTERNAL: Mosaic failed to compile TPU kernel: Invalid "
            "relayout: ..."
        )
    )
    assert is_kernel_compile_error(
        RuntimeError(
            "INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit code 1"
        )
    )
    assert is_kernel_compile_error(
        RuntimeError(
            "RESOURCE_EXHAUSTED: Ran out of memory in memory space vmem "
            "while allocating ..."
        )
    )
    assert not is_kernel_compile_error(ValueError("bad horizon"))
    # chained cause
    try:
        try:
            raise RuntimeError("Mosaic failed to compile TPU kernel")
        except RuntimeError as inner:
            raise ValueError("wrapped") from inner
    except ValueError as outer:
        assert is_kernel_compile_error(outer)


def _broken_fused(self, state, controls):
    raise RuntimeError(
        "INTERNAL: Mosaic failed to compile TPU kernel: Invalid relayout "
        "(synthetic test failure)"
    )


def test_make_policy_falls_back_to_vmap(monkeypatch):
    """A policy whose fused kernel dies at compile produces the SAME
    result as a policy built with use_fused_rollout=False."""
    env = CarRacingEnv(dtype=jnp.float32, fused_interpret=True)
    assert env.supports_fused_rollout
    monkeypatch.setattr(
        type(env), "fused_rollout_costs_tak", _broken_fused
    )
    monkeypatch.setattr(type(env), "fused_rollout_costs", _broken_fused)
    cfg = PolicyConfig(
        kind="cemppi", num_samples=16, horizon=5, lam=10.0, opt_its=2,
        sigma_est="mle",
    )
    pol = make_policy(env, cfg, cov_mat=np.diag([0.0625, 0.1]))
    s, ps = env.reset(), pol.init_state(3)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        action, ps2, info = pol.step(s, ps)
    assert any("falling back" in str(w.message) for w in rec)

    cfg_off = PolicyConfig(
        kind="cemppi", num_samples=16, horizon=5, lam=10.0, opt_its=2,
        sigma_est="mle", use_fused_rollout=False,
    )
    pol_ref = make_policy(env, cfg_off, cov_mat=np.diag([0.0625, 0.1]))
    a_ref, _, _ = pol_ref.step(s, pol_ref.init_state(3))
    np.testing.assert_allclose(
        np.asarray(action), np.asarray(a_ref), rtol=1e-6, atol=1e-7
    )
    # second call must not re-probe (stays on the rebuilt step)
    a2, _, _ = pol.step(s, ps)
    assert np.isfinite(np.asarray(a2)).all()


def test_make_policy_propagates_non_kernel_errors(monkeypatch):
    """User errors must NOT be silently converted into a fallback."""

    def broken(self, state, controls):
        raise ValueError("bad shapes from the user")

    env = CarRacingEnv(dtype=jnp.float32, fused_interpret=True)
    monkeypatch.setattr(type(env), "fused_rollout_costs_tak", broken)
    monkeypatch.setattr(type(env), "fused_rollout_costs", broken)
    cfg = PolicyConfig(
        kind="cemppi", num_samples=16, horizon=5, lam=10.0, opt_its=2,
        sigma_est="mle",
    )
    pol = make_policy(env, cfg, cov_mat=np.diag([0.0625, 0.1]))
    with pytest.raises(ValueError, match="bad shapes"):
        pol.step(env.reset(), pol.init_state(3))


def test_jit_with_fused_fallback_bench_path(monkeypatch):
    """The jit=False callers' helper (bench.py, __graft_entry__): a
    broken kernel yields a WORKING vmap-backed step labeled via
    fell_back(), with identical numerics (VERDICT r4 item 5)."""
    import dataclasses

    from mpopis_tpu.utils.fallback import jit_with_fused_fallback

    env = CarRacingEnv(dtype=jnp.float32, fused_interpret=True)
    assert env.supports_fused_rollout
    monkeypatch.setattr(type(env), "fused_rollout_costs_tak", _broken_fused)
    monkeypatch.setattr(type(env), "fused_rollout_costs", _broken_fused)
    cfg = PolicyConfig(
        kind="cemppi", num_samples=16, horizon=5, lam=10.0, opt_its=2,
        sigma_est="mle",
    )

    def build(use_fused: bool):
        cfg_ = dataclasses.replace(cfg, use_fused_rollout=use_fused)
        pol = make_policy(env, cfg_, cov_mat=np.diag([0.0625, 0.1]),
                          jit=False)

        def mpc_step(env_state, pol_state):
            action, pol_state, _ = pol.step(env_state, pol_state)
            return env.step(env_state, action), pol_state

        return mpc_step

    step = jit_with_fused_fallback(build, label="test")
    assert not step.fell_back()
    pol_meta = make_policy(
        env,
        dataclasses.replace(cfg, use_fused_rollout=False),
        cov_mat=np.diag([0.0625, 0.1]),
        jit=False,
    )
    s, ps = env.reset(), pol_meta.init_state(3)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        s2, ps2 = step(s, ps)
    assert step.fell_back()
    assert any("falling back" in str(w.message) for w in rec)

    import jax

    s_ref, ps_ref = jax.jit(build(False))(s, ps)
    np.testing.assert_allclose(
        np.asarray(s2.x), np.asarray(s_ref.x), rtol=1e-6, atol=1e-7
    )
    # second call stays on the rebuilt step (no re-probe)
    s3, _ = step(s, ps)
    assert np.isfinite(np.asarray(s3.x)).all()


def test_jit_with_fused_fallback_propagates_user_errors():
    """Non-kernel errors must propagate, not trigger a rebuild."""
    from mpopis_tpu.utils.fallback import jit_with_fused_fallback

    def build(use_fused: bool):
        def f(x):
            raise ValueError("user error in trace")
        return f

    step = jit_with_fused_fallback(build)
    with pytest.raises(ValueError, match="user error"):
        step(jnp.ones(3))
    assert not step.fell_back()


def test_harness_probe_falls_back(monkeypatch):
    """simulate_* (outer-jit path, jit inside the harness) degrades too."""
    from mpopis_tpu.harness import simulate

    env = CarRacingEnv(dtype=jnp.float32, fused_interpret=True)
    monkeypatch.setattr(
        type(env), "fused_rollout_costs_tak", _broken_fused
    )
    monkeypatch.setattr(type(env), "fused_rollout_costs", _broken_fused)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        metrics = simulate._simulate_simple(
            env, "CarRacing-fallback-test", num_trials=1, num_steps=3,
            policy_type="cemppi", num_samples=16, horizon=5, lam=10.0,
            u0=(0.0, 0.0), cov_mat=(0.0625, 0.1), ais_its=2,
            ce_sigma_est="mle", seed=11, print_output=False,
        )
    assert any("falling back" in str(w.message) for w in rec)
    assert np.isfinite(metrics["rewards"]).all()
