"""Benchmark: car-racing control throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.json): control steps/s per chip at 8192 samples on
the car-racing task (CEMPPI, horizon 50, ais_its 10 — the reference's
default config at examples/car_example.jl:51-68, scaled to 8192 samples).
vs_baseline divides by the only wall-clock the reference publishes:
~2.56 control steps/s (HalfCheetah CEMPPI trial, README.md:90-95; the
reference has no faster published config at any sample count).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_STEPS_PER_S = 50.0 / 19.54  # reference README.md:90-95


def _slope(run, n_short: int, n_long: int, reps: int = 3,
           retries: int = 2) -> float:
    """Per-step slope between two chained-run lengths, guarded against
    relay jitter making t_long <= t_short (which would report a negative
    or infinite rate): re-measure up to `retries` times, then clamp to a
    small positive epsilon."""
    for _ in range(retries + 1):
        t_short = min(run(n_short) for _ in range(reps))
        t_long = min(run(n_long) for _ in range(reps))
        per_step = (t_long - t_short) / (n_long - n_short)
        if per_step > 0.0:
            return per_step
    return max(per_step, 1e-9)


def bench_car_racing(num_samples: int, horizon: int = 50, ais_its: int = 10,
                     n_short: int = 10, n_long: int = 60, warmup: int = 3) -> float:
    """Per-step time from the slope between two chained-run lengths.

    Each MPC step feeds the next (no pipelining of independent work), and
    every run ends in a forced device->host transfer. Taking the slope
    (t_long - t_short)/(n_long - n_short) cancels the fixed dispatch +
    transfer round-trip of the TPU relay, which is measurement-environment
    latency, not program cost (it does not exist on directly-attached
    TPUs); the transfer forces real completion, which a bare
    block_until_ready does not reliably do through the relay.
    """
    import jax
    import jax.numpy as jnp

    from mpopis_tpu.models import CarRacingEnv
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = CarRacingEnv(dtype=jnp.float32)
    cfg = PolicyConfig(
        kind="cemppi",
        num_samples=num_samples,
        horizon=horizon,
        lam=10.0,
        alpha=1.0,
        opt_its=ais_its,
        ce_elite_threshold=0.8,
        sigma_est="ss",
    )
    pol = make_policy(env, cfg, cov_mat=np.diag([0.0625, 0.1]), jit=False)

    @jax.jit
    def mpc_step(env_state, pol_state):
        action, pol_state, _ = pol.step(env_state, pol_state)
        return env.step(env_state, action), pol_state

    s, ps = env.reset(), pol.init_state(1)
    for _ in range(warmup):
        s, ps = mpc_step(s, ps)
    np.asarray(s.x)

    def run(n: int) -> float:
        s, ps = env.reset(), pol.init_state(1)
        t0 = time.perf_counter()
        for _ in range(n):
            s, ps = mpc_step(s, ps)
        x_host = np.asarray(s.x)
        dt = time.perf_counter() - t0
        assert bool(np.isfinite(x_host).all())
        return dt

    return 1.0 / _slope(run, n_short, n_long)


def bench_reacher_on_device(num_samples: int = 8192, horizon: int = 15,
                            n_short: int = 10, n_long: int = 60) -> float:
    """On-device MuJoCo env-steps/s (CEMPPI policy step incl. 3 AIS its)."""
    import jax
    import jax.numpy as jnp

    from mpopis_tpu.models import ReacherDeviceEnv
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = ReacherDeviceEnv(dtype=jnp.float32)
    cfg = PolicyConfig(kind="cemppi", num_samples=num_samples, horizon=horizon,
                       lam=0.05, opt_its=3, sigma_est="mle")
    pol = make_policy(env, cfg, cov_mat=[0.02, 0.02], jit=False)

    @jax.jit
    def mpc_step(env_state, pol_state):
        action, pol_state, _ = pol.step(env_state, pol_state)
        return env.step(env_state, action), pol_state

    def run(n: int) -> float:
        s, ps = env.reset(), pol.init_state(1)
        t0 = time.perf_counter()
        for _ in range(n):
            s, ps = mpc_step(s, ps)
        np.asarray(s.x)
        return time.perf_counter() - t0

    run(3)
    per_step = _slope(run, n_short, n_long, reps=2)
    return num_samples * horizon * 3 / per_step  # env-steps/s


def bench_cheetah_on_device(num_samples: int = 2048, horizon: int = 15,
                            n_short: int = 3, n_long: int = 13) -> float:
    """On-device HalfCheetah env-steps/s through the fused planar-contact
    Pallas rollout kernel (contact QP per substep inside the kernel;
    control-grade warm-start solver defaults)."""
    import jax
    import jax.numpy as jnp

    from mpopis_tpu.models import CheetahDeviceEnv

    env = CheetahDeviceEnv(dtype=jnp.float32)
    if not env.supports_fused_rollout:
        raise RuntimeError("fused rollout unsupported on this backend")
    rng = np.random.default_rng(0)
    ctrl0 = jnp.asarray(
        rng.uniform(-1.0, 1.0, (horizon, env.action_dim, num_samples)),
        dtype=jnp.float32,
    )
    s0 = env.reset()

    @jax.jit
    def chain(c):
        costs = env.fused_rollout_costs_tak(s0, c)
        return c + costs[None, None, :] * 1e-12  # serialize the chain

    def run(n: int) -> float:
        c = ctrl0
        t0 = time.perf_counter()
        for _ in range(n):
            c = chain(c)
        np.asarray(c)
        return time.perf_counter() - t0

    run(1)
    per_call = _slope(run, n_short, n_long)
    return num_samples * horizon / per_call


# Public TPU v5e (lite) per-chip peaks: 197 bf16 TFLOP/s on the MXUs
# (f32 ≈ half), and ~3.9 TFLOP/s of f32 VPU vector throughput
# (8x128 lanes x 4 ALUs x ~0.94 GHz). The rollout kernels are
# elementwise/VPU-bound (no matmuls), so the VPU line is the honest
# roofline; the MXU percentage is reported for context.
_VPU_PEAK_F32 = 3.9e12
_MXU_PEAK_F32 = 98.0e12


def bench_roofline(num_samples: int = 8192, horizon: int = 50,
                   n_short: int = 5, n_long: int = 25) -> dict:
    """Per-kernel FLOP estimate + achieved utilization for the fused car
    rollout (the flagship kernel). The FLOP count comes from XLA's cost
    analysis of the mathematically-identical vmap path (the kernel does
    strictly no more arithmetic); the time is the slope-measured fused
    kernel call. This gives round-3 perf work a denominator."""
    import jax
    import jax.numpy as jnp

    from mpopis_tpu.models import CarRacingEnv
    from mpopis_tpu.models.rollout import rollout_batch

    env = CarRacingEnv(dtype=jnp.float32)
    s0 = env.reset()
    rng = np.random.default_rng(0)
    ctrl_tak = jnp.asarray(
        rng.uniform(-1.0, 1.0, (horizon, 2, num_samples)), dtype=jnp.float32
    )

    def vmap_costs(c):
        costs, _ = rollout_batch(env, s0, jnp.transpose(c, (2, 0, 1)), False)
        return costs

    # FLOPs scale exactly linearly in K on the vmap path: count a small-K
    # compile on the CPU backend (cheap) and scale up. XLA's cost analysis
    # counts a scan/while BODY once regardless of trip count, so compare a
    # 2-step and a 1-step horizon to find the per-step body cost and the
    # outside-the-loop overhead, then scale by the real horizon.
    k_small = 256

    def _count(h):
        with jax.default_device(jax.devices("cpu")[0]):
            small = jnp.asarray(
                np.asarray(ctrl_tak[:h, :, :k_small]), dtype=jnp.float32
            )
            a = jax.jit(vmap_costs).lower(small).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        return float(a["flops"])

    f1, f2 = _count(1), _count(2)
    if f2 > 1.5 * f1:  # trip count IS included: scale from the 2-step count
        flops = (f1 + (f2 - f1) * (horizon - 1)) * (num_samples / k_small)
    else:  # body counted once: the count ~equals one step's flops
        flops = f2 * horizon * (num_samples / k_small)

    @jax.jit
    def chain(c):
        costs = env.fused_rollout_costs_tak(s0, c)
        return c + costs[None, None, :] * 1e-12

    def run(n: int) -> float:
        c = ctrl_tak
        t0 = time.perf_counter()
        for _ in range(n):
            c = chain(c)
        np.asarray(c)
        return time.perf_counter() - t0

    run(2)
    per_call = _slope(run, n_short, n_long)
    gflops = flops / per_call / 1e9
    return {
        "kernel": "car_rollout_fused",
        "flops_per_call": int(flops),
        "ms_per_call": round(per_call * 1e3, 3),
        "achieved_gflop_s": round(gflops, 1),
        "vpu_roofline_pct": round(100.0 * gflops * 1e9 / _VPU_PEAK_F32, 1),
        "mxu_roofline_pct": round(100.0 * gflops * 1e9 / _MXU_PEAK_F32, 2),
    }


def main() -> None:
    sps_8192 = bench_car_racing(8192)
    sps_150 = bench_car_racing(150)
    details = {
        "K150_H50_steps_per_s": round(sps_150, 3),
        "baseline_steps_per_s": round(BASELINE_STEPS_PER_S, 3),
        "config": "cemppi, H=50, ais_its=10, ss-shrinkage, bicycle car racing",
    }
    try:
        details["reacher_on_device_env_steps_per_s"] = round(
            bench_reacher_on_device(), 0
        )
    except Exception as exc:  # mujoco-free images: skip the extra detail
        details["reacher_on_device_env_steps_per_s"] = f"skipped: {exc}"
    try:
        details["cheetah_on_device_env_steps_per_s"] = round(
            bench_cheetah_on_device(), 0
        )
    except Exception as exc:
        details["cheetah_on_device_env_steps_per_s"] = f"skipped: {exc}"
    try:
        details["roofline"] = bench_roofline()
    except Exception as exc:
        details["roofline"] = f"skipped: {exc}"
    try:
        # end-to-end harness wall-clock (chunked MPC, telemetry + lap/
        # violation bookkeeping included); trial 2 excludes compiles
        from mpopis_tpu.harness import simulate_car_racing

        metrics = simulate_car_racing(
            num_trials=2, num_steps=100, seed=7, laps=1, print_output=False
        )
        details["harness_steps_per_s_K150"] = round(
            float(metrics["control_steps_per_s"][1]), 1
        )
    except Exception as exc:
        details["harness_steps_per_s_K150"] = f"skipped: {exc}"
    print(
        json.dumps(
            {
                "metric": "car_racing_control_steps_per_s_K8192_H50",
                "value": round(sps_8192, 3),
                "unit": "control_steps/s",
                "vs_baseline": round(sps_8192 / BASELINE_STEPS_PER_S, 2),
                "details": details,
            }
        )
    )


if __name__ == "__main__":
    main()
