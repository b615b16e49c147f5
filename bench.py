"""Benchmark: control throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.json): control steps/s per chip at 8192 samples on
the car-racing task (CEMPPI, horizon 50, ais_its 10 — the reference's
default config at examples/car_example.jl:51-68, scaled to 8192 samples).
vs_baseline divides by the only wall-clock the reference publishes:
~2.56 control steps/s (HalfCheetah CEMPPI trial, README.md:90-95; the
reference has no faster published config at any sample count).
`cheetah_e2e_vs_baseline` is the SAME-task ratio (our HalfCheetah
end-to-end rate over that 2.56), surfaced top-level (VERDICT r4 item 7).

The details block captures EVERY headline number README.md/BENCH.md claim
(per-task kernel env-steps/s, end-to-end control rates for the contact
tasks, the roofline block) plus measurement spread and per-task compile
time, so the per-round artifact is self-contained evidence.

Trust rules (round 3): a slope measurement that stays non-positive after
retries reports NaN -> the affected entry is marked unmeasurable rather
than fabricating a rate; the roofline block cross-checks implied
utilization against the physical VPU peak and flags itself "unreliable"
instead of shipping an impossible number (BENCH_r02.json shipped 2830%).

Delivery rules (round 5 — BENCH_r03 shipped parsed:null, BENCH_r04
shipped rc=124 with NO output; two rounds of perf work went
driver-unverified, VERDICT r4 item 1):
- the headline runs FIRST; the JSON line is emitted from a try/finally
  AND from a SIGTERM/SIGINT handler, so a killed or crashed run still
  ships whatever was measured (entries not reached read "skipped:");
- every entry runs under a signal.alarm timeout (MPOPIS_BENCH_ENTRY_S,
  default 240 s; the headline gets MPOPIS_BENCH_HEADLINE_S, 900 s);
- a wall-clock budget (MPOPIS_BENCH_BUDGET_S, default 1500 s) skips
  remaining entries rather than risking the driver's kill;
- entries are ordered by evidence value: headline, then the three
  spatial tasks that have never had a driver-verified number
  (pusher/humanoid/standup), then cheetah e2e (the same-task baseline
  ratio), then everything else.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import signal
import sys
import time

import numpy as np

BASELINE_STEPS_PER_S = 50.0 / 19.54  # reference README.md:90-95

COMPILE_TIMES: dict[str, float] = {}  # per-bench first-call (compile) wall

# --- delivery machinery (emit-on-partial; see module docstring) -----------

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("MPOPIS_BENCH_BUDGET_S", "1500"))
ENTRY_TIMEOUT_S = float(os.environ.get("MPOPIS_BENCH_ENTRY_S", "240"))
HEADLINE_TIMEOUT_S = float(os.environ.get("MPOPIS_BENCH_HEADLINE_S", "900"))

RESULT: dict = {
    "metric": "car_racing_control_steps_per_s_K8192_H50",
    "value": None,
    "unit": "control_steps/s",
    "vs_baseline": None,
    "cheetah_e2e_vs_baseline": None,
    "details": {},
}
_EMITTED = False
_EMIT_LOCK = None  # created lazily (threading import below)


class EntryTimeout(Exception):
    pass


def _emit(note: str | None = None) -> None:
    """Print the result JSON exactly once. Safe to call from a signal
    handler or the watchdog thread mid-entry: RESULT/details are mutated
    in place as entries finish, so a partial run emits everything
    measured so far."""
    global _EMITTED
    import threading

    global _EMIT_LOCK
    if _EMIT_LOCK is None:
        _EMIT_LOCK = threading.Lock()
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    if note:
        RESULT["details"]["partial"] = note
    RESULT["details"]["elapsed_s"] = round(time.monotonic() - T_START, 1)
    RESULT["details"]["compile_s"] = COMPILE_TIMES
    try:
        line = json.dumps(RESULT)
        json.loads(line)  # self-check: must round-trip
        assert "\n" not in line
    except Exception:
        try:  # concurrent mutation: retry on a shallow copy
            snap = dict(RESULT)
            snap["details"] = dict(RESULT["details"])
            line = json.dumps(snap)
        except Exception:  # a detail value resisted serialization
            minimal = {k: RESULT.get(k) for k in
                       ("metric", "value", "unit", "vs_baseline")}
            minimal["details"] = {"error": "details failed json self-check"}
            line = json.dumps(minimal)
    sys.stderr.flush()
    # leading newline: the line must be parseable even if prior stdout
    # output was cut mid-line by the signal
    sys.stdout.write("\n" + line + "\n")
    sys.stdout.flush()


def _on_term(signum, frame):  # driver timeout sends SIGTERM (rc=124)
    _emit(note=f"killed by signal {signum}")
    os._exit(98)


def _on_alarm(signum, frame):
    raise EntryTimeout()


def _start_watchdog() -> None:
    """Backstop for the backstop: SIGTERM/SIGALRM handlers only run when
    the MAIN thread regains control, which a multi-minute blocking C call
    (remote-relay compile RPC) can defer past the driver's kill grace.
    A daemon thread needs no signal delivery: past budget+120s it emits
    whatever was measured and exits the process itself."""
    import threading

    def watch():
        deadline = T_START + BUDGET_S + 120.0
        while not _EMITTED:
            time.sleep(5.0)
            if not _EMITTED and time.monotonic() > deadline:
                _emit(note="watchdog: budget+120s exceeded "
                           "(main thread blocked in a C call)")
                os._exit(97)

    threading.Thread(target=watch, daemon=True, name="bench-watchdog").start()


def _slope(run, n_short: int, n_long: int, reps: int = 3,
           retries: int = 2) -> float:
    """Per-step slope between two chained-run lengths, guarded against
    relay jitter making t_long <= t_short (which would report a negative
    or infinite rate): re-measure up to `retries` times, then return NaN —
    the caller marks the entry unmeasurable instead of publishing a rate
    fabricated from jitter."""
    per_step = float("nan")
    for _ in range(retries + 1):
        t_short = min(run(n_short) for _ in range(reps))
        t_long = min(run(n_long) for _ in range(reps))
        per_step = (t_long - t_short) / (n_long - n_short)
        if per_step > 0.0:
            return per_step
    return float("nan")


def _slope_spread(run, n_short: int, n_long: int, reps: int = 2,
                  samples: int = 3):
    """Repeat the slope measurement `samples` times: (median, spread%).

    The spread (max-min)/median distinguishes relay noise from real
    regressions between rounds (VERDICT r2: a 7% drop was unattributable
    because no repeat-run variance was recorded)."""
    vals = [_slope(run, n_short, n_long, reps) for _ in range(samples)]
    vals = [v for v in vals if math.isfinite(v)]
    if not vals:
        return float("nan"), float("nan")
    med = float(np.median(vals))
    return med, 100.0 * (max(vals) - min(vals)) / med


def _timed_first(tag: str, fn):
    """Run fn() once, recording wall time as this bench's compile time."""
    t0 = time.perf_counter()
    out = fn()
    COMPILE_TIMES[tag] = round(time.perf_counter() - t0, 2)
    return out


def _mpc_steps_per_s(env, cfg, cov_mat, tag: str, n_short: int = 10,
                     n_long: int = 60, spread: bool = False):
    """End-to-end control steps/s of a jitted policy+env MPC step.

    Each MPC step feeds the next (no pipelining of independent work), and
    every run ends in a forced device->host transfer. Taking the slope
    (t_long - t_short)/(n_long - n_short) cancels the fixed dispatch +
    transfer round-trip of the TPU relay, which is measurement-environment
    latency, not program cost (it does not exist on directly-attached
    TPUs); the transfer forces real completion, which a bare
    block_until_ready does not reliably do through the relay.
    """
    from mpopis_tpu.policies import make_policy
    from mpopis_tpu.utils.fallback import jit_with_fused_fallback

    pols = {}

    def build(use_fused: bool):
        cfg_ = dataclasses.replace(
            cfg, use_fused_rollout=use_fused and cfg.use_fused_rollout
        )
        pol = pols.setdefault(
            use_fused, make_policy(env, cfg_, cov_mat=cov_mat, jit=False)
        )

        def mpc_step(env_state, pol_state):
            action, pol_state, _ = pol.step(env_state, pol_state)
            return env.step(env_state, action), pol_state

        return mpc_step

    mpc_step = jit_with_fused_fallback(build, label=tag)

    def fresh():
        return env.reset(), next(iter(pols.values())).init_state(1)

    def run(n: int) -> float:
        s, ps = fresh()
        t0 = time.perf_counter()
        for _ in range(n):
            s, ps = mpc_step(s, ps)
        x_host = np.asarray(s.x)
        dt = time.perf_counter() - t0
        assert bool(np.isfinite(x_host).all())
        return dt

    _timed_first(tag, lambda: run(1))
    run(2)  # settle
    if spread:
        med, spr = _slope_spread(run, n_short, n_long)
        return 1.0 / med, spr, mpc_step.fell_back()
    return 1.0 / _slope(run, n_short, n_long), mpc_step.fell_back()


def bench_car_racing(num_samples: int, horizon: int = 50, ais_its: int = 10,
                     kind: str = "cemppi", spread: bool = False):
    import jax.numpy as jnp

    from mpopis_tpu.models import CarRacingEnv
    from mpopis_tpu.policies import PolicyConfig

    env = CarRacingEnv(dtype=jnp.float32)
    cfg = PolicyConfig(
        kind=kind,
        num_samples=num_samples,
        horizon=horizon,
        lam=10.0,
        alpha=1.0,
        opt_its=ais_its,
        ce_elite_threshold=0.8,
        sigma_est="ss",
    )
    return _mpc_steps_per_s(
        env, cfg, np.diag([0.0625, 0.1]), f"car_{kind}_K{num_samples}",
        spread=spread,
    )


def bench_ais_iter_ms(kind: str = "cemppi", num_samples: int = 8192):
    """ms per AIS iteration by opt_its scaling (its=10 vs its=40 MPC
    chains in one process — cancels dispatch AND the per-step fixed
    work). This is the round-3 evidence line: the iteration cost is
    dominated by the roofline-bound rollout (compare the roofline
    block's ms_per_call), so the distribution update is no longer the
    lever at this shape (BENCH.md round-3 section)."""
    import jax
    import jax.numpy as jnp

    from mpopis_tpu.models import CarRacingEnv
    from mpopis_tpu.policies import PolicyConfig, make_policy

    env = CarRacingEnv(dtype=jnp.float32)

    def build(its):
        cfg = PolicyConfig(
            kind=kind, num_samples=num_samples, horizon=50, lam=10.0,
            alpha=1.0, opt_its=its, ce_elite_threshold=0.8, sigma_est="ss",
            # early stop now SKIPS converged iterations (driver lax.cond),
            # which would zero the its=40-vs-10 slope for policies that
            # converge (CMA measured 0.0 ms/it) — disable it here so the
            # slope keeps measuring the true per-iteration cost.
            elite_stop_tol=0.0,
        )
        pol = make_policy(env, cfg, cov_mat=np.diag([0.0625, 0.1]), jit=False)

        @jax.jit
        def step(s, ps):
            a, ps, _ = pol.step(s, ps)
            return env.step(s, a), ps

        def chain(n):
            s, ps = env.reset(), pol.init_state(1)
            t0 = time.perf_counter()
            for _ in range(n):
                s, ps = step(s, ps)
            np.asarray(s.x)
            return time.perf_counter() - t0

        return chain

    c10, c40 = build(10), build(40)
    _timed_first(f"ais_iter_{kind}", lambda: (c10(1), c40(1)))
    c10(2)
    t10 = min(c10(20) for _ in range(3)) / 20
    t40 = min(c40(20) for _ in range(3)) / 20
    return 1e3 * (t40 - t10) / 30.0


def bench_reacher_on_device(num_samples: int = 8192, horizon: int = 15):
    """On-device MuJoCo env-steps/s (CEMPPI policy step incl. 3 AIS its)."""
    import jax.numpy as jnp

    from mpopis_tpu.models import ReacherDeviceEnv
    from mpopis_tpu.policies import PolicyConfig

    env = ReacherDeviceEnv(dtype=jnp.float32)
    cfg = PolicyConfig(kind="cemppi", num_samples=num_samples, horizon=horizon,
                       lam=0.05, opt_its=3, sigma_est="mle")
    sps, fb = _mpc_steps_per_s(env, cfg, [0.02, 0.02], "reacher_e2e")
    # env-steps/s = control steps/s x K x H x AIS its
    return _fmt_rate(sps, fb, scale=num_samples * horizon * 3, nd=0)


# Headline fused-kernel shapes (BENCH.md round-2/3 tables). The 3D
# tasks (ant, pusher, humanoid) run the round-3 SPATIAL kernel
# (kernels/spatial_step.py — 3D-cone + self-collision QP and the
# per-model reward family in-kernel); smaller fan-out than the planar
# tasks keeps the relay Mosaic compile bounded.
_KERNEL_TASKS = {
    "cheetah": ("CheetahDeviceEnv", 2048, 15, (3, 13)),
    "hopper": ("HopperDeviceEnv", 2048, 15, (3, 13)),
    "walker2d": ("Walker2dDeviceEnv", 2048, 15, (3, 13)),
    "swimmer": ("SwimmerDeviceEnv", 4096, 25, (3, 13)),
    "ant": ("AntDeviceEnv", 1024, 10, (3, 13)),
    "pusher": ("PusherDeviceEnv", 1024, 10, (3, 13)),
    # K=1024 fills the round-5 block_k=1024 tiles ((8,128) vregs); the
    # r1-r4 512-sample configs ran the kernels at half/eighth sublane
    # utilization
    "humanoid": ("HumanoidDeviceEnv", 1024, 8, (3, 13)),
    "standup": ("HumanoidStandupDeviceEnv", 1024, 8, (3, 13)),
}
# End-to-end contact configs: (env, K, H, opt_its, lam, cov). All route
# through their fused kernels on TPU (supports_fused_rollout), with the
# vmap fallback if a kernel fails to compile (utils/fallback.py).
_E2E_TASKS = {
    "cheetah": ("CheetahDeviceEnv", 2048, 15, 3, 0.1, 0.25),
    "swimmer": ("SwimmerDeviceEnv", 4096, 25, 3, 0.1, 0.25),
    "ant": ("AntDeviceEnv", 1024, 10, 2, 1.0, 0.25),
    "pusher": ("PusherDeviceEnv", 1024, 10, 2, 0.1, 0.25),
    "humanoid": ("HumanoidDeviceEnv", 1024, 8, 2, 1.0, 0.25),
    "standup": ("HumanoidStandupDeviceEnv", 1024, 8, 2, 0.3, 0.25),
}


def bench_device_rate(env, cfg, cov, tag: str, n: int = 30):
    """DEVICE-RATE control steps/s: n MPC steps inside ONE jitted
    lax.scan, so the number contains zero per-step host/relay dispatch.
    This is the program's true per-step cost (what a directly-attached
    deployment gets); the slope-based `_mpc_steps_per_s` entries remain
    the round-over-round-comparable host-loop numbers."""
    import jax

    from mpopis_tpu.policies import make_policy
    from mpopis_tpu.utils.fallback import jit_with_fused_fallback

    pols = {}

    def build(use_fused: bool):
        cfg_ = dataclasses.replace(
            cfg, use_fused_rollout=use_fused and cfg.use_fused_rollout
        )
        pol = pols.setdefault(
            use_fused, make_policy(env, cfg_, cov_mat=cov, jit=False)
        )

        def run(s, ps):
            def body(c, _):
                s, ps = c
                a, ps2, _ = pol.step(s, ps)
                return (env.step(s, a), ps2), None
            (s, ps), _ = jax.lax.scan(body, (s, ps), None, length=n)
            return s.x

        return run

    run = jit_with_fused_fallback(build, label=tag)
    s, ps = env.reset(), next(iter(pols.values())).init_state(1)
    x = _timed_first(tag, lambda: np.asarray(run(s, ps)))
    assert bool(np.isfinite(x).all())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(s, ps))
        ts.append(time.perf_counter() - t0)
    return _fmt_rate(n / min(ts), run.fell_back())


def bench_kernel_env_steps(task: str):
    """Raw fused-rollout kernel env-steps/s for one contact task (the
    rollout alone, serialized through a data dependency). If the kernel
    fails to COMPILE, the vmap rollout rate ships instead, labeled — a
    Mosaic regression must show up as a (slower) rate, not missing data."""
    import importlib

    import jax.numpy as jnp

    from mpopis_tpu.models.rollout import rollout_batch
    from mpopis_tpu.utils.fallback import jit_with_fused_fallback

    cls_name, num_samples, horizon, (n_short, n_long) = _KERNEL_TASKS[task]
    models = importlib.import_module("mpopis_tpu.models")
    env = getattr(models, cls_name)(dtype=jnp.float32)
    if not env.supports_fused_rollout:
        raise RuntimeError("fused rollout unsupported on this backend")
    rng = np.random.default_rng(0)
    ctrl0 = jnp.asarray(
        rng.uniform(-1.0, 1.0, (horizon, env.action_dim, num_samples)),
        dtype=jnp.float32,
    )
    s0 = env.reset()

    def build(use_fused: bool):
        if use_fused:
            def chain(c):
                costs = env.fused_rollout_costs_tak(s0, c)
                return c + costs[None, None, :] * 1e-12  # serialize
        else:
            def chain(c):
                costs, _ = rollout_batch(
                    env, s0, jnp.transpose(c, (2, 0, 1)), False
                )
                return c + costs[None, None, :] * 1e-12
        return chain

    chain = jit_with_fused_fallback(build, label=f"{task}_kernel")

    def run(n: int) -> float:
        c = ctrl0
        t0 = time.perf_counter()
        for _ in range(n):
            c = chain(c)
        np.asarray(c)
        return time.perf_counter() - t0

    _timed_first(f"{task}_kernel", lambda: run(1))
    per_call = _slope(run, n_short, n_long)
    return _fmt_rate(
        num_samples * horizon / per_call, chain.fell_back(), nd=0
    )


def bench_contact_e2e(task: str):
    """End-to-end control steps/s (CEMPPI MPC step, fused rollout +
    distribution update + env step) for a contact task — the number a
    user of simulate_mujoco_on_device actually gets, the same quantity as
    the reference's only published wall-clock (README.md:90-95)."""
    import importlib

    import jax.numpy as jnp

    from mpopis_tpu.policies import PolicyConfig

    cls_name, num_samples, horizon, opt_its, lam, cov = _E2E_TASKS[task]
    models = importlib.import_module("mpopis_tpu.models")
    env = getattr(models, cls_name)(dtype=jnp.float32)
    cfg = PolicyConfig(kind="cemppi", num_samples=num_samples,
                       horizon=horizon, lam=lam, opt_its=opt_its,
                       sigma_est="mle")
    rate, fb = _mpc_steps_per_s(
        env, cfg, [cov] * env.action_dim, f"{task}_e2e", n_short=5, n_long=30
    )
    return _fmt_rate(rate, fb)


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
    kernel call. This gives perf work a denominator.

    Sanity gate: utilization above 100% of the VPU peak is physically
    impossible for this op mix, so ms_per_call has a hard floor of
    flops/VPU_peak. A measurement below the floor is re-measured with
    longer chains; if it persists, the block ships with "unreliable": true
    (relay jitter produced a fake slope) rather than as fact.
    """
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

    _timed_first("car_kernel", lambda: run(1))
    run(2)
    floor_s = flops / _VPU_PEAK_F32  # physically fastest possible call
    per_call = _slope(run, n_short, n_long)
    unreliable = not math.isfinite(per_call) or per_call < floor_s
    if unreliable:  # one escalation: longer chains average out jitter
        per_call = _slope(run, 4 * n_short, 4 * n_long)
        unreliable = not math.isfinite(per_call) or per_call < floor_s

    # Cross-check methodology (VERDICT r3 weak-1: three measurements of
    # the same kernel disagreed 3.4x): the serialized chain inside ONE
    # jitted lax.scan, as a SLOPE over two scan lengths so the relay's
    # fixed dispatch+transfer roundtrip cancels (a single-length scan
    # embeds one ~20ms roundtrip and overstates ms/call). The kernel
    # input is built fresh from a scalar carry each iteration — exactly
    # how the AIS driver feeds it — because routing the full carried
    # tensor through the pallas operand measures carry plumbing, not the
    # kernel.
    def scan_chain(n_scan: int):
        @jax.jit
        def run(t0):
            def body(t, _):
                costs = env.fused_rollout_costs_tak(s0, ctrl_tak + t)
                return t + jnp.sum(costs) * 1e-20, None
            t, _ = jax.lax.scan(body, t0, None, length=n_scan)
            return t
        return run

    short_n, long_n = 10, 60
    run_s, run_l = scan_chain(short_n), scan_chain(long_n)
    zero = jnp.float32(0.0)
    _timed_first("car_kernel_scan", lambda: np.asarray(run_s(zero)))
    np.asarray(run_l(zero))  # compile the long chain too

    def measure(run):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(zero))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_call_scan = (measure(run_l) - measure(run_s)) / (long_n - short_n)
    if per_call_scan <= 0:  # scan slope itself jittered away: fall back
        per_call_scan = float("nan")

    # The in-graph scan slope is authoritative: the host-loop slope has
    # ranged 0.35-1.18 ms across rounds on the SAME kernel (relay
    # jitter), while the scan slope reconciles with the independently
    # measured 0.5-0.6 ms full-AIS-iteration cost that contains this
    # rollout. Fall back to the host loop only when the scan slope
    # itself jittered away.
    best = per_call_scan if math.isfinite(per_call_scan) else per_call
    unreliable = not math.isfinite(best) or best < floor_s
    gflops = flops / best / 1e9
    out = {
        "kernel": "car_rollout_fused",
        "flops_per_call": int(flops),
        "ms_per_call_hostloop_slope": round(per_call * 1e3, 3),
        "ms_per_call_scan_slope": round(per_call_scan * 1e3, 3),
        "ms_per_call": round(best * 1e3, 3),
        "ms_floor_vpu_peak": round(floor_s * 1e3, 3),
        "achieved_gflop_s": round(gflops, 1),
        "vpu_roofline_pct": round(100.0 * gflops * 1e9 / _VPU_PEAK_F32, 1),
        "mxu_roofline_pct": round(100.0 * gflops * 1e9 / _MXU_PEAK_F32, 2),
    }
    if math.isfinite(per_call) and math.isfinite(per_call_scan):
        out["methods_agree_pct"] = round(
            100.0 * abs(per_call - per_call_scan) / per_call_scan, 1
        )
    if unreliable:
        out["unreliable"] = True
        out["reason"] = (
            "slope unmeasurable or implied utilization exceeds the VPU peak"
        )
    return out


def _sanitize(text: str, limit: int = 200) -> str:
    """One printable line: ANSI escapes stripped, control chars dropped,
    truncated. BENCH_r03 embedded a multi-line ANSI Mosaic dump inside a
    details string and the driver recorded `parsed: null` — skip reasons
    must never be able to damage the artifact again."""
    import re

    text = re.sub(r"\x1b\[[0-9;]*[A-Za-z]", "", text)
    text = " ".join(text.split())
    return text[:limit]


def _fmt_rate(rate, fell_back: bool = False, scale: float = 1.0, nd: int = 1):
    """Round a measured rate; label it when it came from the vmap
    fallback instead of the fused kernel (VERDICT r4 item 5: fallback
    rows must be visible as rates, never silently-skipped entries)."""
    v = rate * scale
    if isinstance(v, float) and not math.isfinite(v):
        return "unmeasurable: slope stayed non-positive after retries"
    v = round(v, nd) if nd > 0 else int(round(v))
    if fell_back:
        return {"value": v, "fallback": "vmap (fused kernel failed to compile)"}
    return v


def _entry(details: dict, key: str, fn, timeout: float | None = None) -> None:
    """Run one measurement under the wall-clock budget and a per-entry
    signal.alarm timeout; a failure/timeout records a 'skipped:' row and
    the bench moves on (the final JSON always ships — VERDICT r4 item 1)."""
    if time.monotonic() - T_START > BUDGET_S:
        details[key] = "skipped: budget exhausted"
        return
    timeout = timeout if timeout is not None else ENTRY_TIMEOUT_S
    # never let one entry run past the budget by more than a minute
    # (alarm(0) would DISABLE the alarm, hence the floor of 1s)
    remaining = BUDGET_S - (time.monotonic() - T_START)
    timeout = max(1.0, min(timeout, remaining + 60.0))
    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(int(timeout))
    try:
        v = fn()
        if isinstance(v, float) and not math.isfinite(v):
            v = "unmeasurable: slope stayed non-positive after retries"
        elif isinstance(v, float):
            v = round(v, 1)
        details[key] = v
    except EntryTimeout:
        details[key] = f"skipped: entry timeout ({int(timeout)}s)"
    except Exception as exc:  # mujoco-free images etc.: skip the detail
        details[key] = f"skipped: {_sanitize(f'{type(exc).__name__}: {exc}')}"
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _measure_headline(details: dict) -> None:
    sps, spread_pct, fb = bench_car_racing(8192, spread=True)
    if math.isfinite(sps):
        RESULT["value"] = round(sps, 3)
        RESULT["vs_baseline"] = round(sps / BASELINE_STEPS_PER_S, 2)
    details["spread_pct_K8192"] = round(spread_pct, 1)
    if fb:
        details["headline_fallback"] = "vmap (fused kernel failed to compile)"


def _run_all(details: dict) -> None:
    # The headline FIRST (VERDICT r4 item 1) with its own long timeout:
    # everything after it is detail, and a partial artifact with a finite
    # headline already certifies the round.
    _entry(details, "headline_status",
           lambda: (_measure_headline(details), "ok")[1],
           timeout=HEADLINE_TIMEOUT_S)

    # The three spatial tasks that have NEVER had a driver-verified
    # number (r3 Mosaic failures, r4 timeout — VERDICT r4 item 2) run
    # immediately after the headline, before any repeat-coverage entry.
    for task in ("pusher", "humanoid", "standup"):
        _entry(details, f"{task}_kernel_env_steps_per_s",
               lambda t=task: bench_kernel_env_steps(t), timeout=420)
    for task in ("pusher", "humanoid", "standup"):
        _entry(details, f"{task}_e2e_control_steps_per_s",
               lambda t=task: bench_contact_e2e(t), timeout=420)

    # Same-task baseline ratio (VERDICT r4 item 7): our HalfCheetah e2e
    # rate over the reference's published 2.56 steps/s wall-clock.
    def _cheetah():
        v = bench_contact_e2e("cheetah")
        val = v.get("value") if isinstance(v, dict) else v
        if isinstance(val, (int, float)) and math.isfinite(val):
            RESULT["cheetah_e2e_vs_baseline"] = round(
                val / BASELINE_STEPS_PER_S, 2
            )
        return v

    _entry(details, "cheetah_e2e_control_steps_per_s", _cheetah)

    _entry(details, "K150_H50_steps_per_s",
           lambda: _fmt_rate(*bench_car_racing(150)))
    _entry(details, "cmamppi_K8192_steps_per_s",
           lambda: _fmt_rate(*bench_car_racing(8192, kind="cmamppi")))
    _entry(details, "reacher_on_device_env_steps_per_s",
           bench_reacher_on_device)
    for task in ("cheetah", "hopper", "walker2d", "swimmer", "ant"):
        _entry(details, f"{task}_kernel_env_steps_per_s",
               lambda t=task: bench_kernel_env_steps(t))
    for task in ("swimmer", "ant"):
        _entry(details, f"{task}_e2e_control_steps_per_s",
               lambda t=task: bench_contact_e2e(t))

    def _dr(kind="cemppi", K=8192):
        import jax.numpy as jnp

        from mpopis_tpu.models import CarRacingEnv
        from mpopis_tpu.policies import PolicyConfig

        env = CarRacingEnv(dtype=jnp.float32)
        cfg = PolicyConfig(kind=kind, num_samples=K, horizon=50, lam=10.0,
                           alpha=1.0, opt_its=10, ce_elite_threshold=0.8,
                           sigma_est="ss")
        return bench_device_rate(env, cfg, np.diag([0.0625, 0.1]),
                                 f"devicerate_car_{kind}")

    _entry(details, "devicerate_car_cemppi_K8192_steps_per_s", _dr)
    _entry(details, "devicerate_car_cmamppi_K8192_steps_per_s",
           lambda: _dr("cmamppi"))

    def _dr_task(task):
        import importlib

        import jax.numpy as jnp

        from mpopis_tpu.policies import PolicyConfig

        cls_name, K, H, its, lam, cov = _E2E_TASKS[task]
        models = importlib.import_module("mpopis_tpu.models")
        env = getattr(models, cls_name)(dtype=jnp.float32)
        cfg = PolicyConfig(kind="cemppi", num_samples=K, horizon=H, lam=lam,
                           opt_its=its, sigma_est="mle")
        return bench_device_rate(env, cfg, [cov] * env.action_dim,
                                 f"devicerate_{task}")

    for task in _E2E_TASKS:
        _entry(details, f"devicerate_{task}_e2e_steps_per_s",
               lambda t=task: _dr_task(t))
    _entry(details, "roofline", bench_roofline)
    _entry(details, "cemppi_ms_per_ais_iteration",
           lambda: round(bench_ais_iter_ms("cemppi"), 3))
    _entry(details, "cmamppi_ms_per_ais_iteration",
           lambda: round(bench_ais_iter_ms("cmamppi"), 3))

    def _harness():
        # end-to-end harness wall-clock (chunked MPC, telemetry + lap/
        # violation bookkeeping included); trial 2 excludes compiles
        from mpopis_tpu.harness import simulate_car_racing

        metrics = simulate_car_racing(
            num_trials=2, num_steps=100, seed=7, laps=1, print_output=False
        )
        return round(float(metrics["control_steps_per_s"][1]), 1)

    _entry(details, "harness_steps_per_s_K150", _harness)

    # One retry if the headline itself failed (compile may have landed in
    # the persistent cache meanwhile) — the artifact must not ship with a
    # null value while budget remains.
    if RESULT["value"] is None and time.monotonic() - T_START < BUDGET_S:
        _entry(details, "headline_status_retry",
               lambda: (_measure_headline(details), "ok")[1],
               timeout=HEADLINE_TIMEOUT_S)


def main() -> None:
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    _start_watchdog()
    details = RESULT["details"]
    details["baseline_steps_per_s"] = round(BASELINE_STEPS_PER_S, 3)
    details["config"] = (
        "cemppi, H=50, ais_its=10, ss-shrinkage, bicycle car racing"
    )
    details["budget_s"] = BUDGET_S
    try:
        from mpopis_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        _run_all(details)
    finally:
        # The artifact ALWAYS ships: crashes and kills included
        # (BENCH_r03 parsed:null, BENCH_r04 rc=124 — VERDICT r4 item 1).
        _emit()


if __name__ == "__main__":
    main()
