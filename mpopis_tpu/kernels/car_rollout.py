"""Fused Pallas TPU kernel for car-racing trajectory rollouts (1..N cars).

One kernel evaluates a full batch of candidate control sequences: the
T-step × 10-substep brush-tire integration (car_racing.jl:282-344), the
track distance query (car_racing_tracks.jl:64-92), the reward
(car_racing.jl:201-213; joint multi-car reward with pairwise distance and
collision terms, multi-car_racing.jl:145-158), and cost accumulation — with
all car states resident in VMEM/vector registers the whole time. This
replaces ~T×substeps separate XLA fusions in the vmap path (the hot loop
identified in SURVEY.md §3.1: K·N·T·10 tire-model evaluations per control
step).

Layout: samples are laid out as (S, 128) f32 tiles (S sublane-groups of 128
lanes); each physical quantity of each car (x, y, Ψ, Vx, Vy, Ψ̇, δ, cost, …)
is one such tile set, so every dynamics op — including the cross-car
pairwise-distance reward terms — is a dense VPU op. The subsampled track
centerline lives in SMEM and the argmin/neighbor/projection query is a
fori_loop of scalar-broadcast compares — no gathers.

Physics parameters and track geometry are baked into the kernel as
compile-time constants (they are static per environment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpopis_tpu.kernels import kmath
from mpopis_tpu.models.car_racing import CarParams

_G = 9.81
LANES = 128


def _tire_fy_sc(sin_num, cos_num, vx, y_num, mu, c_a, fz, fx):
    """Brush tire lateral force from scaled slip-angle components.

    `sin_num = h·sin(α)` and `cos_num = h·cos(α)` for some h > 0, with
    α = atan2(y_num, vx) − δ the (unwrapped) slip angle of the oracle
    (models/car_racing.py::_tire_fy, ref car_racing.jl:252-260). α only
    enters the tire model through tan(α), sign(α), and the test
    |α| < atan(3·fy_max/c_a) — all exactly recoverable from the
    components, which replaces two polynomial transcendentals (atan2 +
    atan) and a tan per tire per substep with one divide and compares:

    - tan(α) = sin_num / cos_num (quotient identity);
    - |α| < atan(q) ⟺ cos(α) > 0 ∧ |tan(α)| < q, and since the unwrapped
      α ∈ (−π−δmax, π+δmax] never reaches the next cos-positive branch,
      cos_num > 0 decides cos(α) > 0 exactly;
    - sign(α) = sign(sin_num) except when α lies beyond ±π (possible only
      for the front tire when reversing, vx < 0): algebra on
      tan θ = y_num/vx reduces `α > π` to vx<0 ∧ y_num≥0 ∧ sin_num<0 and
      `α < −π` to vx<0 ∧ y_num<0 ∧ sin_num>0.
    """
    fy2 = jnp.maximum((mu * fz) ** 2 - fx * fx, 1e-8)
    inv_fy = jax.lax.rsqrt(fy2)
    fy_max = fy2 * inv_fy
    ta = sin_num / cos_num
    cubic = (
        -c_a * ta
        + ((c_a * c_a) / 3.0) * inv_fy * jnp.abs(ta) * ta
        - ((c_a**3) / 27.0) * (inv_fy * inv_fy) * ta * ta * ta
    )
    sgn = jnp.sign(sin_num)
    rev = vx < 0.0
    sgn = jnp.where(rev & (y_num >= 0.0) & (sin_num < 0.0), 1.0, sgn)
    sgn = jnp.where(rev & (y_num < 0.0) & (sin_num > 0.0), -1.0, sgn)
    sat = -fy_max * sgn
    in_range = (cos_num > 0.0) & (jnp.abs(ta) * c_a < 3.0 * fy_max)
    return jnp.where(in_range, cubic, sat)


def _make_kernel(p: CarParams, horizon: int, n_sub: int, dt: float, ddt: float,
                 m_track: int, beta_limit: float, num_cars: int):
    """Build the kernel body with physics constants baked in."""
    ll = p.l_r + p.l_f

    def kernel(state0_ref, tx_ref, ty_ref, tw_ref, tc_ref, tx2_ref, ty2_ref,
               controls_ref, costs_ref):
        s_sub = costs_ref.shape[0]  # sublane-groups per block
        shape = (s_sub, LANES)

        def full(v):
            return jnp.full(shape, v, dtype=jnp.float32)

        def track_dist(x, y):
            """(within, dist) per lane; ref car_racing_tracks.jl:64-92."""

            def one_pt(m, carry):
                min_d2, bx, by, bpx, bpy, bnx, bny, bw = carry
                px = tx_ref[0, m]
                py = ty_ref[0, m]
                # squared distance up to the per-query constant x²+y²:
                # c_m − 2pₓx − 2pᵧy (precomputed c_m, 2pₓ, 2pᵧ in SMEM) —
                # two FMAs instead of five ops; argmin is offset-invariant
                d2 = tc_ref[0, m] - tx2_ref[0, m] * x - ty2_ref[0, m] * y
                better = d2 < min_d2
                m_prev = jax.lax.rem(m - 1 + m_track, m_track)
                m_next = jax.lax.rem(m + 1, m_track)
                return (
                    jnp.where(better, d2, min_d2),
                    jnp.where(better, px, bx),
                    jnp.where(better, py, by),
                    jnp.where(better, tx_ref[0, m_prev], bpx),
                    jnp.where(better, ty_ref[0, m_prev], bpy),
                    jnp.where(better, tx_ref[0, m_next], bnx),
                    jnp.where(better, ty_ref[0, m_next], bny),
                    jnp.where(better, tw_ref[0, m], bw),
                )

            # 4x manual unroll of the centerline sweep: fewer loop-carried
            # iterations for the same compare/select work.
            unroll = 4
            m_main = (m_track // unroll) * unroll

            def scan_block(b, carry):
                m0 = b * unroll
                for off in range(unroll):
                    carry = one_pt(m0 + off, carry)
                return carry

            init = (full(3.4e38), full(0.0), full(0.0), full(0.0),
                    full(0.0), full(0.0), full(0.0), full(0.0))
            carry = jax.lax.fori_loop(0, m_main // unroll, scan_block, init)
            carry = jax.lax.fori_loop(m_main, m_track, one_pt, carry)
            _, bx, by, bpx, bpy, bnx, bny, bw = carry
            d_prev2 = (bpx - x) ** 2 + (bpy - y) ** 2
            d_next2 = (bnx - x) ** 2 + (bny - y) ** 2
            use_prev = d_prev2 <= d_next2
            p2x = jnp.where(use_prev, bpx, bnx)
            p2y = jnp.where(use_prev, bpy, bny)
            segx = p2x - bx
            segy = p2y - by
            seg2 = segx * segx + segy * segy
            t_par = ((x - bx) * segx + (y - by) * segy) / seg2
            projx = bx + t_par * segx
            projy = by + t_par * segy
            dist = jnp.sqrt((projx - x) ** 2 + (projy - y) ** 2)
            return dist < bw, dist

        def car_reward(car):
            """Per-car reward (ref car_racing.jl:201-213)."""
            x, y, _sin_p, _cos_p, vx, vy, psid, delta = car
            within, dist = track_dist(x, y)
            beta = kmath.atan2(vy, vx)
            rew = jnp.where(within, 0.0, -1000000.0)
            rew = rew + jnp.where(jnp.abs(beta) > beta_limit, -5000.0, 0.0)
            rew = rew - dist
            rew = rew + 2.0 * jnp.sqrt(vx * vx + vy * vy)
            return rew

        def advance_car(car, steer, pedal):
            """One dt action step = n_sub Euler substeps (car_racing.jl:282-344).

            Carries (sin ψ, cos ψ) instead of ψ — the heading only ever enters
            the dynamics through its sin/cos (position update; the wrap at
            ref :330-332 is sin/cos-invariant), so ψ is advanced as a small-
            angle rotation (4th-order sin/cos of ψ̇·δt, renormalized once per
            action step) and δ's sin/cos by composing a per-action-step
            constant rotation (δ̇ is constant within the step, ref :295-296),
            replacing four native transcendentals per substep with a few
            multiply-adds.
            """
            x, y, sin_p, cos_p, vx, vy, psid, delta = car
            target = steer * p.delta_max
            commanded = jnp.abs(target - delta) / dt
            ddelta = jnp.minimum(commanded, p.delta_dot_max) * jnp.sign(
                target - delta
            )
            lam = jnp.where(pedal <= 0.0, p.lambda_brake, p.lambda_drive)
            accel = p.fx_max * jnp.maximum(pedal, 0.0)

            # δ rotation increment for this action step (native trig once)
            d_step = ddelta * ddt
            sin_e = jnp.sin(d_step)
            cos_e = jnp.cos(d_step)
            sin_d = jnp.sin(delta)
            cos_d = jnp.cos(delta)

            for _ in range(n_sub):
                delta = delta + d_step
                sin_d, cos_d = (
                    sin_d * cos_e + cos_d * sin_e,
                    cos_d * cos_e - sin_d * sin_e,
                )
                # slip angles as scaled sin/cos components (see _tire_fy_sc):
                # front α_f = atan2(y_f, vx) − δ via the angle-difference
                # identity; rear α_r = atan2(y_r, vx) directly.
                y_f = vy + p.l_f * psid
                y_r = vy - p.l_r * psid
                sin_f = y_f * cos_d - vx * sin_d
                cos_f = vx * cos_d + y_f * sin_d
                fx_aero = (p.c_d0 + p.c_d1 * jnp.abs(vx)) * jnp.sign(vx)
                brake = p.fx_min * jnp.minimum(pedal, 0.0) * jnp.sign(vx)
                fx = accel + brake
                fxf = lam * fx
                fxr = (1.0 - lam) * fx
                # div-by-constant → mul (ll, m, i_zz are compile-time)
                fzf = (p.m * p.l_r * _G - p.h_cm * fx) * (1.0 / ll)
                fzr = (p.m * p.l_f * _G + p.h_cm * fx) * (1.0 / ll)
                fyf = _tire_fy_sc(sin_f, cos_f, vx, y_f, p.mu_f, p.c_af, fzf, fxf)
                fyr = _tire_fy_sc(y_r, vx, vx, y_r, p.mu_r, p.c_ar, fzr, fxr)
                psidd = (p.l_f * (fxf * sin_d + fyf * cos_d) - p.l_r * fyr) * (
                    1.0 / p.i_zz
                )
                vy_dot = (fyf * cos_d + fxf * sin_d + fyr) * (1.0 / p.m) - psid * vx
                vx_dot = (fxf * cos_d - fyf * sin_d + fxr - fx_aero) * (
                    1.0 / p.m
                ) + psid * vy
                psid = psid + psidd * ddt
                vx = vx + vx_dot * ddt
                vy = vy + vy_dot * ddt
                # rotate (sin ψ, cos ψ) by the small angle ψ̇·δt (|dψ|≲0.05:
                # 4th-order series is below f32 rounding of native sin/cos)
                dp = psid * ddt
                dp2 = dp * dp
                sin_q = dp * (1.0 - dp2 * (1.0 / 6.0))
                cos_q = 1.0 - dp2 * (0.5 - dp2 * (1.0 / 24.0))
                sin_p, cos_p = (
                    sin_p * cos_q + cos_p * sin_q,
                    cos_p * cos_q - sin_p * sin_q,
                )
                x = x + (vx * cos_p - vy * sin_p) * ddt
                y = y + (vx * sin_p + vy * cos_p) * ddt
            # renormalize the heading rotation once per action step
            inv_n = jax.lax.rsqrt(sin_p * sin_p + cos_p * cos_p)
            return (x, y, sin_p * inv_n, cos_p * inv_n, vx, vy, psid, delta)

        def action_step(t, carry):
            cars, cost = carry
            new_cars = []
            for ci in range(num_cars):
                steer = controls_ref[t, 2 * ci, :].reshape(shape)
                pedal = controls_ref[t, 2 * ci + 1, :].reshape(shape)
                new_cars.append(advance_car(cars[ci], steer, pedal))

            rew = full(0.0)
            for ci in range(num_cars):
                rew = rew + car_reward(new_cars[ci])
            # joint terms: pairwise distance + collision (multi-car_racing.jl:145-158)
            for i in range(num_cars):
                for j in range(i + 1, num_cars):
                    dx = new_cars[i][0] - new_cars[j][0]
                    dy = new_cars[i][1] - new_cars[j][1]
                    dd = jnp.sqrt(dx * dx + dy * dy + 1e-30)
                    rew = rew - dd
                    rew = rew - jnp.where(dd <= 4.0, 11000.0, 0.0)
            return (tuple(new_cars), cost - rew)

        cars0 = tuple(
            (
                full(state0_ref[0, 8 * ci + 0]),  # x
                full(state0_ref[0, 8 * ci + 1]),  # y
                jnp.sin(full(state0_ref[0, 8 * ci + 2])),  # sin ψ
                jnp.cos(full(state0_ref[0, 8 * ci + 2])),  # cos ψ
                full(state0_ref[0, 8 * ci + 3]),  # Vx
                full(state0_ref[0, 8 * ci + 4]),  # Vy
                full(state0_ref[0, 8 * ci + 5]),  # ψ̇
                full(state0_ref[0, 8 * ci + 6]),  # δ
            )
            for ci in range(num_cars)
        )
        final_cars, final_cost = jax.lax.fori_loop(
            0, horizon, action_step, (cars0, full(0.0))
        )
        costs_ref[:, :] = final_cost

    return kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "params", "track_xs", "track_ys", "track_ws", "dt", "ddt",
        "horizon", "num_cars", "block_k", "interpret",
    ),
)
def _car_rollout_costs_impl(
    params: CarParams,
    track_xs,
    track_ys,
    track_ws,
    dt: float,
    ddt: float,
    state0_x: jnp.ndarray,
    controls_tak: jnp.ndarray,  # (T, na, K)
    horizon: int,
    num_cars: int,
    block_k: int,
    interpret: bool,
) -> jnp.ndarray:
    k = controls_tak.shape[2]
    n_sub = int(round(dt / ddt))
    m_track = len(track_xs)

    k_pad = _round_up(k, LANES)
    if k_pad <= block_k:
        # single block: block shape == full array shape (exempt from the
        # (8,128) minimum-tile rule)
        block_k = k_pad
    else:
        block_k = max(block_k, 8 * LANES)  # min out tile (8,128) per block
        k_pad = _round_up(k_pad, block_k)
    s_sub = block_k // LANES
    grid = (k_pad // block_k,)
    na = 2 * num_cars

    if k_pad == k:
        ctrl = controls_tak.astype(jnp.float32)
    else:
        ctrl = jnp.zeros((horizon, na, k_pad), dtype=jnp.float32)
        ctrl = ctrl.at[:, :, :k].set(controls_tak.astype(jnp.float32))
    state0 = state0_x[: 8 * num_cars].astype(jnp.float32).reshape(1, -1)
    tx = jnp.asarray(track_xs, dtype=jnp.float32).reshape(1, -1)
    ty = jnp.asarray(track_ys, dtype=jnp.float32).reshape(1, -1)
    tw = jnp.asarray(track_ws, dtype=jnp.float32).reshape(1, -1)
    tc = tx * tx + ty * ty
    tx2 = 2.0 * tx
    ty2 = 2.0 * ty

    kernel = _make_kernel(
        params, horizon, n_sub, dt, ddt, m_track, params.beta_limit, num_cars
    )
    costs = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_pad // LANES, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8 * num_cars), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m_track), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m_track), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m_track), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m_track), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m_track), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m_track), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (horizon, na, block_k), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (s_sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(state0, tx, ty, tw, tc, tx2, ty2, ctrl)
    return costs.reshape(-1)[:k]


def car_rollout_costs(
    env,
    state0_x: jnp.ndarray,
    controls: jnp.ndarray,  # (K, T, 2*num_cars), already clamped
    horizon: int,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused rollout for CarRacingEnv / MultiCarRacingEnv: (K,) trajectory
    costs Σ_t -reward(s_t). Semantically identical to rollout_batch (the
    vmap path is the correctness oracle; see tests/test_kernels.py)."""
    ctrl_tak = jnp.transpose(controls, (1, 2, 0))
    return car_rollout_costs_tak(
        env, state0_x, ctrl_tak, horizon, block_k=block_k, interpret=interpret
    )


def car_rollout_costs_tak(
    env,
    state0_x: jnp.ndarray,
    controls_tak: jnp.ndarray,  # (T, 2*num_cars, K), already clamped
    horizon: int,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused rollout taking controls in the kernel's native (T, na, K)
    layout — a flat (cs, K) candidate matrix reshapes to this for free, so
    the GMPPI driver's hot path avoids any transpose."""
    num_cars = getattr(env, "num_cars", 1)
    # hashable track arrays for the jit static trace: pass as tuples
    costs = _car_rollout_costs_impl(
        env.params,
        tuple(env.track.xs.tolist()),
        tuple(env.track.ys.tolist()),
        tuple(env.track.lane_width_s.tolist()),
        env.dt,
        env.ddt,
        state0_x,
        controls_tak,
        horizon,
        num_cars,
        block_k,
        interpret,
    )
    return costs.astype(env.dtype)
