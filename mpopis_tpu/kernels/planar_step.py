"""Fused Pallas rollout kernel for the planar-contact MuJoCo family
(HalfCheetah / Hopper / Walker2d) — the round-2 headline lever
(docs/ROADMAP.md): the whole K×T×frame_skip rollout, INCLUDING the
per-substep contact QP solve, runs as one Pallas program per K-block.

Why this wins: the XLA path runs the substep as hundreds of small vector
ops with HBM-visible intermediates between them; at K=2048 each op
carries only 2 f32 vregs of work, so the step is instruction-issue- and
latency-bound (~0.69M env-steps/s measured round 1 — 5x one host core,
vs 1378x for the contact-free reacher). Inside one kernel the state
lives in vregs/VMEM for the whole trajectory and the only HBM traffic is
the control tensor read and the final cost write.

The kernel body just traces the SAME generic substep the XLA/vmap path
uses (models/planar_contact.py: analytic mass/bias — no AD transforms —
unrolled scalar Cholesky, active-set/CG contact solve with fori_loop
inner loops, euler-implicit or RK4 integration). Every quantity is a
(block_k//128, 128) vector; row stacks in the QP are
(n_rows, s_sub, 128). The vmap path is the correctness oracle
(tests/test_planar_kernel.py pins kernel == oracle in interpret mode).

Reward models (gym v4 locomotion): reward_t = healthy + (x'−x)/dt −
ctrl_w·Σa², cost = Σ_t −reward_t, matching each env's step_reward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpopis_tpu.models.planar_contact import (
    PlanarContactModel,
    build_contact_stepper,
)

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(
    n_dof: int,
    na: int,
    advance,  # (q, qv, acts) -> (q', qv'): one FULL control step
    horizon: int,
    healthy: float,
    ctrl_w: float,
    inv_dt: float,
    block_k: int,
):
    """Generic fused-rollout kernel over tuple-of-scalars dynamics: any
    env whose control step is pure jnp over (q, qv) n_dof-tuples (the
    scalar/SoA discipline) plugs in via `advance`; the locomotion reward
    healthy + Δx/dt − ctrl_w·Σa² covers the gym v4 family."""
    s_sub = block_k // LANES
    shape = (s_sub, LANES)

    def kernel(state0_ref, controls_ref, costs_ref):
        def full(v):
            return jnp.full(shape, v, dtype=jnp.float32)

        q0 = tuple(full(state0_ref[0, i]) for i in range(n_dof))
        qv0 = tuple(full(state0_ref[0, n_dof + i]) for i in range(n_dof))
        zero = full(0.0)

        def action_step(t, carry):
            q, qv, cost = carry
            acts = tuple(
                controls_ref[t, i, :].reshape(shape) for i in range(na)
            )
            x_before = q[0]
            q, qv = advance(q, qv, acts)
            rew = healthy + (q[0] - x_before) * inv_dt
            for a in acts:
                rew = rew - ctrl_w * (a * a)
            return (q, qv, cost - rew)

        _, _, cost = jax.lax.fori_loop(
            0, horizon, action_step, (q0, qv0, zero)
        )
        costs_ref[:, :] = cost

    return kernel


def _contact_advance(model: PlanarContactModel, frame_skip, outer, cg, gear):
    substep, *_ = build_contact_stepper(model)
    na = len(gear)

    def advance(q, qv, acts):
        zero = jnp.zeros_like(q[0])
        tau = (zero,) * 3 + tuple(gear[i] * acts[i] for i in range(na))
        # λ warm-start chains across substeps, reset per control step
        # (identical semantics to the env.step scan = vmap oracle)
        lam = jnp.zeros((model.n_rows,) + q[0].shape, dtype=q[0].dtype)

        def sub(_, qqv):
            qq, vv, ll = qqv
            return substep(qq, vv, tau, outer, cg, ll)

        q, qv, _ = jax.lax.fori_loop(0, frame_skip, sub, (q, qv, lam))
        return q, qv

    return advance


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "horizon", "frame_skip", "outer", "cg", "gear",
        "healthy", "ctrl_w", "block_k", "interpret",
    ),
)
def _planar_rollout_impl(
    model: PlanarContactModel,
    state0_x: jnp.ndarray,  # (2n,)
    controls_tak: jnp.ndarray,  # (T, na, K), already clamped
    horizon: int,
    frame_skip: int,
    outer: int,
    cg: int,
    gear,
    healthy: float,
    ctrl_w: float,
    block_k: int,
    interpret: bool,
) -> jnp.ndarray:
    k = controls_tak.shape[2]
    na = controls_tak.shape[1]
    n = model.n_dof

    k_pad = _round_up(k, LANES)
    if k_pad <= block_k:
        block_k = k_pad
    else:
        block_k = max(block_k, 8 * LANES)
        k_pad = _round_up(k_pad, block_k)
    s_sub = block_k // LANES
    grid = (k_pad // block_k,)

    if k_pad == k:
        ctrl = controls_tak.astype(jnp.float32)
    else:
        ctrl = jnp.zeros((horizon, na, k_pad), dtype=jnp.float32)
        ctrl = ctrl.at[:, :, :k].set(controls_tak.astype(jnp.float32))
    state0 = state0_x[: 2 * n].astype(jnp.float32).reshape(1, -1)

    advance = _contact_advance(model, frame_skip, outer, cg, gear)
    kernel = _make_kernel(
        n, na, advance, horizon, healthy, ctrl_w,
        1.0 / (model.timestep * frame_skip), block_k,
    )
    costs = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_pad // LANES, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * n), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (horizon, na, block_k), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (s_sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(state0, ctrl)
    return costs.reshape(-1)[:k]


@functools.partial(
    jax.jit,
    static_argnames=("horizon", "block_k", "interpret"),
)
def _swimmer_rollout_impl(
    state0_x: jnp.ndarray,  # (10,)
    controls_tak: jnp.ndarray,  # (T, 2, K), clamped
    horizon: int,
    block_k: int,
    interpret: bool,
) -> jnp.ndarray:
    from mpopis_tpu.models import swimmer_device as sd

    k = controls_tak.shape[2]
    k_pad = _round_up(k, LANES)
    if k_pad <= block_k:
        block_k = k_pad
    else:
        block_k = max(block_k, 8 * LANES)
        k_pad = _round_up(k_pad, block_k)
    s_sub = block_k // LANES
    grid = (k_pad // block_k,)
    if k_pad == k:
        ctrl = controls_tak.astype(jnp.float32)
    else:
        ctrl = jnp.zeros((horizon, 2, k_pad), dtype=jnp.float32)
        ctrl = ctrl.at[:, :, :k].set(controls_tak.astype(jnp.float32))
    state0 = state0_x.astype(jnp.float32).reshape(1, -1)

    def advance(q, qv, acts):
        # analytic swimmer substep (no AD transforms — the jacfwd/jvp/vjp
        # route stalled the remote Mosaic compiler); shape-polymorphic,
        # so the block arrays trace directly like the contact family
        tau3 = sd._GEAR * acts[0]
        tau4 = sd._GEAR * acts[1]
        lam = jnp.zeros(
            (sd.PC_MODEL.n_rows,) + q[0].shape, dtype=q[0].dtype
        )

        def sub(_, qqv):
            qq, vv, ll = qqv
            return sd._rk4_analytic(qq, vv, tau3, tau4, ll)

        q, qv, _ = jax.lax.fori_loop(0, sd._FRAME_SKIP, sub, (q, qv, lam))
        return q, qv

    kernel = _make_kernel(
        5, 2, advance, horizon, 0.0, 1e-4,
        1.0 / (sd._H * sd._FRAME_SKIP), block_k,
    )
    costs = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_pad // LANES, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 10), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (horizon, 2, block_k), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (s_sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(state0, ctrl)
    return costs.reshape(-1)[:k]


def swimmer_rollout_costs_tak(
    state0_x: jnp.ndarray,
    controls_tak: jnp.ndarray,
    *,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """(K,) trajectory costs for the on-device Swimmer. The kernel traces
    the ANALYTIC substep (swimmer_device's `_rk4_analytic` route: closed-
    form chain mass/bias + fluid as chain-Jacobian pullbacks) — the
    AD-derived route (jacfwd/jvp/vjp) stalls the Mosaic compiler and is
    kept only as the vmap-path cross-check, pinned equal to 3e-15/substep.
    Oracle: rollout_batch over SwimmerDeviceEnv.step_reward."""
    return _swimmer_rollout_impl(
        state0_x, controls_tak, controls_tak.shape[0], block_k, interpret
    )


def planar_rollout_costs_tak(
    model: PlanarContactModel,
    state0_x: jnp.ndarray,
    controls_tak: jnp.ndarray,  # (T, na, K), clamped
    *,
    frame_skip: int,
    outer: int,
    cg: int,
    gear,
    healthy: float,
    ctrl_w: float,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(K,) trajectory costs Σ_t −reward for the planar-contact family.
    Semantically identical to rollout_batch over the env's step_reward
    (the vmap path is the correctness oracle, tests/test_planar_kernel.py).
    """
    return _planar_rollout_impl(
        model, state0_x, controls_tak, controls_tak.shape[0], frame_skip,
        outer, cg, tuple(gear), healthy, ctrl_w, block_k, interpret,
    )
