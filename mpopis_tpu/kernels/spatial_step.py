"""Fused Pallas rollout kernel for the SPATIAL (3D) contact MuJoCo
family (Ant / Humanoid / HumanoidStandup / Pusher) — the round-3
sibling of kernels/planar_step.py.

Same thesis as the planar kernel: the XLA/vmap path runs the substep as
hundreds of small vector ops with HBM-visible intermediates, so at
control-task K it is instruction-issue- and latency-bound; fusing the
whole K×T×frame_skip rollout (quaternion FK, analytic 3D mass/bias,
pyramidal-cone contact QP, RK4) into one Pallas program per K-block
keeps the state in vregs/VMEM for the whole trajectory. The kernel
body traces the SAME generic substep the XLA/vmap path uses
(models/spatial_contact.py: build_spatial_stepper), so the vmap path is
the correctness oracle (tests/test_spatial_kernel.py pins kernel ==
oracle in interpret mode).

The spatial family's reward reads STAGE-4 kinematics (gymnasium's
get_body_com / mass_center read data.xipos, which mj_step leaves at the
last RK stage): the kernel carries a per-sample `track(q_stage4)`
scalar across control steps — torso x for Ant, the mass-weighted com x
for Humanoid — and the locomotion reward is
healthy + fwd_w·Δtrack/dt − ctrl_w·Σa².

VMEM check (dominant: the stacked QP row Jacobian (n_rows, n_dof) of
f32 block vectors): Ant 108×14×block 512×4 B ≈ 3.1 MB; Humanoid
242×23×block 128×4 B ≈ 2.9 MB — the per-model default block_k below
keeps the J stack + CG temporaries inside the 16 MB VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpopis_tpu.models.spatial_contact import (
    SpatialContactModel,
    build_spatial_stepper,
)

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _spatial_advance(model: SpatialContactModel, frame_skip, outer, cg,
                     actuators, track):
    """(q, qv, acts) -> (q', qv', track(q_stage4)) over one control step;
    λ warm-starts across substeps and RK stages, reset at control-step
    boundaries — identical semantics to the env.step scan (the vmap
    oracle)."""
    substep, *_ = build_spatial_stepper(model, unroll_rk4=True)
    na = len(actuators)

    def advance(q, qv, acts):
        zero = jnp.zeros_like(q[0])
        tau = [zero] * model.n_dof
        for i in range(na):
            dof, gear = actuators[i]
            tau[dof] = gear * acts[i]
        tau = tuple(tau)
        lam = jnp.zeros((model.n_rows,) + q[0].shape, dtype=q[0].dtype)

        def sub(_, carry):
            qq, vv, ll, _q4 = carry
            return substep(qq, vv, tau, outer, cg, ll)

        q, qv, _, q4 = jax.lax.fori_loop(
            0, frame_skip, sub, (q, qv, lam, q)
        )
        return q, qv, track(q4)

    return advance


def _make_kernel(
    n_q: int,
    n_dof: int,
    na: int,
    advance,
    horizon: int,
    healthy: float,
    fwd_w: float,
    ctrl_w: float,
    inv_dt: float,
    block_k: int,
):
    """state0 row layout: [qpos(n_q), qvel(n_dof), track_prev] — the env
    state's own layout for the spatial family."""
    s_sub = block_k // LANES
    shape = (s_sub, LANES)

    def kernel(state0_ref, controls_ref, costs_ref):
        def full(v):
            return jnp.full(shape, v, dtype=jnp.float32)

        q0 = tuple(full(state0_ref[0, i]) for i in range(n_q))
        qv0 = tuple(full(state0_ref[0, n_q + i]) for i in range(n_dof))
        trk0 = full(state0_ref[0, n_q + n_dof])
        zero = full(0.0)

        def action_step(t, carry):
            q, qv, trk_prev, cost = carry
            acts = tuple(
                controls_ref[t, i, :].reshape(shape) for i in range(na)
            )
            q, qv, trk = advance(q, qv, acts)
            rew = healthy + (trk - trk_prev) * (fwd_w * inv_dt)
            for a in acts:
                rew = rew - ctrl_w * (a * a)
            return (q, qv, trk, cost - rew)

        _, _, _, cost = jax.lax.fori_loop(
            0, horizon, action_step, (q0, qv0, trk0, zero)
        )
        costs_ref[:, :] = cost

    return kernel


# Per-model track hooks, keyed so the jit static args stay hashable.
def _track_q0(q4):
    return q4[0]


_TRACKS = {"q0": _track_q0}


def register_track(name: str, fn) -> None:
    """Expose a model-specific stage-4 tracker (e.g. the Humanoid's
    mass-weighted com x) to the kernel by name."""
    _TRACKS[name] = fn


def _spatial_rollout_impl(
    model: SpatialContactModel,
    state0_x: jnp.ndarray,  # (n_q + n_dof + 1,) [+ extra tail ignored]
    controls_tak: jnp.ndarray,  # (T, na, K), already clamped
    horizon: int,
    frame_skip: int,
    outer: int,
    cg: int,
    actuators,  # tuple of (dof, gear)
    track: str,
    healthy: float,
    fwd_w: float,
    ctrl_w: float,
    block_k: int,
    interpret: bool,
) -> jnp.ndarray:
    k = controls_tak.shape[2]
    na = controls_tak.shape[1]
    n_state = model.n_q + model.n_dof + 1

    k_pad = _round_up(k, LANES)
    if k_pad <= block_k:
        block_k = k_pad
    else:
        block_k = max(block_k, LANES)
        k_pad = _round_up(k_pad, block_k)
    s_sub = block_k // LANES
    grid = (k_pad // block_k,)

    if k_pad == k:
        ctrl = controls_tak.astype(jnp.float32)
    else:
        ctrl = jnp.zeros((horizon, na, k_pad), dtype=jnp.float32)
        ctrl = ctrl.at[:, :, :k].set(controls_tak.astype(jnp.float32))
    state0 = state0_x[:n_state].astype(jnp.float32).reshape(1, -1)

    advance = _spatial_advance(
        model, frame_skip, outer, cg, actuators, _TRACKS[track]
    )
    kernel = _make_kernel(
        model.n_q, model.n_dof, na, advance, horizon, healthy, fwd_w,
        ctrl_w, 1.0 / (model.timestep * frame_skip), block_k,
    )
    costs = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k_pad // LANES, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, n_state), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
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


_STATIC = (
    "model", "horizon", "frame_skip", "outer", "cg", "actuators",
    "track", "healthy", "fwd_w", "ctrl_w", "block_k", "interpret",
)
# The real TPU path compiles through Mosaic (plain jit); interpret mode
# runs the kernel body as one giant scalar XLA CPU graph, where the
# default LLVM -O3 backend pipeline takes ~an hour on the unrolled-RK4
# spatial substep — fast_jit (backend opt level 1) compiles it in
# minutes with identical numerics (utils/fastjit.py).
_impl_device = functools.partial(jax.jit, static_argnames=_STATIC)(
    _spatial_rollout_impl
)


def _impl_interpret():
    from mpopis_tpu.utils.fastjit import fast_jit

    return fast_jit(_spatial_rollout_impl, static_argnames=_STATIC)


_impl_interpret_cached = None


def spatial_rollout_costs_tak(
    model: SpatialContactModel,
    state0_x: jnp.ndarray,
    controls_tak: jnp.ndarray,  # (T, na, K), clamped
    *,
    frame_skip: int,
    outer: int,
    cg: int,
    actuators,
    track: str = "q0",
    healthy: float,
    fwd_w: float = 1.0,
    ctrl_w: float,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(K,) trajectory costs Σ_t −reward for the spatial-contact family.
    Semantically identical to rollout_batch over the env's step_reward
    (the vmap path is the correctness oracle,
    tests/test_spatial_kernel.py)."""
    global _impl_interpret_cached
    if interpret:
        if _impl_interpret_cached is None:
            _impl_interpret_cached = _impl_interpret()
        impl = _impl_interpret_cached
    else:
        impl = _impl_device
    return impl(
        model, state0_x, controls_tak, controls_tak.shape[0], frame_skip,
        outer, cg, tuple(actuators), track, healthy, fwd_w, ctrl_w,
        block_k, interpret,
    )
