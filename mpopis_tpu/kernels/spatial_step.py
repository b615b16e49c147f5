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

The spatial family's rewards read STAGE-4 kinematics (gymnasium's
get_body_com / mass_center / cfrc_ext read data that mj_step leaves at
the last RK stage): the kernel carries a per-sample SNAPSHOT tuple
across control steps, resolved per model through the reward-FAMILY
registry — 'locomotion' (Ant/Humanoid: one track scalar, reward
healthy + fwd_w·Δtrack/dt − ctrl_w·Σa²), 'pusher' (the 9-entry stale
xpos snapshot feeding the distance costs) and 'standup' (the stage-4
Σ‖cfrc_ext‖² reconstructed in-kernel from the final substep's λ).

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
                     actuators, rk4_loop: bool = True,
                     qp_dense: bool = True):
    """(q, qv, acts) -> (q', qv', q_stage4, λ) over one control step;
    λ warm-starts across substeps and RK stages, reset at control-step
    boundaries — identical semantics to the env.step scan (the vmap
    oracle). q_stage4 is the kinematics snapshot the family's reward
    reads (last RK stage for RK4 models, the penultimate/pre-integration
    qpos for Euler models — both are what mj_step leaves in data.xpos);
    λ is the final substep's contact impulses (the Standup family's
    stage-4 cfrc_ext reconstruction reads it).

    `rk4_loop` selects the fori_loop RK4 stage form (1x qacc live
    window) instead of the 4x-unrolled form — the unroll spills ~36 MB
    of live vregs on the 242-row humanoid (spatial_contact.py
    rk4_substep_loop docstring); ignored for Euler models."""
    substep, *_ = build_spatial_stepper(
        model, rk4_mode="loop" if rk4_loop else "unroll", qp_dense=qp_dense
    )
    na = len(actuators)
    # Euler substeps return their INPUT q as the stage-4 snapshot
    # (mj_step leaves data.xpos at the pre-integration qpos), so a
    # frame_skip fori_loop that carries the snapshot makes the loop
    # body's q4 output an SSA alias of its q input. Mosaic's loop layout
    # inference then demands a data->replicated relayout, which is
    # invalid ("Invalid relayout: Non-singleton logical dimension is
    # replicated in destination but not in source" — the round-3 Pusher
    # TPU compile failure, bisected in scripts/aot_bisect_euler.py).
    # Fix: for Euler models, loop frame_skip-1 substeps with a 3-slot
    # carry (no snapshot) and run the LAST substep outside the loop —
    # its returned q4 is the loop's own output q, a fresh non-carried
    # value. RK4 models compute a fresh stage-4 q inside the substep,
    # so they keep the single-trace 4-slot loop.
    euler = model.integrator == "euler_implicit"
    if euler and frame_skip < 2:
        raise NotImplementedError(
            "fused spatial rollout needs frame_skip >= 2 for Euler models "
            "(the stage-4 snapshot would alias the loop carry; use the "
            "vmap rollout path for frame_skip == 1)"
        )

    def advance(q, qv, acts):
        zero = jnp.zeros_like(q[0])
        tau = [zero] * model.n_dof
        for i in range(na):
            dof, gear = actuators[i]
            tau[dof] = gear * acts[i]
        tau = tuple(tau)
        lam = jnp.zeros((model.n_rows,) + q[0].shape, dtype=q[0].dtype)

        if rk4_loop and not euler:
            # Anchor every loop-carry init to DATA layout via the acts
            # block (the kernel's only guaranteed data-layout input):
            # Mosaic infers fori_loop carry layouts from the init, and a
            # replicated init (SMEM state broadcast at t=0) against the
            # data-layout body output demands the invalid
            # data->replicated relayout (rk4_substep_loop docstring).
            # x + 0 is exact for finite f32.
            anchor = acts[0] * jnp.asarray(0.0, dtype=q[0].dtype)
            q = tuple(x + anchor for x in q)
            qv = tuple(x + anchor for x in qv)
            lam = lam + anchor

        if euler:
            def sub3(_, carry):
                qq, vv, ll = carry
                q2, v2, l2, _q4 = substep(qq, vv, tau, outer, cg, ll)
                return (q2, v2, l2)

            q, qv, lam = jax.lax.fori_loop(
                0, frame_skip - 1, sub3, (q, qv, lam)
            )
            q, qv, lam, q4 = substep(q, qv, tau, outer, cg, lam)
            return q, qv, q4, lam

        def sub(_, carry):
            qq, vv, ll, _q4 = carry
            return substep(qq, vv, tau, outer, cg, ll)

        q, qv, lam, q4 = jax.lax.fori_loop(
            0, frame_skip, sub, (q, qv, lam, q)
        )
        return q, qv, q4, lam

    return advance


def _make_kernel(
    n_q: int,
    n_dof: int,
    na: int,
    advance,
    horizon: int,
    n_carry: int,
    carry_fn,
    reward_fn,
    block_k: int,
):
    """state0 row layout: [qpos(n_q), qvel(n_dof), carry(n_carry)] — the
    env state's own layout for the spatial family. `carry` is the
    per-sample kinematics snapshot the next step's reward reads (the
    stage-4 track scalar for the locomotion family, the stale xpos
    snapshot for Pusher)."""
    s_sub = block_k // LANES
    shape = (s_sub, LANES)

    def kernel(state0_ref, controls_ref, costs_ref):
        def full(v):
            return jnp.full(shape, v, dtype=jnp.float32)

        q0 = tuple(full(state0_ref[0, i]) for i in range(n_q))
        qv0 = tuple(full(state0_ref[0, n_q + i]) for i in range(n_dof))
        carry0 = tuple(
            full(state0_ref[0, n_q + n_dof + i]) for i in range(n_carry)
        )
        zero = full(0.0)

        def action_step(t, carry):
            q, qv, snap_prev, cost = carry
            acts = tuple(
                controls_ref[t, i, :].reshape(shape) for i in range(na)
            )
            q, qv, q4, lam = advance(q, qv, acts)
            snap = carry_fn(q4, lam)
            rew = reward_fn(snap_prev, snap, acts, q)
            return (q, qv, snap, cost - rew)

        _, _, _, cost = jax.lax.fori_loop(
            0, horizon, action_step, (q0, qv0, carry0, zero)
        )
        costs_ref[0, :, :] = cost

    return kernel


# Per-model track hooks, keyed so the jit static args stay hashable.
def _track_q0(q4):
    return q4[0]


_TRACKS = {"q0": _track_q0}


def register_track(name: str, fn) -> None:
    """Expose a model-specific stage-4 tracker (e.g. the Humanoid's
    mass-weighted com x) to the kernel by name."""
    _TRACKS[name] = fn


# Reward FAMILIES: name -> (n_carry, carry_fn, make_reward).
#   carry_fn(q4, lam) -> tuple of n_carry per-sample scalars (the
#       snapshot carried across control steps, initialized from the env
#       state's tail entries; lam is the final substep's contact
#       impulses — the Standup cfrc_ext term reads it; entries that come
#       back as python floats are broadcast against q4[0]);
#   make_reward(healthy, fwd_rate, ctrl_w)
#       -> reward(prev_snap, new_snap, acts, q_new).
# 'locomotion' (Ant/Humanoid): healthy + fwd_w*(track'-track)/dt
#       - ctrl_w*sum(a^2), with the track scalar resolved via _TRACKS.
_FAMILIES: dict = {}


def register_family(name: str, n_carry: int, carry_fn, make_reward) -> None:
    """Expose a model-specific reward family (e.g. the Pusher's
    stale-xpos distance costs, the Standup's cfrc_ext impact cost) to
    the kernel by name."""
    _FAMILIES[name] = (n_carry, carry_fn, make_reward)


def _normalized(carry_fn):
    """Wrap carry_fn so constant (python float) entries are broadcast to
    the block shape."""
    def fn(q4, lam):
        out = []
        for e in carry_fn(q4, lam):
            if isinstance(e, (int, float)):
                e = jnp.full_like(q4[0], float(e))
            out.append(e)
        return tuple(out)

    return fn


def _spatial_rollout_impl(
    model: SpatialContactModel,
    state0_x: jnp.ndarray,  # (n_q + n_dof + n_carry,) [+ extra tail ignored]
    controls_tak: jnp.ndarray,  # (T, na, K), already clamped
    horizon: int,
    frame_skip: int,
    outer: int,
    cg: int,
    actuators,  # tuple of (dof, gear)
    family: str,
    track: str,
    healthy: float,
    fwd_w: float,
    ctrl_w: float,
    block_k: int,
    interpret: bool,
    vmem_limit_mb: int = 0,
    rk4_loop: bool = True,
    qp_sparse: bool = True,
) -> jnp.ndarray:
    k = controls_tak.shape[2]
    na = controls_tak.shape[1]
    inv_dt = 1.0 / (model.timestep * frame_skip)
    if family == "locomotion":
        trk = _TRACKS[track]
        n_carry = 1

        def carry_fn(q4, lam):
            return (trk(q4),)

        def reward_fn(prev, new, acts, q_new):
            r = healthy + (new[0] - prev[0]) * (fwd_w * inv_dt)
            for a in acts:
                r = r - ctrl_w * (a * a)
            return r

    else:
        n_carry, raw_carry, make_reward = _FAMILIES[family]
        carry_fn = _normalized(raw_carry)
        reward_fn = make_reward(healthy, fwd_w * inv_dt, ctrl_w)
    n_state = model.n_q + model.n_dof + n_carry

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

    # The scalar-sparse QP (only the ~45% structurally nonzero J entries
    # emitted) halves the Mosaic kernel's per-CG-iteration VPU work and
    # its live J footprint; interpret mode keeps the dense stacked form —
    # the sparse scalar graph is what made XLA CPU compiles take tens of
    # minutes (spatial_contact.py module docstring). Cross-form equality
    # is pinned in tests/test_spatial_kernel.py.
    advance = _spatial_advance(
        model, frame_skip, outer, cg, actuators, rk4_loop=rk4_loop,
        qp_dense=interpret or not qp_sparse,
    )
    kernel = _make_kernel(
        model.n_q, model.n_dof, na, advance, horizon, n_carry, carry_fn,
        reward_fn, block_k,
    )
    # Output is (grid, s_sub, LANES) with a FULL (s_sub, LANES) tail per
    # block: the Mosaic lowering requires the block's last two dims to be
    # (8k, 128)-divisible OR equal to the array's — s_sub is 1..4 at the
    # per-model block_k choices, so only the equality form lowers.
    costs = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (k_pad // block_k, s_sub, LANES), jnp.float32
        ),
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
            (1, s_sub, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        # The 242-row Humanoid / 217-row Standup programs spill more live
        # vregs than XLA:TPU's default 16 MB scoped-vmem allowance
        # (measured stack: 36.1 MB / 18.7 MB at block 128); v5e VMEM is
        # 128 MB, so the per-model limit just raises the scheduler's
        # budget (round-3 Mosaic RESOURCE_EXHAUSTED fix).
        compiler_params=(
            pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            )
            if vmem_limit_mb
            else None
        ),
    )(state0, ctrl)
    return costs.reshape(-1)[:k]


_STATIC = (
    "model", "horizon", "frame_skip", "outer", "cg", "actuators",
    "family", "track", "healthy", "fwd_w", "ctrl_w", "block_k",
    "interpret", "vmem_limit_mb", "rk4_loop", "qp_sparse",
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
    family: str = "locomotion",
    track: str = "q0",
    healthy: float = 0.0,
    fwd_w: float = 1.0,
    ctrl_w: float = 0.0,
    block_k: int = 512,
    interpret: bool = False,
    vmem_limit_mb: int = 0,
    rk4_loop: bool = True,
    qp_sparse: bool = True,
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
        outer, cg, tuple(actuators), family, track, healthy, fwd_w,
        ctrl_w, block_k, interpret, vmem_limit_mb, rk4_loop, qp_sparse,
    )
