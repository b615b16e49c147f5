"""Fused SPATIAL-contact rollout kernel (kernels/spatial_step.py) vs the
vmap oracle — the 3D sibling of tests/test_planar_kernel.py.

The kernel body traces the same generic substep the XLA/vmap path uses
(models/spatial_contact.build_spatial_stepper), so interpret-mode
equality against rollout_batch over env.step_reward is the semantic pin
for the whole in-kernel pipeline: quaternion FK, analytic 3D mass/bias,
pyramidal-cone + self-collision QP, unrolled RK4, and the stage-4
reward-track carry (Ant torso x / Humanoid mass-weighted com x).

Interpret mode compiles the kernel body as one scalar XLA CPU graph via
utils/fastjit.fast_jit (the default LLVM pipeline takes ~an hour on the
unrolled-RK4 spatial substep); the persistent compilation cache makes
reruns start in seconds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mpopis_tpu.models import (
    AntDeviceEnv,
    HumanoidDeviceEnv,
    PusherDeviceEnv,
)
from mpopis_tpu.models.rollout import rollout_batch


def _kernel_vs_oracle(env, k, t, seed, atol, drop=None):
    assert env.supports_fused_rollout
    rng = np.random.default_rng(seed)
    controls = jnp.asarray(
        rng.uniform(-1.0, 1.0, (k, t, env.action_dim)) * env.action_high,
        dtype=jnp.float32,
    )
    s0 = env.reset()
    if drop is not None:  # start lower so floor contacts fire immediately
        s0 = s0.replace(x=s0.x.at[2].add(drop))
    oracle, _ = rollout_batch(env, s0, controls, log_states=False)
    got = env.fused_rollout_costs(s0, controls)
    assert got.shape == (k,)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(oracle), rtol=2e-4, atol=atol
    )


@pytest.mark.slow
def test_ant_fused_rollout_matches_vmap_oracle():
    """Interpret-mode kernel == rollout_batch over env.step_reward (f32).

    Ant's qpos0 starts with the ankle limits violated, so limit rows are
    active from step one; frame_skip 5 drops the torso enough that the
    floor cones fire within the horizon too.
    """
    env = AntDeviceEnv(dtype=jnp.float32, fused_interpret=True,
                       solver_outer=1, solver_cg=2)
    _kernel_vs_oracle(env, k=5, t=2, seed=3, atol=2e-4)


@pytest.mark.slow
def test_ant_fused_rollout_grounded():
    """Torso dropped to z=0.3: leg spheres start in deep floor contact —
    the in-kernel 3D-cone QP path must match the oracle, not just the
    flight/limit phase."""
    env = AntDeviceEnv(dtype=jnp.float32, fused_interpret=True,
                       solver_outer=1, solver_cg=2)
    _kernel_vs_oracle(env, k=4, t=2, seed=11, atol=2e-3, drop=-0.45)


@pytest.mark.slow
def test_pusher_fused_rollout_matches_vmap_oracle():
    """The 'pusher' reward family: the kernel carries the 9-entry stale
    xpos snapshot (tips/object/goal) and reads the PREVIOUS step's
    snapshot for the distance costs — gym's pre-step data.xpos
    semantics. T=3 crosses at least one snapshot handoff."""
    env = PusherDeviceEnv(dtype=jnp.float32, fused_interpret=True,
                          solver_outer=1, solver_cg=2)
    _kernel_vs_oracle(env, k=5, t=3, seed=5, atol=2e-4)


@pytest.mark.slow
def test_humanoid_fused_rollout_matches_vmap_oracle():
    """The 242-row Humanoid program (floor cones + frictionless
    self-collision + limits) through the same kernel builder; the com-x
    reward track is the registered 'humanoid_com_x' hook. Marked slow:
    the interpret-mode scalar graph is the largest in the repo."""
    env = HumanoidDeviceEnv(dtype=jnp.float32, fused_interpret=True,
                            solver_outer=1, solver_cg=2)
    _kernel_vs_oracle(env, k=3, t=1, seed=7, atol=2e-3)


@pytest.mark.slow
def test_standup_fused_rollout_matches_vmap_oracle():
    """The 'standup' family: in-kernel stage-4 cfrc_ext reconstruction
    (contact_force_ssq of the final substep's λ) feeding the
    min(0.5e-6·ssq, 10) impact cost — the supine init is contact-rich
    from step one, so the term is live. Marked slow like Humanoid."""
    from mpopis_tpu.models import HumanoidStandupDeviceEnv

    env = HumanoidStandupDeviceEnv(dtype=jnp.float32, fused_interpret=True,
                                   solver_outer=1, solver_cg=2)
    _kernel_vs_oracle(env, k=3, t=1, seed=13, atol=2e-3)


@pytest.mark.slow
def test_qp_sparse_matches_dense_substep():
    """qp_dense=False — the Mosaic kernel's scalar-sparse QP
    (spatial_step.py real-TPU path) — shares _qp_iterate with the
    stacked-dense form the vmap oracle uses and must produce the same
    constrained substep to f64 reduction-order tolerance, on states
    with live floor contacts (Ant dropped onto the plane) and live
    pair rows (Pusher near the object)."""
    from mpopis_tpu.models import ant_device as ad
    from mpopis_tpu.models import pusher_device as pu
    from mpopis_tpu.models.spatial_contact import build_spatial_stepper

    rng = np.random.default_rng(7)
    for env, mod, drop in (
        (PusherDeviceEnv(dtype=jnp.float64), pu, None),
        (AntDeviceEnv(dtype=jnp.float64), ad, -0.45),
    ):
        model = mod.MODEL
        x = np.array(env.reset().x, dtype=np.float64, copy=True)
        if drop is not None:
            x[2] += drop
        q = tuple(jnp.float64(v) for v in x[: model.n_q])
        qv = tuple(
            jnp.float64(v)
            for v in 0.3 * rng.standard_normal(model.n_dof)
        )
        tau = tuple(
            jnp.float64(v)
            for v in 0.5 * rng.standard_normal(model.n_dof)
        )
        sub_d, *_ = build_spatial_stepper(model, rk4_mode="loop",
                                          qp_dense=True)
        sub_s, *_ = build_spatial_stepper(model, rk4_mode="loop",
                                          qp_dense=False)
        out_d = sub_d(q, qv, tau, 3, 6, None)
        out_s = sub_s(q, qv, tau, 3, 6, None)
        if drop is not None:  # the dropped Ant must have live contacts
            assert float(jnp.max(jnp.abs(out_d[2]))) > 0.0
        for a, b in zip(out_d, out_s):
            np.testing.assert_allclose(
                np.asarray(jnp.stack(a) if isinstance(a, tuple) else a),
                np.asarray(jnp.stack(b) if isinstance(b, tuple) else b),
                rtol=1e-11, atol=1e-13,
            )
