"""Bisect the Mosaic relayout failure across the lax control-flow sites:
the _qp_iterate cond/fori structure and the frame_skip fori_loop.

Variants:
  plain      — unmodified (expected FAIL on pusher)
  nocond     — drop the contact-free lax.cond fast path
  unrollouter— python-unroll the outer active-set loop (keep cg fori)
  unrollcg   — python-unroll the cg loop (keep outer fori + cond)
  advunroll  — python-unroll the frame_skip loop in _spatial_advance
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import SingleDeviceSharding  # noqa: E402

import mpopis_tpu.kernels.spatial_step as ss  # noqa: E402
from mpopis_tpu.models import planar_contact as pc  # noqa: E402
from mpopis_tpu.models import pusher_device as P  # noqa: E402


def tpu_sharding():
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1",
        chips_per_host_bounds=[1, 1, 1],
    )
    return SingleDeviceSharding(topo.devices[0])


def make_qp_iterate(variant):
    orig = pc._qp_iterate

    def qp_iterate(ar_apply, rhs, valid, lam0, outer, cg):
        if lam0 is None:
            lam0 = jnp.zeros_like(rhs)
        else:
            lam0 = jnp.where(valid, lam0, 0.0)

        def outer_body(_i, lam):
            grad = ar_apply(lam) - rhs
            active = valid & ((lam > 0.0) | (grad < 0.0))
            x0 = jnp.where(active, lam, 0.0)

            def masked_ar(v):
                return jnp.where(
                    active, ar_apply(jnp.where(active, v, 0.0)), 0.0
                )

            r0 = jnp.where(active, rhs - ar_apply(x0), 0.0)

            def cg_body(_, carry):
                x, r, p, rs = carry
                ap = masked_ar(p)
                denom = jnp.sum(p * ap, axis=0)
                alpha = jnp.where(
                    denom > 1e-30, rs / jnp.maximum(denom, 1e-30), 0.0
                )
                x = x + alpha * p
                r = r - alpha * ap
                rs_new = jnp.sum(r * r, axis=0)
                beta = jnp.where(
                    rs > 1e-30, rs_new / jnp.maximum(rs, 1e-30), 0.0
                )
                p = r + beta * p
                return (x, r, p, rs_new)

            if variant == "unrollcg":
                carry = (x0, r0, r0, jnp.sum(r0 * r0, axis=0))
                for i in range(cg):
                    carry = cg_body(i, carry)
                x = carry[0]
            else:
                x, _, _, _ = jax.lax.fori_loop(
                    0, cg, cg_body, (x0, r0, r0, jnp.sum(r0 * r0, axis=0))
                )
            delta = jnp.where(active, x - lam, 0.0)
            best_f = 0.5 * jnp.sum(lam * grad, axis=0) - 0.5 * jnp.sum(
                rhs * lam, axis=0
            )
            best_lam = lam
            for t in (1.0, 0.5, 0.25, 0.1, 0.03, 0.01):
                lam_t = jnp.maximum(lam + t * delta, 0.0)
                g_t = masked_ar(lam_t)
                f_t = 0.5 * jnp.sum(lam_t * g_t, axis=0) - jnp.sum(
                    rhs * lam_t, axis=0
                )
                take = f_t < best_f
                best_f = jnp.where(take, f_t, best_f)
                best_lam = jnp.where(take, lam_t, best_lam)
            return best_lam

        if variant == "nocond":
            return jax.lax.fori_loop(0, outer, outer_body, lam0)
        if variant == "unrollouter":
            lam = lam0
            for i in range(outer):
                lam = outer_body(i, lam)
            return lam
        if variant == "unrollcg":
            zeros_lam = jnp.zeros_like(rhs)
            return jax.lax.cond(
                jnp.any(valid),
                lambda l0: jax.lax.fori_loop(0, outer, outer_body, l0),
                lambda l0: zeros_lam,
                lam0,
            )
        return orig(ar_apply, rhs, valid, lam0, outer, cg)

    return qp_iterate


def probe(variant):
    model = P.MODEL
    acts = P._ACTUATORS
    orig_qp = pc._qp_iterate
    orig_adv = ss._spatial_advance
    if variant in ("nocond", "unrollouter", "unrollcg"):
        pc._qp_iterate = make_qp_iterate(variant)
    if variant == "advunroll":
        def advance_unrolled(model, frame_skip, outer, cg, actuators):
            from mpopis_tpu.models.spatial_contact import build_spatial_stepper

            substep, *_ = build_spatial_stepper(model, unroll_rk4=True)
            na = len(actuators)

            def advance(q, qv, acts_):
                zero = jnp.zeros_like(q[0])
                tau = [zero] * model.n_dof
                for i in range(na):
                    dof, gear = actuators[i]
                    tau[dof] = gear * acts_[i]
                tau = tuple(tau)
                lam = jnp.zeros((model.n_rows,) + q[0].shape,
                                dtype=q[0].dtype)
                q4 = q
                for _ in range(frame_skip):
                    q, qv, lam, q4 = substep(q, qv, tau, outer, cg, lam)
                return q, qv, q4, lam

            return advance

        ss._spatial_advance = advance_unrolled
    try:
        sh = tpu_sharding()
        x_spec = jax.ShapeDtypeStruct((model.n_q + model.n_dof + 1,),
                                      jnp.float32, sharding=sh)
        c_spec = jax.ShapeDtypeStruct((2, len(acts), 256), jnp.float32,
                                      sharding=sh)

        def f(x, c):
            return ss.spatial_rollout_costs_tak(
                model, x, c, frame_skip=2, outer=1, cg=2, actuators=acts,
                family="locomotion", track="q0", healthy=0.0, fwd_w=1.0,
                ctrl_w=0.1,
            )

        t0 = time.time()
        try:
            jax.jit(f).lower(x_spec, c_spec).compile()
            print(f"OK   {variant}: {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001
            first = str(e).split("\n")[0][:160]
            print(f"FAIL {variant}: {time.time()-t0:.1f}s: {first}")
    finally:
        pc._qp_iterate = orig_qp
        ss._spatial_advance = orig_adv
        ss._impl_device = functools.partial(
            jax.jit, static_argnames=ss._STATIC
        )(ss._spatial_rollout_impl)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["nocond", "unrollouter", "unrollcg",
                              "advunroll"]:
        probe(v)
