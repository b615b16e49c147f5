"""Ladder bisect: grow the euler substep from trivial to full physics.

  L0 — q2 = q + h*qv; qv2 = qv + h*tau; lam passthrough
  L1 — + frames/mass/chol/bias smooth dynamics (no QP)
  L2 — + contact_rows + solve_qp_dense (no implicit damping)
  L3 — full euler (== plain)
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
from mpopis_tpu.models import spatial_contact as sc  # noqa: E402
from mpopis_tpu.models import pusher_device as P  # noqa: E402


def tpu_sharding():
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1",
        chips_per_host_bounds=[1, 1, 1],
    )
    return SingleDeviceSharding(topo.devices[0])


def build_level(model, level):
    n = model.n_dof
    h = model.timestep

    def substep(q, qv, tau, outer, cg, lam0=None):
        q = sc.normalize_quat(q, model)
        if level == 0:
            qv2 = tuple(qv[d] + h * tau[d] for d in range(n))
            q2 = sc.integrate_pos(model, q, qv2, h)
            return q2, qv2, lam0, q
        fr = sc.frames(model, q)
        m = sc.mass_entries_analytic(model, q, fr)
        l = sc.chol_unrolled(m, n)
        b = sc.bias_analytic(model, q, qv, fr)
        smooth = [
            tau[d] - b[d] - model.damping[d] * qv[d] for d in range(n)
        ]
        a_smooth = sc.chol_solve_unrolled(l, smooth, n)
        if level == 1:
            acc = a_smooth
            lam = lam0
        else:
            zero = jnp.zeros_like(q[0])
            rows = sc.contact_rows(model, q, qv, zero, fr)
            qfrc_c, lam = sc.solve_qp_dense(
                rows, zero, l, a_smooth, outer, cg, n, lam0=lam0,
                return_lam=True,
            )
            if level == 2:
                ld = l
            else:
                md = [[m[i][j] for j in range(i + 1)] for i in range(n)]
                for d in range(n):
                    md[d][d] = md[d][d] + h * model.damping[d]
                ld = sc.chol_unrolled(md, n)
            acc = sc.chol_solve_unrolled(
                ld, [smooth[d] + qfrc_c[d] for d in range(n)], n
            )
        qv2 = tuple(qv[d] + h * acc[d] for d in range(n))
        q2 = sc.integrate_pos(model, q, qv2, h)
        return q2, qv2, lam, q2

    return substep


def probe(level):
    model = P.MODEL
    acts = P._ACTUATORS
    orig = ss.build_spatial_stepper

    def patched(m, unroll_rk4=False):
        return (build_level(m, level),)

    ss.build_spatial_stepper = patched
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
            print(f"OK   L{level}: {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001
            first = str(e).split("\n")[0][:160]
            print(f"FAIL L{level}: {time.time()-t0:.1f}s: {first}")
    finally:
        ss.build_spatial_stepper = orig
        ss._impl_device = functools.partial(
            jax.jit, static_argnames=ss._STATIC
        )(ss._spatial_rollout_impl)


if __name__ == "__main__":
    for lv in [int(a) for a in sys.argv[1:]] or [0, 1, 2, 3]:
        probe(lv)
