"""Bisect the Pusher Mosaic relayout failure: AOT-compile the spatial
kernel on the pusher MODEL with individual deltas toggled."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import SingleDeviceSharding  # noqa: E402


def tpu_sharding():
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1",
        chips_per_host_bounds=[1, 1, 1],
    )
    return SingleDeviceSharding(topo.devices[0])


def probe(tag, model, family, n_carry_state, actuators, **kw):
    from mpopis_tpu.kernels.spatial_step import spatial_rollout_costs_tak

    sh = tpu_sharding()
    n_state = model.n_q + model.n_dof + n_carry_state
    x_spec = jax.ShapeDtypeStruct((n_state,), jnp.float32, sharding=sh)
    c_spec = jax.ShapeDtypeStruct((2, len(actuators), 256), jnp.float32,
                                  sharding=sh)

    def f(x, c):
        return spatial_rollout_costs_tak(
            model, x, c, frame_skip=2, outer=1, cg=2, actuators=actuators,
            family=family, **kw,
        )

    t0 = time.time()
    try:
        jax.jit(f).lower(x_spec, c_spec).compile()
        print(f"OK   {tag}: {time.time()-t0:.1f}s")
        return True
    except Exception as e:  # noqa: BLE001
        first = str(e).split("\n")[0][:160]
        print(f"FAIL {tag}: {time.time()-t0:.1f}s: {first}")
        return False


def main():
    which = sys.argv[1:] or ["family", "integrator", "pairs", "condim"]
    from mpopis_tpu.models import pusher_device as P

    model = P.MODEL
    acts = P._ACTUATORS

    if "family" in which:
        # pusher model, locomotion family (track q0): isolates the family
        probe("pusher+locomotion", model, "locomotion", 1, acts,
              track="q0", healthy=0.0, fwd_w=1.0, ctrl_w=0.1)
    if "pusherfam" in which:
        from mpopis_tpu.kernels.spatial_step import register_family

        register_family("pusher", 9, P._pusher_carry, P._make_pusher_reward)
        probe("pusher+pusherfam", model, "pusher", 9, acts, ctrl_w=0.1)
    if "integrator" in which:
        # pusher model forced to RK4: isolates euler_implicit
        m_rk4 = dataclasses.replace(model, integrator="rk4")
        probe("pusher-rk4+locomotion", m_rk4, "locomotion", 1, acts,
              track="q0", healthy=0.0, fwd_w=1.0, ctrl_w=0.1)
    if "pairs" in which:
        m_np = dataclasses.replace(model, pairs=())
        probe("pusher-nopairs+locomotion", m_np, "locomotion", 1, acts,
              track="q0", healthy=0.0, fwd_w=1.0, ctrl_w=0.1)
    if "condim" in which:
        # contacts forced to condim 3 (ant-style cones)
        c3 = tuple(dataclasses.replace(c, condim=3) for c in model.contacts)
        m_c3 = dataclasses.replace(model, contacts=c3, pairs=())
        probe("pusher-condim3-nopairs", m_c3, "locomotion", 1, acts,
              track="q0", healthy=0.0, fwd_w=1.0, ctrl_w=0.1)
    if "nocontact" in which:
        m_nc = dataclasses.replace(model, contacts=(), pairs=())
        probe("pusher-nocontacts", m_nc, "locomotion", 1, acts,
              track="q0", healthy=0.0, fwd_w=1.0, ctrl_w=0.1)
    if "nolimit" in which:
        m_nl = dataclasses.replace(model, limits=())
        probe("pusher-nolimits", m_nl, "locomotion", 1, acts,
              track="q0", healthy=0.0, fwd_w=1.0, ctrl_w=0.1)
    if "gravity" in which:
        m_g = dataclasses.replace(model, gravity=-9.81)
        probe("pusher+gravity", m_g, "locomotion", 1, acts,
              track="q0", healthy=0.0, fwd_w=1.0, ctrl_w=0.1)


if __name__ == "__main__":
    main()
