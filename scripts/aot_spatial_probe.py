"""AOT-compile the spatial fused kernels through the FULL Mosaic
pipeline locally (jax.experimental.topologies + the local libtpu), no
TPU chip or relay needed. This is the bisect harness for VERDICT r3
item 2 (Pusher/Humanoid/Standup "Invalid relayout" Mosaic failures).

Usage: python scripts/aot_spatial_probe.py <task> [block_k] [K] [T]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import SingleDeviceSharding  # noqa: E402


def tpu_device():
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1",
        chips_per_host_bounds=[1, 1, 1],
    )
    return topo.devices[0]


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "pusher"
    block_k = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    horizon = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    if task == "ant":
        from mpopis_tpu.models.ant_device import AntDeviceEnv as E
    elif task == "pusher":
        from mpopis_tpu.models.pusher_device import PusherDeviceEnv as E
    elif task == "humanoid":
        from mpopis_tpu.models.humanoid_device import HumanoidDeviceEnv as E
    elif task == "standup":
        from mpopis_tpu.models.humanoidstandup_device import (
            HumanoidStandupDeviceEnv as E,
        )
    else:
        raise SystemExit(f"unknown task {task}")

    env = E(dtype=jnp.float32)
    dev = tpu_device()
    sh = SingleDeviceSharding(dev)
    x_spec = jax.ShapeDtypeStruct((env.state_dim,), jnp.float32, sharding=sh)
    c_spec = jax.ShapeDtypeStruct(
        (horizon, env.action_dim, k), jnp.float32, sharding=sh
    )
    kwargs = {}
    if block_k:
        import mpopis_tpu.kernels.spatial_step as ss

        orig = ss.spatial_rollout_costs_tak

        def patched(*a, **kw):
            kw["block_k"] = block_k
            return orig(*a, **kw)

        ss.spatial_rollout_costs_tak = patched

    from mpopis_tpu.models.base import make_state

    def f(x, c):
        return env.fused_rollout_costs_tak(make_state(x), c)

    t0 = time.time()
    try:
        jax.jit(f).lower(x_spec, c_spec).compile()
        print(f"OK {task} block_k={block_k or 'default'} K={k} T={horizon}: "
              f"Mosaic compile {time.time()-t0:.1f}s")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {task} block_k={block_k or 'default'} K={k} "
              f"T={horizon} after {time.time()-t0:.1f}s:", file=sys.stderr)
        print(str(e)[:3000], file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
