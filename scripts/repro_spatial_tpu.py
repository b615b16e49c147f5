"""Reproduce / bisect the Mosaic compile failure for the spatial fused
kernels on the real TPU (VERDICT r3 item 2: Pusher + Humanoid fail with
"Invalid relayout: Non-singleton logical dimension is replicated ...
vector<4x128xf32>"; Ant compiles).

Usage: python scripts/repro_spatial_tpu.py <task> [block_k]
  task in {ant, pusher, humanoid, standup}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "pusher"
    block_k = int(sys.argv[2]) if len(sys.argv) > 2 else 0

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
    print(f"devices: {jax.devices()}", file=sys.stderr)
    k, horizon = 512, 4
    rng = np.random.default_rng(0)
    ctrl = jnp.asarray(
        rng.uniform(-0.3, 0.3, (horizon, env.action_dim, k)), dtype=jnp.float32
    )
    state = env.reset()
    kwargs = {}
    if block_k:
        import mpopis_tpu.kernels.spatial_step as ss

        orig = ss.spatial_rollout_costs_tak

        def patched(*a, **kw):
            kw["block_k"] = block_k
            return orig(*a, **kw)

        ss.spatial_rollout_costs_tak = patched
    t0 = time.time()
    try:
        costs = env.fused_rollout_costs_tak(state, ctrl)
        costs.block_until_ready()
        print(
            f"OK {task} block_k={block_k or 'default'}: "
            f"compile+run {time.time()-t0:.1f}s, "
            f"costs[:3]={np.asarray(costs[:3])}",
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        print(f"FAIL {task} block_k={block_k or 'default'} after "
              f"{time.time()-t0:.1f}s:", file=sys.stderr)
        print(msg[:4000], file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
