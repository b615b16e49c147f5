"""A/B the RK4 stage-loop form of the spatial kernel on the real TPU.

The 4x-unrolled RK4 spills ~36 MB of live vregs on the 242-row humanoid
(round-3 vmem OOM; round-4 runs at 17k env-steps/s with a raised vmem
budget). The fori_loop form (spatial_contact.py::rk4_substep_loop)
bounds the live window to one qacc body — this measures compile time,
correctness vs the unrolled form, and throughput for both forms, going
through the env's own fused_rollout_costs_tak (so model-specific tracks
and reward families are registered exactly as in production).

Usage: python scripts/ab_rk4_loop.py {ant,humanoid,standup} [K] [H]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(task: str, k: int, horizon: int):
    import jax
    import jax.numpy as jnp

    import mpopis_tpu.kernels.spatial_step as ss

    if task == "ant":
        from mpopis_tpu.models import AntDeviceEnv as E
    elif task == "humanoid":
        from mpopis_tpu.models import HumanoidDeviceEnv as E
    elif task == "standup":
        from mpopis_tpu.models import HumanoidStandupDeviceEnv as E
    else:
        raise SystemExit(f"unknown task {task}")

    env = E(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ctrl = jnp.asarray(
        rng.uniform(-0.3, 0.3, (horizon, env.action_dim, k)),
        dtype=jnp.float32,
    )
    s0 = env.reset()

    orig = ss.spatial_rollout_costs_tak
    results = {}
    for name, flag in (("unroll", False), ("loop", True)):

        def patched(*a, _flag=flag, **kw):
            kw["rk4_loop"] = _flag
            return orig(*a, **kw)

        ss.spatial_rollout_costs_tak = patched
        # env modules bind the symbol at call time via module attribute
        # lookup inside the method, so the patch takes effect per call.
        import importlib

        mod = importlib.import_module(type(env).__module__)
        if hasattr(mod, "spatial_rollout_costs_tak"):
            mod.spatial_rollout_costs_tak = patched

        fn = jax.jit(lambda c: env.fused_rollout_costs_tak(s0, c))
        t0 = time.time()
        costs = np.asarray(fn(ctrl))
        compile_s = time.time() - t0
        results[name] = costs

        @jax.jit
        def chain(t, fn=fn):
            c = ctrl + t
            return t + jnp.sum(fn(c)) * 1e-20

        zero = jnp.float32(0.0)
        np.asarray(chain(zero))

        def run(n):
            t = zero
            t0 = time.perf_counter()
            for _ in range(n):
                t = chain(t)
            np.asarray(t)
            return time.perf_counter() - t0

        n_s, n_l = 3, 13
        per = min(
            (run(n_l) - run(n_s)) / (n_l - n_s) for _ in range(3)
        )
        rate = k * horizon / per
        print(
            f"{task:9s} {name:6s} compile={compile_s:6.1f}s  "
            f"ms/call={1e3 * per:8.2f}  env-steps/s={rate:12.0f}  "
            f"costs[:2]={costs[:2]}",
            flush=True,
        )
    ss.spatial_rollout_costs_tak = orig
    d = np.max(np.abs(results["unroll"] - results["loop"]))
    rel = d / max(1e-9, float(np.max(np.abs(results["unroll"]))))
    print(f"{task}: max |unroll - loop| = {d:.3e} (rel {rel:.2e})", flush=True)


if __name__ == "__main__":
    t = sys.argv[1] if len(sys.argv) > 1 else "ant"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else (512 if t != "ant" else 1024)
    h = int(sys.argv[3]) if len(sys.argv) > 3 else (8 if t != "ant" else 10)
    main(t, k, h)
