"""Sweep the fused spatial kernel's K-tile (block_k) on the real TPU.

block_k trades per-program parallelism (more lanes per Mosaic program →
better VPU issue amortization over the scalar-heavy QP) against live
vreg pressure (the (n_rows, n_dof) row-Jacobian stack and the RK carry
scale linearly with the tile) and compile time. The per-model defaults
(ant/pusher 512, humanoid/standup 128) come from this sweep.

Measures per block size: compile seconds, in-graph chain-slope ms/call
(the bench.py roofline methodology — cancels relay dispatch), and
env-steps/s, through the env's own fused_rollout_costs_tak.

Usage: python scripts/sweep_block_k.py {ant,pusher,humanoid,standup} \
           [K] [H] [block_k ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_ENVS = {
    "ant": ("AntDeviceEnv", 1024, 10),
    "pusher": ("PusherDeviceEnv", 1024, 10),
    "humanoid": ("HumanoidDeviceEnv", 512, 8),
    "standup": ("HumanoidStandupDeviceEnv", 512, 8),
}


def main(task: str, k: int, horizon: int, blocks: list[int]):
    import jax
    import jax.numpy as jnp

    import mpopis_tpu.models as models

    cls = getattr(models, _ENVS[task][0])
    rng = np.random.default_rng(0)
    ref_costs = None
    for bk in blocks:
        env = cls(dtype=jnp.float32, block_k=bk)
        ctrl = jnp.asarray(
            rng.uniform(-0.3, 0.3, (horizon, env.action_dim, k)),
            dtype=jnp.float32,
        )
        s0 = env.reset()
        fn = jax.jit(lambda c, env=env, s0=s0: env.fused_rollout_costs_tak(s0, c))
        t0 = time.time()
        try:
            costs = np.asarray(fn(ctrl))
        except Exception as e:  # compile failure (vmem OOM etc.)
            msg = " ".join(str(e).split())[:120]
            print(f"{task:9s} block={bk:4d} FAILED: {msg}", flush=True)
            continue
        compile_s = time.time() - t0
        if ref_costs is None:
            ref_costs = costs
        d = float(np.max(np.abs(costs - ref_costs)))

        # in-graph chain slope: n serialized kernel calls in ONE program
        def chain(n):
            def body(t, _):
                c = ctrl + t
                t2 = t + jnp.sum(fn(c)) * 1e-20
                return t2, ()

            @jax.jit
            def run(t0):
                tn, _ = jax.lax.scan(body, t0, (), length=n)
                return tn

            return run

        short, long = 3, 13
        runs = {n: chain(n) for n in (short, long)}
        zero = jnp.float32(0.0)
        for r in runs.values():
            np.asarray(r(zero))  # compile

        def t_of(n):
            t0 = time.perf_counter()
            np.asarray(runs[n](zero))
            return time.perf_counter() - t0

        # min over repeats PER chain length, then ONE slope: min-of-slopes
        # can go non-positive under relay jitter (a slow short-chain run)
        # and biases the time low (ADVICE r4)
        t_short = min(t_of(short) for _ in range(3))
        t_long = min(t_of(long) for _ in range(3))
        per = (t_long - t_short) / (long - short)
        if per <= 0.0:
            print(
                f"{task:9s} block={bk:4d} compile={compile_s:6.1f}s  "
                f"UNSTABLE slope ({1e3 * per:.2f} ms/call <= 0 under relay "
                f"jitter)  max|Δcosts|={d:.2e}",
                flush=True,
            )
            continue
        rate = k * horizon / per
        print(
            f"{task:9s} block={bk:4d} compile={compile_s:6.1f}s  "
            f"ms/call={1e3 * per:8.2f}  env-steps/s={rate:12.0f}  "
            f"max|Δcosts|={d:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    t = sys.argv[1] if len(sys.argv) > 1 else "ant"
    if t not in _ENVS or t in ("-h", "--help"):
        print(f"usage: python {sys.argv[0]} {{{','.join(_ENVS)}}} "
              "[K] [H] [block_k ...]", file=sys.stderr)
        raise SystemExit(0 if t in ("-h", "--help") else 2)
    try:
        k = int(sys.argv[2]) if len(sys.argv) > 2 else _ENVS[t][1]
        h = int(sys.argv[3]) if len(sys.argv) > 3 else _ENVS[t][2]
        blocks = [int(b) for b in sys.argv[4:]] or [128, 256, 512]
    except ValueError as exc:
        print(f"bad numeric argument: {exc}\nusage: python {sys.argv[0]} "
              f"{{{','.join(_ENVS)}}} [K] [H] [block_k ...]", file=sys.stderr)
        raise SystemExit(2)
    main(t, k, h, blocks)
