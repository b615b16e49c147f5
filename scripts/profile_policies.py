"""Per-policy TPU step cost at the flagship config (K=8192, H=50).

Slope-based timing (see bench.py): per-step time is the slope between a
5-step and a 25-step chained MPC run, each ending in a forced host
transfer, which cancels the relay's fixed dispatch/transfer latency.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models import CarRacingEnv
from mpopis_tpu.policies import PolicyConfig, make_policy

K, H = 8192, 50


def measure(kind: str, opt_its: int, **cfg_kw) -> float:
    env = CarRacingEnv(dtype=jnp.float32)
    cfg = PolicyConfig(kind=kind, num_samples=K, horizon=H, lam=10.0,
                       opt_its=opt_its, ce_elite_threshold=0.8, sigma_est="ss",
                       **cfg_kw)
    pol = make_policy(env, cfg, cov_mat=np.diag([0.0625, 0.1]), jit=False)

    @jax.jit
    def full(carry):
        s, ps = carry
        a, ps, _ = pol.step(s, ps)
        return env.step(s, a), ps

    def run(n):
        x = (env.reset(), pol.init_state(0))
        t0 = time.perf_counter()
        for _ in range(n):
            x = full(x)
        _ = np.asarray(x[0].x)
        return time.perf_counter() - t0

    run(3)  # warmup/compile
    t5 = min(run(5) for _ in range(2))
    t25 = min(run(25) for _ in range(2))
    return (t25 - t5) / 20


def main():
    for kind, its, kw in [
        ("mppi", 1, {}), ("gmppi", 1, {}), ("imppi", 10, {}),
        ("cemppi", 10, {}), ("cmamppi", 10, {}),
        ("cmamppi", 10, {"cma_fast_sqrt": True}),
        ("muaismppi", 10, {}), ("musigmaaismppi", 10, {}),
        ("pmcmppi", 10, {}), ("nesmppi", 10, {}),
    ]:
        dt = measure(kind, its, **kw)
        tag = kind + ("+fast_sqrt" if kw.get("cma_fast_sqrt") else "")
        print(f"{tag:22s} its={its:2d}  {dt*1e3:7.2f} ms/step  "
              f"{1/dt:7.1f} steps/s", flush=True)


if __name__ == "__main__":
    main()
