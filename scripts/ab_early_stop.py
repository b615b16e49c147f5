"""Same-process A/B of AIS early stop actually SKIPPING rollouts.

Round 3 masked the carry after `stop` but still paid for the
roofline-bound rollout on every scan iteration; the driver now routes
each iteration through `lax.cond(carry.done, identity, live)` so a
converged policy skips the remaining iterations' arithmetic entirely
(VERDICT r3 item 5; the reference breaks out of its host loop,
mppi_mpopi_policies.jl:459-461).

This measures CEMPPI end-to-end MPC steps/s at three stop tolerances in
one process (relay noise between processes is +-15%, BENCH.md round 2):

  never  — elite_stop_tol=0.0: max|diff(elites)| < 0 is always false,
           all opt_its iterations run (the round-3 cost for every step)
  ref    — the reference literal 1e-2 (mppi_mpopi_policies.jl:459-461
           `10e-3`): stops only when elites actually converge
  always — elite_stop_tol=1e9: stop fires after iteration 1, so
           iterations 2..N should cost (nearly) nothing if the cond
           really skips the rollout

If the branch works, `always` approaches opt_its x the `never` rate;
before this change all three measured the same.

Usage: python scripts/ab_early_stop.py [K] [H] [opt_its]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(k_samples=8192, horizon=50, opt_its=10):
    import jax
    import jax.numpy as jnp

    from mpopis_tpu.models import CarRacingEnv
    from mpopis_tpu.policies import PolicyConfig, make_policy
    from mpopis_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    env = CarRacingEnv(dtype=jnp.float32)

    def build(tol):
        cfg = PolicyConfig(
            kind="cemppi", num_samples=k_samples, horizon=horizon,
            lam=10.0, alpha=1.0, opt_its=opt_its, ce_elite_threshold=0.8,
            sigma_est="ss", elite_stop_tol=tol,
        )
        pol = make_policy(env, cfg, cov_mat=np.diag([0.0625, 0.1]), jit=False)

        @jax.jit
        def step(s, ps):
            a, ps, _ = pol.step(s, ps)
            return env.step(s, a), ps

        return pol, step

    def chain(pol, step, n):
        s, ps = env.reset(), pol.init_state(1)
        t0 = time.perf_counter()
        for _ in range(n):
            s, ps = step(s, ps)
        np.asarray(s.x)
        return time.perf_counter() - t0

    results = {}
    for name, tol in (("never", 0.0), ("ref", 1e-2), ("always", 1e9)):
        pol, step = build(tol)
        t0 = time.perf_counter()
        chain(pol, step, 1)  # compile
        compile_s = time.perf_counter() - t0
        chain(pol, step, 2)  # warm
        t = min(chain(pol, step, 20) for _ in range(3)) / 20
        results[name] = 1.0 / t
        print(
            f"{name:6s} tol={tol:8.0e}  steps/s={1.0 / t:7.1f}  "
            f"ms/step={1e3 * t:6.2f}  compile={compile_s:.1f}s",
            flush=True,
        )
    print(
        f"early-stop speedup: always/never x{results['always'] / results['never']:.2f} "
        f"(upper bound ~x{opt_its} at zero branch cost), "
        f"ref/never x{results['ref'] / results['never']:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    its = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(k, h, its)
