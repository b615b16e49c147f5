"""Same-process A/B of the fused AIS-update kernels on the TPU.

Methodology (BENCH.md round 2): relay noise between processes is +-15%,
so only same-process comparisons and opt_its-scaling slopes are
trustworthy. For each policy kind this builds fused and unfused policies
at opt_its=10 and opt_its=40, times n-step MPC chains, and reports both
the end-to-end steps/s at opt_its=10 and the per-AIS-iteration slope
(t40 - t10)/30.

Usage: python scripts/ab_fused_update.py [cemppi|cmamppi|all] [K] [H]

K/H override the headline shape (8192, 50) — e.g. `cemppi 512 200`
probes the large-cs/small-K crossover shape (VERDICT r3 item 7).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(kinds, k_samples=8192, horizon=50):
    import jax
    import jax.numpy as jnp

    from mpopis_tpu.models import CarRacingEnv
    from mpopis_tpu.policies import PolicyConfig, make_policy
    from mpopis_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    env = CarRacingEnv(dtype=jnp.float32)

    def build(kind, its):
        cfg = PolicyConfig(
            kind=kind, num_samples=k_samples, horizon=horizon, lam=10.0, alpha=1.0,
            opt_its=its, ce_elite_threshold=0.8, sigma_est="ss",
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

    def measure(kind, fused: bool):
        os.environ["MPOPIS_FUSED_UPDATE"] = "1" if fused else "0"
        p10, s10 = build(kind, 10)
        p40, s40 = build(kind, 40)
        t0 = time.perf_counter()
        chain(p10, s10, 1)
        compile_s = time.perf_counter() - t0
        chain(p40, s40, 1)
        chain(p10, s10, 2)
        t10 = min(chain(p10, s10, 20) for _ in range(3)) / 20
        t40 = min(chain(p40, s40, 20) for _ in range(3)) / 20
        per_it = (t40 - t10) / 30.0
        print(
            f"{kind:8s} fused={int(fused)}  steps/s(its=10)={1.0 / t10:7.1f}  "
            f"ms/step={1e3 * t10:6.2f}  ms/AIS-it={1e3 * per_it:6.3f}  "
            f"compile={compile_s:.1f}s",
            flush=True,
        )
        return 1.0 / t10, per_it

    for kind in kinds:
        r_f = measure(kind, True)
        r_u = measure(kind, False)
        print(
            f"{kind}: fused speedup x{r_f[0] / r_u[0]:.2f} end-to-end, "
            f"x{r_u[1] / r_f[1]:.2f} per-iteration",
            flush=True,
        )


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    main(["cemppi", "cmamppi"] if arg == "all" else [arg], k, h)
