"""Decompose the CEMPPI AIS-iteration cost on TPU (same-process).

Each component is wrapped in a jitted lax.scan over ITS iterations with a
data dependency so it can't be elided, then slope-timed against a
2xITS-scan (cancels dispatch). Components at K=8192, cs=100:
  sample  : z = normal(cs,K); e = chol @ z
  rollout : fused car rollout kernel on clamped (T,a,K) controls
  sortmask: sort(costs) + elite threshold/tie mask + mu
  refit_x : unfused masked shrinkage refit + jitter + XLA cholesky
  refit_k : fused masked_refit_chol Pallas kernel
  weights : information-theoretic weights (per-step, not per-iter)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpopis_tpu.kernels.ais_update import masked_refit_chol
    from mpopis_tpu.models import CarRacingEnv
    from mpopis_tpu.ops.covariance import shrinkage_cov_masked
    from mpopis_tpu.policies.strategies import _jittered
    from mpopis_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cs, k, m, its = 100, 8192, 1638, 10
    dtype = jnp.float32
    env = CarRacingEnv(dtype=dtype)
    s0 = env.reset()
    rng = np.random.default_rng(0)
    chol0 = jnp.asarray(np.linalg.cholesky(
        np.diag(rng.uniform(0.05, 0.2, cs))).astype(np.float32))
    e0 = jnp.asarray(rng.normal(size=(cs, k)).astype(np.float32))
    costs0 = jnp.asarray(rng.normal(size=(k,)).astype(np.float32) ** 2)
    key0 = jax.random.PRNGKey(0)

    def scan_of(fn, carry0, n):
        @jax.jit
        def run(c):
            out, _ = jax.lax.scan(lambda c, _: (fn(c), None), c,
                                  jnp.arange(n))
            return out
        return run

    def leaf(x):
        return jax.tree_util.tree_leaves(x)[0]

    def slope_ms(fn_builder, carry0):
        r1 = scan_of(fn_builder, carry0, its)
        r2 = scan_of(fn_builder, carry0, 2 * its)
        np.asarray(leaf(r1(carry0)))
        np.asarray(leaf(r2(carry0)))

        def t(run):
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(leaf(run(carry0)))
                best = min(best, time.perf_counter() - t0)
            return best

        return 1e3 * (t(r2) - t(r1)) / its

    # sample: key split + normal + chol matmul
    def f_sample(c):
        key, e = c
        key, k2 = jax.random.split(key)
        z = jax.random.normal(k2, (cs, k), dtype)
        return key, chol0 @ z + 1e-12 * e

    print(f"sample   {slope_ms(f_sample, (key0, e0)):7.3f} ms/it", flush=True)

    # rollout: fused car kernel
    ctrl0 = jnp.asarray(rng.uniform(-1, 1, (50, 2, k)).astype(np.float32))

    def f_rollout(c):
        costs = env.fused_rollout_costs_tak(s0, c)
        return c + costs[None, None, :] * 1e-12

    print(f"rollout  {slope_ms(f_rollout, ctrl0):7.3f} ms/it", flush=True)

    # sortmask (+ mu matvec)
    def f_sortmask(c):
        costs, e = c
        sorted_costs = jnp.sort(costs)
        elite = sorted_costs[:m]
        stop = jnp.max(jnp.abs(jnp.diff(elite))) < 1e-2
        thresh = sorted_costs[m - 1]
        lt = costs < thresh
        tie = costs == thresh
        n_take = m - jnp.sum(lt, dtype=jnp.int32)
        tie_rank = jnp.cumsum(tie.astype(jnp.int32))
        mask = (lt | (tie & (tie_rank <= n_take))).astype(costs.dtype)
        mu = (e @ mask) / m
        return costs + mu[0] * 1e-12 + stop * 0.0, e

    print(f"sortmask {slope_ms(f_sortmask, (costs0, e0)):7.3f} ms/it",
          flush=True)

    mask0 = jnp.zeros((k,), dtype).at[:m].set(1.0)
    mu0 = (e0 @ mask0) / m

    # unfused refit chain
    def f_refit_x(c):
        e, l = c
        sigma = _jittered(shrinkage_cov_masked(e, mask0, m, "ss"), 1e-8)
        l2 = jnp.linalg.cholesky(sigma)
        return e + l2[0, 0] * 1e-12, l2

    print(f"refit_x  {slope_ms(f_refit_x, (e0, chol0)):7.3f} ms/it",
          flush=True)

    # fused kernel
    def f_refit_k(c):
        e, l = c
        l2 = masked_refit_chol(e, mask0, mu0, m, "ss", 1e-8)
        return e + l2[0, 0] * 1e-12, l2

    print(f"refit_k  {slope_ms(f_refit_k, (e0, chol0)):7.3f} ms/it",
          flush=True)

    # per-estimator fused kernel cost
    for est in ("mle", "lw", "rblw"):
        def f_est(c, est=est):
            e, l = c
            l2 = masked_refit_chol(e, mask0, mu0, m, est, 1e-8)
            return e + l2[0, 0] * 1e-12, l2

        print(f"refit_k[{est:4s}] {slope_ms(f_est, (e0, chol0)):7.3f} ms/it",
              flush=True)


if __name__ == "__main__":
    main()
