"""Microbenchmark the AIS-update building blocks at the flagship scale
(K=8192, cs=100) on the TPU — the denominator work for VERDICT round-2
item 3 (the CEMPPI step is ~5 ms of which the rollout kernel is 0.35 ms;
where do the other ~4.7 ms go?).

Slope-timed chained ops (each iteration's output feeds the next), forced
final transfer — same methodology as bench.py.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

K, CS = 8192, 100
M_ELITE = int(round(K * 0.2))


def slope(fn, state0, n_short=10, n_long=60, reps=2):
    def run(n):
        s = state0
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s)
        jax.tree.map(lambda x: np.asarray(x), s)
        return time.perf_counter() - t0

    run(3)
    ts = min(run(n_short) for _ in range(reps))
    tl = min(run(n_long) for _ in range(reps))
    return (tl - ts) / (n_long - n_short)


def main():
    rng = np.random.default_rng(0)
    costs = jnp.asarray(rng.normal(size=(K,)), dtype=jnp.float32)
    e = jnp.asarray(rng.normal(size=(CS, K)), dtype=jnp.float32)
    a = rng.normal(size=(CS, CS)).astype(np.float32) * 0.1
    sigma = jnp.asarray(a @ a.T + np.eye(CS, dtype=np.float32))
    z = jnp.asarray(rng.normal(size=(CS, K)), dtype=jnp.float32)

    # 1. top_k of K=8192 (m_elite=1638)
    @jax.jit
    def f_topk(c):
        neg, idx = jax.lax.top_k(-c, M_ELITE)
        return c + neg[0] * 1e-9  # chain

    print(f"top_k(K={K}, m={M_ELITE}):      {slope(f_topk, costs)*1e3:7.3f} ms")

    # 1b. full sort for comparison
    @jax.jit
    def f_sort(c):
        s = jnp.sort(c)
        return c + s[0] * 1e-9

    print(f"sort(K={K}):                 {slope(f_sort, costs)*1e3:7.3f} ms")

    # 2. gather of elite columns (cs, m)
    @jax.jit
    def f_gather(c):
        _, idx = jax.lax.top_k(-c, M_ELITE)
        elite = e[:, idx]
        return c + jnp.sum(elite) * 1e-12

    print(f"top_k+gather (cs={CS}):       {slope(f_gather, costs)*1e3:7.3f} ms")

    # 3. shrinkage refit (ss) on (m, cs)
    from mpopis_tpu.ops.covariance import shrinkage_cov

    x = jnp.asarray(rng.normal(size=(M_ELITE, CS)), dtype=jnp.float32)

    @jax.jit
    def f_refit(x_):
        s = shrinkage_cov(x_, "ss")
        return x_ + s[0, 0] * 1e-9

    print(f"shrinkage_cov ss ({M_ELITE}x{CS}): {slope(f_refit, x)*1e3:7.3f} ms")

    @jax.jit
    def f_refit_mle(x_):
        s = shrinkage_cov(x_, "mle")
        return x_ + s[0, 0] * 1e-9

    print(f"shrinkage_cov mle:           {slope(f_refit_mle, x)*1e3:7.3f} ms")

    # 4. cholesky(cs,cs)
    @jax.jit
    def f_chol(s):
        c = jnp.linalg.cholesky(s)
        return s + c[0, 0] * 1e-12

    print(f"cholesky({CS}x{CS}):           {slope(f_chol, sigma)*1e3:7.3f} ms")

    # 5. eigh(cs,cs)
    @jax.jit
    def f_eigh(s):
        w, v = jnp.linalg.eigh(s)
        return s + w[0] * 1e-12

    print(f"eigh({CS}x{CS}):               {slope(f_eigh, sigma)*1e3:7.3f} ms")

    # 6. sampling matmul chol@z + candidate add
    @jax.jit
    def f_samp(s):
        c = jnp.linalg.cholesky(s)
        ee = c @ z
        return s + jnp.sum(ee) * 1e-12

    print(f"chol+sample ({CS}x{K}):      {slope(f_samp, sigma)*1e3:7.3f} ms")

    # 7. IT weights
    @jax.jit
    def f_w(c):
        w = jnp.exp(-(c - jnp.min(c)) / 10.0)
        w = w / jnp.sum(w)
        return c + w[0] * 1e-9

    print(f"IT weights(K):               {slope(f_w, costs)*1e3:7.3f} ms")

    # 8. gamma term: cho_solve + (cs,K) matmul
    u = jnp.asarray(rng.normal(size=(CS,)), dtype=jnp.float32)

    @jax.jit
    def f_gamma(c):
        chol = jnp.linalg.cholesky(sigma)
        zz = jax.scipy.linalg.cho_solve((chol, True), u)
        t = (e - u[:, None]).T @ zz
        return c + t * 1e-9

    print(f"gamma term:                  {slope(f_gamma, costs)*1e3:7.3f} ms")

    # 9. PMC resample counts at K=8192
    from mpopis_tpu.ops.sampling import multinomial_resample_counts

    key = jax.random.PRNGKey(0)

    @jax.jit
    def f_pmc(c):
        w = jnp.exp(-(c - jnp.min(c)) / 10.0)
        w = w / jnp.sum(w)
        counts = multinomial_resample_counts(key, w, K)
        return c + counts[0] * 1e-9

    print(f"pmc resample counts:         {slope(f_pmc, costs)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
