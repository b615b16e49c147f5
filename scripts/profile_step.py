"""Decompose the CEMPPI policy-step time at K=8192 on TPU.

Chained-dependency loops (each iteration feeds the next) with one block at
the end — isolated dispatch microbenchmarks misreport under the axon relay.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models import CarRacingEnv
from mpopis_tpu.policies import PolicyConfig, make_policy

K, H, ITS = 8192, 50, 10
CS = 2 * H


def timed(name, fn, x0, steps=20, warmup=3):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(steps):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return dt


def main():
    env = CarRacingEnv(dtype=jnp.float32)
    cfg = PolicyConfig(kind="cemppi", num_samples=K, horizon=H, lam=10.0,
                       opt_its=ITS, ce_elite_threshold=0.8, sigma_est="ss")
    pol = make_policy(env, cfg, cov_mat=np.diag([0.0625, 0.1]), jit=False)
    s0 = env.reset()
    ps0 = pol.init_state(0)

    @jax.jit
    def full(carry):
        s, ps = carry
        a, ps, _ = pol.step(s, ps)
        return env.step(s, a), ps

    timed("full CEMPPI step (its=10)", full, (s0, ps0))

    cfg1 = PolicyConfig(kind="cemppi", num_samples=K, horizon=H, lam=10.0,
                        opt_its=1, ce_elite_threshold=0.8, sigma_est="ss")
    pol1 = make_policy(env, cfg1, cov_mat=np.diag([0.0625, 0.1]), jit=False)

    @jax.jit
    def one_it(carry):
        s, ps = carry
        a, ps, _ = pol1.step(s, ps)
        return env.step(s, a), ps

    timed("CEMPPI step (its=1)", one_it, (s0, pol1.init_state(0)))

    # rollout kernel alone, chained through the state
    vc0 = jnp.zeros((H, 2, K), dtype=jnp.float32)

    @jax.jit
    def roll(carry):
        s, v = carry
        c = env.fused_rollout_costs_tak(s, v)
        # feed costs back into controls so iterations chain
        return s, v + 1e-12 * c[None, None, :]

    timed("fused rollout alone (1 it)", roll, (s0, vc0))

    # threefry normals alone: ITS draws of (cs, K), chained
    @jax.jit
    def normals(key):
        def body(k, _):
            k, ks = jax.random.split(k)
            z = jax.random.normal(ks, (CS, K), dtype=jnp.float32)
            return k, z[0, 0]
        k, _ = jax.lax.scan(body, key, None, length=ITS)
        return k

    timed("threefry normals x10 (cs,K)", normals, jax.random.key(0))

    # rbg normals alone
    @jax.jit
    def normals_rbg(key):
        def body(k, _):
            k, ks = jax.random.split(k)
            z = jax.random.normal(ks, (CS, K), dtype=jnp.float32)
            return k, z[0, 0]
        k, _ = jax.lax.scan(body, key, None, length=ITS)
        return k

    key_rbg = jax.random.key(0, impl="rbg")
    timed("rbg normals x10 (cs,K)", normals_rbg, key_rbg)

    # weights + moments overhead: everything outside rollout at its=1 is
    # (step its=1) - (rollout alone)


if __name__ == "__main__":
    main()
