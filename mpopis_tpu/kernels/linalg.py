"""Pallas small-matrix linalg for the AIS update path.

XLA's cholesky/triangular_solve on a 100×100 matrix cost ~0.15-0.25 ms on
TPU — they lower to blocked loops of dynamic slices, each step paying
cross-kernel latency, while the actual arithmetic is ~0.3 MFLOP. At the
flagship config (K=8192, cs=100, 10 AIS iterations) that latency was most
of the policy step (BENCH.md round 2: the rollout kernel is 0.35 ms of a
~5 ms CEMPPI step). These kernels run the whole factorization as ONE
Pallas program with the matrix resident in VMEM: n sequential steps of
full-matrix vector ops (~13 vregs each at n=100), no per-step kernel
boundaries.

- `cholesky_lower(a)`: lower Cholesky factor; right-looking outer-product
  form, column extraction via masked reductions (no dynamic slicing).
- `forward_solve(l, b)`: y = L⁻¹ b for a stack of RHS (the gamma control-
  cost term needs two forward substitutions per AIS iteration, see
  policies/driver.py).

Both dispatch to the Pallas kernel only on TPU; CPU (the f64 test suite)
and any other backend use the jnp/XLA reference path. Kernel-vs-oracle
agreement is pinned in tests/test_kernels.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_kernel(a_ref, l_ref, *, n: int):
    a = a_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def body(j, carry):
        a, l = carry
        piv = jnp.sum(jnp.where((rows == j) & (cols == j), a, 0.0))
        inv = 1.0 / jnp.sqrt(piv)
        colj = jnp.sum(jnp.where(cols == j, a, 0.0), axis=1, keepdims=True)
        colm = jnp.where(rows[:, :1] >= j, colj * inv, 0.0)  # (n, 1) = L[:, j]
        l = jnp.where(cols == j, colm, l)
        a = a - colm * colm.reshape(1, n)
        return a, l

    _, l = jax.lax.fori_loop(0, n, body, (a, jnp.zeros_like(a)))
    l_ref[...] = l


def _fwd_solve_kernel(l_ref, b_ref, y_ref, *, n: int, nrhs: int):
    """y = L⁻¹ b, b (nrhs, n): right-looking forward substitution."""
    l = l_ref[...]
    y = b_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    coln = jax.lax.broadcasted_iota(jnp.int32, (nrhs, n), 1)

    def body(j, y):
        piv = jnp.sum(jnp.where((rows == j) & (cols == j), l, 0.0))
        colj = jnp.sum(jnp.where(cols == j, l, 0.0), axis=1)  # (n,) = L[:, j]
        yj = jnp.sum(jnp.where(coln == j, y, 0.0), axis=1, keepdims=True) / piv
        y = jnp.where(
            coln == j, yj, y - jnp.where(coln > j, colj.reshape(1, n), 0.0) * yj
        )
        return y

    y_ref[...] = jax.lax.fori_loop(0, n, body, y)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_pallas(a, interpret=False):
    n = a.shape[0]
    return pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((n, n), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_solve_pallas(l, b, interpret=False):
    n = l.shape[0]
    nrhs = b.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_solve_kernel, n=n, nrhs=nrhs),
        out_shape=jax.ShapeDtypeStruct((nrhs, n), b.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(l, b)


def _use_pallas(x) -> bool:
    # OPT-IN (MPOPIS_PALLAS_LINALG=1), f32 on TPU only. Standalone the
    # kernel beats XLA's cholesky 4.4x (0.081 vs 0.354 ms at n=100), but
    # measured INSIDE the compiled policy step it made the full CEMPPI/CMA
    # step ~10% slower — the custom call acts as a fusion/layout barrier
    # in the AIS scan body (same-process A/B, 5 configs, consistent).
    # Kept as an opt-in building block; default stays XLA.
    import os

    if not os.environ.get("MPOPIS_PALLAS_LINALG"):
        return False
    return (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.float32
        and x.shape[-1] <= 1024
    )


def cholesky_lower(a: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor; Pallas single-program kernel on TPU f32,
    jnp.linalg.cholesky elsewhere."""
    if _use_pallas(a):
        return _chol_pallas(a)
    return jnp.linalg.cholesky(a)


def forward_solve(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """y = L⁻¹ b for b of shape (nrhs, n) (row-stacked RHS)."""
    if _use_pallas(l):
        return _fwd_solve_pallas(l, b)
    return jax.scipy.linalg.solve_triangular(l, b.T, lower=True).T
