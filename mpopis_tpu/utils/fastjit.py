"""jit with reduced XLA *backend* optimization effort.

The spatial-contact scalar graphs (models/spatial_contact.py — n=14, 108
QP rows, RK4) lower to hundreds of thousands of scalar HLO ops; XLA CPU's
default backend pipeline (LLVM -O3 over one giant fused function) spends
tens of minutes on them (measured: 35 min for one Ant constrained-qacc at
the default level). Dropping `xla_backend_optimization_level` skips the
expensive LLVM passes only — HLO simplification and the numerics are
unchanged, the generated code is just less micro-optimized. The CPU test
suite uses this for every spatial jit; TPU entry points do NOT (the TPU
backend ignores the flag; Mosaic kernels have their own path).
"""

from __future__ import annotations

import functools

import jax

FAST_COMPILER_OPTIONS = {"xla_backend_optimization_level": "1"}


def fast_jit(fun=None, **jit_kwargs):
    """`jax.jit` with FAST_COMPILER_OPTIONS merged in (decorator-friendly)."""
    if fun is None:
        return functools.partial(fast_jit, **jit_kwargs)
    opts = dict(FAST_COMPILER_OPTIONS)
    opts.update(jit_kwargs.pop("compiler_options", {}) or {})
    return jax.jit(fun, compiler_options=opts, **jit_kwargs)
