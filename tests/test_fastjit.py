"""fast_jit (utils/fastjit.py) — nesting regression.

Round 3's `dryrun_multichip` crashed at trace time because fast_jit
passed `compiler_options` to a jit nested inside an outer `jax.jit`
(JAX only accepts compiler options on top-level jits; VERDICT r3
item 1). fast_jit now routes tracer calls to a plain nested jit; these
tests pin both legs and the exact failure shape.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.utils.fastjit import fast_jit


def _f(x, y):
    return jnp.sin(x) * y + x


def test_fast_jit_top_level():
    x = jnp.arange(4.0)
    got = fast_jit(_f)(x, 2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_f(x, 2.0)))


def test_fast_jit_inside_outer_jit():
    """The r3 crash shape: a fast_jit'd function called while tracing an
    outer jax.jit must not raise (and must match the eager value)."""
    g = fast_jit(_f)

    @jax.jit
    def outer(x):
        return g(x, 3.0) + 1.0

    x = jnp.arange(4.0)
    np.testing.assert_allclose(
        np.asarray(outer(x)), np.asarray(_f(x, 3.0) + 1.0)
    )


def test_fast_jit_static_argnames_inside_outer_jit():
    """With static_argnames (the spatial kernel's signature shape)."""

    def h(x, n):
        return x * n

    g = fast_jit(h, static_argnames=("n",))

    @jax.jit
    def outer(x):
        return g(x, n=4)

    np.testing.assert_allclose(np.asarray(outer(jnp.ones(3))), 4.0)


def test_spatial_interpret_kernel_inside_outer_jit():
    """The exact dryrun pass-4 shape (__graft_entry__): the interpret-mode
    spatial fused rollout traced inside an outer jax.jit. Tiny shapes —
    this pins trace-time compatibility, not physics."""
    from mpopis_tpu.models import PusherDeviceEnv

    env = PusherDeviceEnv(
        dtype=jnp.float32, fused_interpret=True, solver_outer=1, solver_cg=2
    )
    s0 = env.reset()
    rng = np.random.default_rng(0)
    ctrl = jnp.asarray(
        rng.uniform(-0.5, 0.5, (2, env.action_dim, 8)), dtype=jnp.float32
    )

    @jax.jit
    def outer(x, c):
        from mpopis_tpu.models.base import make_state

        return env.fused_rollout_costs_tak(make_state(x), c)

    costs = outer(s0.x, ctrl)
    assert costs.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(costs)))
    # and it must agree with the same kernel called at top level
    ref = env.fused_rollout_costs_tak(s0, ctrl)
    np.testing.assert_allclose(
        np.asarray(costs), np.asarray(ref), rtol=1e-6, atol=1e-6
    )
