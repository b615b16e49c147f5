"""Transcendentals missing from the Pallas TPU lowering (atan2/atan/tan),
implemented branchlessly from Cephes-style minimax polynomials (f32, ~1-2 ulp
over the reduced range). Usable both inside Pallas kernels and in plain XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PI = float(np.pi)
_PI_2 = float(np.pi / 2.0)
_PI_4 = float(np.pi / 4.0)
_TAN_3PI_8 = 2.414213562373095  # tan(3π/8)
_TAN_PI_8 = 0.4142135623730950  # tan(π/8)


def atan_pos(x: jnp.ndarray) -> jnp.ndarray:
    """arctan for x >= 0 (Cephes atanf range reduction + degree-9 poly)."""
    big = x > _TAN_3PI_8
    mid = (x > _TAN_PI_8) & (~big)
    safe = jnp.maximum(x, 1e-30)
    x1 = jnp.where(big, -1.0 / safe, jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    z = x1 * x1
    y = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * x1 + x1
    return y + jnp.where(big, _PI_2, jnp.where(mid, _PI_4, 0.0))


def atan(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(x) * atan_pos(jnp.abs(x))


def atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Quadrant-correct arctan(y/x); atan2(0, 0) = 0, atan2(0, -1) = π."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    q = ay / jnp.maximum(ax, 1e-30)
    q = jnp.where((ax == 0.0) & (ay == 0.0), 0.0, q)
    r = atan_pos(q)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def tan(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sin(x) / jnp.cos(x)
