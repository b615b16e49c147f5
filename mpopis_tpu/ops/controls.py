"""Control-vector utilities: block-diag covariance tiling, clamping, and the
receding-horizon shift.

Reference semantics: MPOPIS `src/utils.jl` — `block_diagm` (:9-21),
`get_model_controls` (:23-77), `get_controls_roll_U!` (:88-101).

All functions are shape-static and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def block_diag_repeat(a, reps: int) -> jnp.ndarray:
    """Tile a (d,) variance vector or (d,d) covariance block `reps` times
    along the diagonal of a (d*reps, d*reps) matrix.

    Ref: utils.jl:9-21. Used to expand a per-timestep action covariance into
    the joint control-space covariance for GMPPI-family policies
    (mppi_mpopi_policies.jl:76-78).
    """
    a = jnp.asarray(a)
    if a.ndim == 1:
        return jnp.diag(jnp.tile(a, reps))
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"expected (d,) or (d,d), got {a.shape}")
    d = a.shape[0]
    out = jnp.zeros((d * reps, d * reps), dtype=a.dtype)
    for i in range(reps):
        out = out.at[i * d : (i + 1) * d, i * d : (i + 1) * d].set(a)
    return out


def clamp_controls(v: jnp.ndarray, low, high) -> jnp.ndarray:
    """Clamp candidate controls to per-dimension action bounds.

    `v` has shape (..., as) (trailing axis = action dims); `low`/`high` are
    (as,) arrays. Ref: utils.jl:30-67 (`get_model_controls`), which clamps
    each action dimension to its interval before stepping the model.
    """
    return jnp.clip(v, jnp.asarray(low), jnp.asarray(high))


def controls_from_flat(v_flat: jnp.ndarray, horizon: int, action_dim: int) -> jnp.ndarray:
    """Reshape a flat (cs,) = (horizon*as,) control vector into (horizon, as).

    The flat layout is timestep-major: [u_1; u_2; ...; u_T], matching the
    reference's reshape(V, as, horizon) column-major layout (utils.jl:59).
    """
    return v_flat.reshape(horizon, action_dim)


def roll_controls(
    weighted_controls: jnp.ndarray,
    u0: jnp.ndarray,
    action_dim: int,
    reference_quirk: bool = True,
) -> jnp.ndarray:
    """Receding-horizon shift: drop the first action, shift everything left
    by one timestep, refill the tail from the nominal control U0.

    Ref: utils.jl:88-101 (`get_controls_roll_U!`). The reference's tail
    refill writes `U[(end-as):end] = U₀[(end-as):end]` — `as+1` elements,
    overwriting one element of the shifted region (likely intended
    `end-as+1:end`). `reference_quirk=True` (default) reproduces that
    behavior exactly for bit-comparability; `False` applies the intended
    `as`-element refill.

    `weighted_controls` and `u0` are flat (cs,) vectors; returns the new
    flat U. For horizon == 1 the reference replaces U wholesale.
    """
    cs = weighted_controls.shape[0]
    if cs == action_dim:  # horizon == 1
        return weighted_controls
    shifted = jnp.concatenate(
        [weighted_controls[action_dim:], u0[cs - action_dim :]]
    )
    if reference_quirk:
        # Overwrite one extra element (index cs-as-1) from U0, as the
        # reference does.
        shifted = shifted.at[cs - action_dim - 1].set(u0[cs - action_dim - 1])
    return shifted


def action_bounds_tiled(low, high, horizon: int) -> tuple[np.ndarray, np.ndarray]:
    """Tile per-step action bounds over the horizon for flat (cs,) vectors."""
    low = np.asarray(low)
    high = np.asarray(high)
    return np.tile(low, horizon), np.tile(high, horizon)
