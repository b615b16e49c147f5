"""Checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5); the closest mechanisms
are envpool's restore-by-replay and the action-CSV export. In the
pure-functional design the complete resumable state of an experiment is just
{policy state (U, key), env state (x, t, done), step counter} — a small
pytree, saved as a single .npz.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mpopis_tpu.models.base import EnvState
from mpopis_tpu.policies.config import PolicyState


def save_checkpoint(path: str, pol_state: PolicyState, env_state: EnvState | None = None,
                    step: int = 0, **extra) -> str:
    if not path.endswith(".npz"):
        path += ".npz"
    payload = {
        "U": np.asarray(pol_state.U),
        "key": np.asarray(pol_state.key),
        "step": np.asarray(step),
    }
    if env_state is not None:
        payload["env_x"] = np.asarray(env_state.x)
        payload["env_t"] = np.asarray(env_state.t)
        payload["env_done"] = np.asarray(env_state.done)
    for k, v in extra.items():
        payload["extra_" + k] = np.asarray(v)
    np.savez(path, **payload)
    return path


def load_checkpoint(path: str, dtype=None):
    """Returns (pol_state, env_state_or_None, step, extras)."""
    if not path.endswith(".npz"):
        path += ".npz"
    data = np.load(path)
    u = jnp.asarray(data["U"], dtype=dtype)
    key = jnp.asarray(data["key"])
    if key.dtype != jnp.uint32:
        key = key.astype(jnp.uint32)
    pol_state = PolicyState(U=u, key=key)
    env_state = None
    if "env_x" in data:
        env_state = EnvState(
            x=jnp.asarray(data["env_x"], dtype=dtype),
            t=jnp.asarray(data["env_t"], dtype=jnp.int32),
            done=jnp.asarray(bool(data["env_done"])),
        )
    extras = {
        k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")
    }
    return pol_state, env_state, int(data["step"]), extras
