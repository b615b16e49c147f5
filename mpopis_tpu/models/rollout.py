"""Batched trajectory rollouts: vmap over the sample axis K, lax.scan over
the horizon T — the whole K×T×(substeps) simulation is one compiled,
device-resident program.

Replaces the reference's three rollout paths: the threaded Julia loop with
copy(env) per sample (mppi_mpopi_policies.jl:261-278), the serial MPPI loop
(:186-216), and the envpool C++ batched stepping with a PyCall boundary per
timestep (utils.jl:103-121, envpool_env.jl:153-161).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpopis_tpu.models.base import Env, EnvState


def rollout_one(env: Env, state0: EnvState, controls: jnp.ndarray, log_states: bool):
    """Roll a single control sequence (T, as) from state0.

    Returns (base_cost, states) where base_cost = Σ_t -reward(s_{t+1})
    (cost-as-negative-reward accumulation, ref mppi_mpopi_policies.jl:174,208
    and utils.jl:129-144) and `states` is (T, state_dim) when `log_states`
    else None.
    """

    def body(s, u):
        # step_reward defaults to post-step reward(s'); envs with pre-step
        # reward semantics (gym Reacher/Swimmer) override it
        s2, r = env.step_reward(s, u)
        return s2, (r, s2.x if log_states else None)

    _, (rews, xs) = jax.lax.scan(body, state0, controls)
    return -jnp.sum(rews), xs


def rollout_batch(env: Env, state0: EnvState, controls: jnp.ndarray, log_states: bool = False):
    """Roll K control sequences (K, T, as) from a shared state0.

    Returns (base_costs (K,), states (K, T, state_dim) or None).
    """
    return jax.vmap(lambda c: rollout_one(env, state0, c, log_states))(controls)
