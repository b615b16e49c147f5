"""Continuous CartPole dynamics (pure JAX).

Independent reimplementation of the Barto-Sutton-Anderson cart-pole with the
parameterization used by ReinforcementLearning.jl (`CartPoleEnv(continuous=
true)`), which the reference adapts at src/examples/cartpole_example.jl:3-6.
State layout [x, ẋ, θ, θ̇]; continuous action a∈[-1,1] scales forcemag;
reward 1 per non-terminal step (RL.jl default — the reference does not
override it).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models.base import Env, EnvState, make_state


@dataclasses.dataclass(frozen=True, eq=False)
class CartPoleEnv(Env):
    gravity: float = 9.8
    masscart: float = 1.0
    masspole: float = 0.1
    halflength: float = 0.5
    forcemag: float = 10.0
    max_steps: int = 200
    dt: float = 0.02
    theta_threshold: float = 12.0 * np.pi / 180.0
    x_threshold: float = 2.4

    state_dim = 4
    action_dim = 1
    action_low = np.array([-1.0])
    action_high = np.array([1.0])

    @property
    def total_mass(self) -> float:
        return self.masscart + self.masspole

    @property
    def pole_mass_length(self) -> float:
        return self.masspole * self.halflength

    def reset(self, key: jax.Array | None = None) -> EnvState:
        if key is None:
            x = jnp.zeros((4,), dtype=self.dtype)
        else:
            x = jax.random.uniform(
                key, (4,), dtype=self.dtype, minval=-0.05, maxval=0.05
            )
        return make_state(x)

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        a = jnp.reshape(action, ())
        force = a * self.forcemag
        x, xdot, theta, thetadot = (
            state.x[0],
            state.x[1],
            state.x[2],
            state.x[3],
        )
        costh = jnp.cos(theta)
        sinth = jnp.sin(theta)
        tmp = (
            force + self.pole_mass_length * thetadot**2 * sinth
        ) / self.total_mass
        thetaacc = (self.gravity * sinth - costh * tmp) / (
            self.halflength
            * (4.0 / 3.0 - self.masspole * costh**2 / self.total_mass)
        )
        xacc = tmp - self.pole_mass_length * thetaacc * costh / self.total_mass
        x = x + self.dt * xdot
        xdot = xdot + self.dt * xacc
        theta = theta + self.dt * thetadot
        thetadot = thetadot + self.dt * thetaacc
        t = state.t + 1
        done = (
            (jnp.abs(x) > self.x_threshold)
            | (jnp.abs(theta) > self.theta_threshold)
            | (t > self.max_steps)
        )
        return EnvState(x=jnp.stack([x, xdot, theta, thetadot]), t=t, done=done)

    def reward(self, state: EnvState) -> jnp.ndarray:
        return jnp.where(state.done, 0.0, 1.0).astype(self.dtype)
