"""Continuous MountainCar dynamics (pure JAX).

Independent reimplementation of the classic Moore/Sutton continuous
mountain-car task with the parameterization used by ReinforcementLearning.jl
(`MountainCarEnv(continuous=true)`), which the reference adapts at
src/examples/mountaincar_example.jl:3-22: goal position 0.45, power 0.0015,
gravity 0.0025, max 200 steps, plus the reference's custom reward override
(+1e5 at goal, +|velocity|, -1 per non-terminal step,
mountaincar_example.jl:10-22).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models.base import Env, EnvState, make_state


@dataclasses.dataclass(frozen=True, eq=False)
class MountainCarEnv(Env):
    min_pos: float = -1.2
    max_pos: float = 0.6
    max_speed: float = 0.07
    goal_pos: float = 0.45
    goal_velocity: float = 0.0
    power: float = 0.0015
    gravity: float = 0.0025
    max_steps: int = 200

    state_dim = 2
    action_dim = 1
    action_low = np.array([-1.0])
    action_high = np.array([1.0])

    def reset(self, key: jax.Array | None = None) -> EnvState:
        if key is None:
            pos = jnp.asarray(-0.5, dtype=self.dtype)
        else:
            pos = jax.random.uniform(
                key, (), dtype=self.dtype, minval=-0.6, maxval=-0.4
            )
        x = jnp.stack([pos, jnp.zeros((), dtype=self.dtype)])
        return make_state(x)

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        a = jnp.reshape(action, ())
        pos, v = state.x[0], state.x[1]
        v = v + a * self.power - jnp.cos(3.0 * pos) * self.gravity
        v = jnp.clip(v, -self.max_speed, self.max_speed)
        pos = pos + v
        pos = jnp.clip(pos, self.min_pos, self.max_pos)
        # wall at the left edge kills leftward velocity
        v = jnp.where((pos == self.min_pos) & (v < 0), 0.0, v)
        t = state.t + 1
        done = ((pos >= self.goal_pos) & (v >= self.goal_velocity)) | (
            t >= self.max_steps
        )
        return EnvState(x=jnp.stack([pos, v]), t=t, done=done)

    def reward(self, state: EnvState) -> jnp.ndarray:
        """Reference's override: +1e5 at goal, +|v|, -1 per non-done step."""
        pos, v = state.x[0], state.x[1]
        at_goal = (pos >= self.goal_pos) & (v >= self.goal_velocity)
        rew = jnp.where(at_goal, 100000.0, 0.0)
        rew = rew + jnp.abs(v)
        rew = rew + jnp.where(state.done, 0.0, -1.0)
        return rew.astype(self.dtype)
