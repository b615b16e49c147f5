from mpopis_tpu.harness.factory import get_policy
from mpopis_tpu.harness.simulate import (
    simulate_car_racing,
    simulate_cartpole,
    simulate_mountaincar,
)
from mpopis_tpu.harness.simulate_mujoco import simulate_mujoco
from mpopis_tpu.harness.stats import quantile_ci

__all__ = [
    "get_policy",
    "simulate_car_racing",
    "simulate_cartpole",
    "simulate_mountaincar",
    "simulate_mujoco",
    "quantile_ci",
]
