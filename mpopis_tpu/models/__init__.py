from mpopis_tpu.models.ant_device import AntDeviceEnv
from mpopis_tpu.models.base import Env, EnvState, make_state
from mpopis_tpu.models.car_racing import CarParams, CarRacingEnv, car_reward, step_car_state
from mpopis_tpu.models.cartpole import CartPoleEnv
from mpopis_tpu.models.cheetah_device import CheetahDeviceEnv
from mpopis_tpu.models.hopper_device import HopperDeviceEnv
from mpopis_tpu.models.humanoid_device import HumanoidDeviceEnv
from mpopis_tpu.models.humanoidstandup_device import HumanoidStandupDeviceEnv
from mpopis_tpu.models.mountain_car import MountainCarEnv
from mpopis_tpu.models.multi_car import MultiCarRacingEnv
from mpopis_tpu.models.pusher_device import PusherDeviceEnv
from mpopis_tpu.models.pendulum_device import (
    InvertedDoublePendulumDeviceEnv,
    InvertedPendulumDeviceEnv,
)
from mpopis_tpu.models.reacher_device import ReacherDeviceEnv
from mpopis_tpu.models.swimmer_device import SwimmerDeviceEnv
from mpopis_tpu.models.walker2d_device import Walker2dDeviceEnv
from mpopis_tpu.models.rollout import rollout_batch, rollout_one
from mpopis_tpu.models.track import Track, distance_query, track_path

__all__ = [
    "AntDeviceEnv",
    "Env",
    "EnvState",
    "make_state",
    "CarParams",
    "CarRacingEnv",
    "car_reward",
    "step_car_state",
    "CartPoleEnv",
    "CheetahDeviceEnv",
    "HopperDeviceEnv",
    "HumanoidDeviceEnv",
    "HumanoidStandupDeviceEnv",
    "MountainCarEnv",
    "MultiCarRacingEnv",
    "InvertedDoublePendulumDeviceEnv",
    "InvertedPendulumDeviceEnv",
    "PusherDeviceEnv",
    "ReacherDeviceEnv",
    "SwimmerDeviceEnv",
    "Walker2dDeviceEnv",
    "rollout_batch",
    "rollout_one",
    "Track",
    "distance_query",
    "track_path",
]
