"""On-device (pure-JAX) InvertedPendulum-v4 and InvertedDoublePendulum-v4.

Third and fourth members of the on-device MuJoCo family, built on the
shared closed-form toolkit (models/planar.py): vertical-plane cart-pole
chains under gravity, RK4, soft slide/hinge limits — exactly mj_step on
inverted_pendulum.xml / inverted_double_pendulum.xml (constants probed
from mjModel; tests re-derive them and pin trajectory equality).

InvertedPendulum-v4: 2 DoF (cart slide ±1 m, pole hinge ±90°, both
damping 1, gear-100 motor with ctrlrange ±3), h=0.02, frame_skip=2.
gym returns a constant 1.0 reward and TERMINATES at |angle| > 0.2; a
batch rollout engine has no termination, so (like the batch engine,
mujoco_host.py) the alive bonus is gated on the healthy condition — the
effective return is identical while the pendulum stays up.

InvertedDoublePendulum-v4: 3 DoF (cart slide ±1 m with margin 0.01, two
free hinges, damping 0.05, gear-500 motor, gravity (1e-5, 0, −9.81)),
h=0.01, frame_skip=5. Reward 10 − 0.01·x_tip² − (y_tip−2)² −
(1e-3·v1² + 5e-3·v2²) reads the tip SITE position and qvel AFTER the
step — through MuJoCo's stale stage-4 kinematics (see planar.rk4_step),
which the env carries in its state. The observation's
clip(qfrc_constraint, ±10) tail likewise uses the stage-4 constraint
force.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models.base import Env, EnvState, make_state
from mpopis_tpu.models.planar import LimitSpec, build_planar_dynamics, rk4_step

_G = 9.81

# --- InvertedPendulum constants (inverted_pendulum.xml via mjModel) --------
_IP_M_CART = 10.47197551196598
_IP_M_POLE = 5.018591641363306
_IP_I_POLE = 0.18874976687308852  # about y at the pole com
_IP_COM = (0.0005, 0.3)  # pole com in body frame (x, z); geom is tilted
_IP_DAMPING = 1.0
_IP_GEAR = 100.0
_IP_CTRL = 3.0
_IP_H = 0.02
_IP_SKIP = 2
_IP_INVWEIGHT = (0.08367433805859587, 2.023912919848819)

# --- InvertedDoublePendulum constants (inverted_double_pendulum.xml) -------
_IDP_M_CART = 10.47197551196598
_IDP_M_POLE = 4.1987385815227585
_IDP_I_POLE = 0.15497066975016235
_IDP_COM_Z = 0.3  # both pole coms at +0.3 along the link
_IDP_LINK = 0.6  # pole length (pole2 body / tip site offset)
_IDP_DAMPING = 0.05
_IDP_GEAR = 500.0
_IDP_H = 0.01
_IDP_SKIP = 5  # gymnasium's class value (not the XML custom numeric 2)
_IDP_GX = 1e-5  # the model's tiny +x gravity component
_IDP_INVWEIGHT_SLIDE = 0.08467261918769675
_IDP_MARGIN = 0.01


def _ip_kin(q):
    """(cart_x, pole_com_x, pole_com_z, theta). Rotation about +y by θ maps
    body (px, pz) to world (c·px + s·pz, −s·px + c·pz)."""
    x, th = q
    c, s = jnp.cos(th), jnp.sin(th)
    a, b = _IP_COM
    return (x, x + c * a + s * b, -s * a + c * b, th)


_IP_QACC, _ip_mass, _ = build_planar_dynamics(
    _ip_kin,
    kin_weights=(_IP_M_CART, _IP_M_POLE, _IP_M_POLE, _IP_I_POLE),
    # V = m·g·z_com (cart height constant)
    pot_coeffs=(0.0, 0.0, _IP_M_POLE * _G, 0.0),
    n_dof=2,
    damping=(_IP_DAMPING, _IP_DAMPING),
    armature=(0.0, 0.0),
    limits=(
        LimitSpec(dof=0, lo=-1.0, hi=1.0, invweight=_IP_INVWEIGHT[0]),
        LimitSpec(
            dof=1,
            lo=-float(np.pi / 2),
            hi=float(np.pi / 2),
            invweight=_IP_INVWEIGHT[1],
        ),
    ),
    timestep=_IP_H,
)


@dataclasses.dataclass(frozen=True, eq=False)
class InvertedPendulumDeviceEnv(Env):
    """gymnasium InvertedPendulum-v4 with on-device dynamics.

    State x = [cart_x, θ, ẋ, θ̇]; action = 1 force ∈ [−3, 3] (ctrlrange)
    scaled by gear 100. Reward = 1.0 while healthy (|θ| ≤ 0.2), else 0 —
    see the module docstring for the termination-vs-batch-engine note.
    """

    state_dim = 4
    action_dim = 1
    action_low = np.array([-_IP_CTRL])
    action_high = np.array([_IP_CTRL])

    @property
    def dt(self) -> float:
        return _IP_H * _IP_SKIP

    def reset(self, key: jax.Array | None = None) -> EnvState:
        return make_state(jnp.zeros((4,), dtype=self.dtype))

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        tau = (
            _IP_GEAR * jnp.clip(action[0], -_IP_CTRL, _IP_CTRL),
            jnp.zeros_like(state.x[0]),
        )
        q = (state.x[0], state.x[1])
        qv = (state.x[2], state.x[3])

        def sub(carry, _):
            qq, vv = carry
            qn, vn, _, _ = rk4_step(_IP_QACC, qq, vv, tau, _IP_H)
            return (qn, vn), None

        (q, qv), _ = jax.lax.scan(sub, (q, qv), None, length=_IP_SKIP)
        x = jnp.stack(q + qv).astype(self.dtype)
        return EnvState(x=x, t=state.t + 1, done=state.done)

    def reward(self, state: EnvState) -> jnp.ndarray:
        healthy = jnp.abs(state.x[1]) <= 0.2
        return jnp.where(healthy, 1.0, 0.0).astype(self.dtype)

    def observation(self, state: EnvState) -> jnp.ndarray:
        return state.x  # gym obs: [qpos, qvel]


def _idp_kin(q):
    """(cart_x, p1_com_x, p1_com_z, p2_com_x, p2_com_z, th1, th2) with
    absolute pole angles th1 = q1, th2 = q1 + q2."""
    x, a1, a2 = q
    th1 = a1
    th2 = a1 + a2
    c1, s1 = jnp.cos(th1), jnp.sin(th1)
    c2, s2 = jnp.cos(th2), jnp.sin(th2)
    # rotation about +y: body (0, z) -> world (s·z, c·z)
    j2x = x + s1 * _IDP_LINK  # second hinge position
    j2z = c1 * _IDP_LINK
    return (
        x,
        x + s1 * _IDP_COM_Z,
        c1 * _IDP_COM_Z,
        j2x + s2 * _IDP_COM_Z,
        j2z + c2 * _IDP_COM_Z,
        th1,
        th2,
    )


_IDP_QACC, _idp_mass, _ = build_planar_dynamics(
    _idp_kin,
    kin_weights=(
        _IDP_M_CART,
        _IDP_M_POLE,
        _IDP_M_POLE,
        _IDP_M_POLE,
        _IDP_M_POLE,
        _IDP_I_POLE,
        _IDP_I_POLE,
    ),
    # V = Σ m(g_z·z − g_x·x): the model has gravity (1e-5, 0, −9.81), so x
    # coordinates carry a tiny −m·g_x potential as well
    pot_coeffs=(
        -_IDP_M_CART * _IDP_GX,
        -_IDP_M_POLE * _IDP_GX,
        _IDP_M_POLE * _G,
        -_IDP_M_POLE * _IDP_GX,
        _IDP_M_POLE * _G,
        0.0,
        0.0,
    ),
    n_dof=3,
    damping=(_IDP_DAMPING,) * 3,
    armature=(0.0,) * 3,
    limits=(
        LimitSpec(
            dof=0, lo=-1.0, hi=1.0, invweight=_IDP_INVWEIGHT_SLIDE,
            margin=_IDP_MARGIN,
        ),
    ),
    timestep=_IDP_H,
)


def _idp_tip(q):
    """Tip-site world (x, z) from qpos (site at +0.6 on pole2)."""
    x, a1, a2 = q
    th1, th2 = a1, a1 + a2
    tx = x + jnp.sin(th1) * _IDP_LINK + jnp.sin(th2) * _IDP_LINK
    tz = jnp.cos(th1) * _IDP_LINK + jnp.cos(th2) * _IDP_LINK
    return tx, tz


@dataclasses.dataclass(frozen=True, eq=False)
class InvertedDoublePendulumDeviceEnv(Env):
    """gymnasium InvertedDoublePendulum-v4 with on-device dynamics.

    State x = [qpos(3), qvel(3), fk_qpos(3), fk_qfrc_slide] where the fk
    entries are the stale stage-4 kinematics/constraint force mj leaves in
    data after mj_step (gym's obs and reward read them). Action = 1 force
    ∈ [−1, 1], gear 500.
    """

    state_dim = 10
    action_dim = 1
    action_low = np.array([-1.0])
    action_high = np.array([1.0])

    @property
    def dt(self) -> float:
        return _IDP_H * _IDP_SKIP

    def reset(self, key: jax.Array | None = None) -> EnvState:
        return make_state(jnp.zeros((10,), dtype=self.dtype))

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        tau = (
            _IDP_GEAR * jnp.clip(action[0], -1.0, 1.0),
            jnp.zeros_like(state.x[0]),
            jnp.zeros_like(state.x[0]),
        )
        q = (state.x[0], state.x[1], state.x[2])
        qv = (state.x[3], state.x[4], state.x[5])

        def sub(carry, _):
            qq, vv = carry[0], carry[1]
            qn, vn, q4, qfrc4 = rk4_step(_IDP_QACC, qq, vv, tau, _IDP_H)
            return (qn, vn, q4, qfrc4[0]), None

        zero = jnp.zeros_like(state.x[0])
        init = (q, qv, q, zero)
        (q, qv, q4, f4), _ = jax.lax.scan(sub, init, None, length=_IDP_SKIP)
        x = jnp.stack(q + qv + q4 + (f4,)).astype(self.dtype)
        return EnvState(x=x, t=state.t + 1, done=state.done)

    def reward(self, state: EnvState) -> jnp.ndarray:
        """idp_v4.py step(): 10 − dist − vel penalties on the POST-step
        state, via the stale stage-4 site position."""
        tx, tz = _idp_tip((state.x[6], state.x[7], state.x[8]))
        dist_pen = 0.01 * tx * tx + (tz - 2.0) ** 2
        v1, v2 = state.x[4], state.x[5]
        vel_pen = 1e-3 * v1 * v1 + 5e-3 * v2 * v2
        return (10.0 - dist_pen - vel_pen).astype(self.dtype)

    def observation(self, state: EnvState) -> jnp.ndarray:
        """gym obs: [x, sin(angles), cos(angles), clip(qvel, ±10),
        clip(qfrc_constraint, ±10)]."""
        x = state.x[0]
        a1, a2 = state.x[1], state.x[2]
        qv = state.x[3:6]
        fc = jnp.clip(state.x[9], -10.0, 10.0)
        zero = jnp.zeros_like(x)
        return jnp.stack(
            [
                x,
                jnp.sin(a1),
                jnp.sin(a2),
                jnp.cos(a1),
                jnp.cos(a2),
                jnp.clip(qv[0], -10.0, 10.0),
                jnp.clip(qv[1], -10.0, 10.0),
                jnp.clip(qv[2], -10.0, 10.0),
                fc,
                zero,
                zero,
            ]
        )
