"""On-device (pure-JAX) Swimmer-v4 — MuJoCo-exact closed-form dynamics.

Second member of the on-device MuJoCo family (see reacher_device.py for
the rationale). swimmer.xml: a free planar 3-link chain (2 slide + 3 hinge
DoF, armature 0.1 each, no damping), driven by 2 gear-150 motors, swimming
in MuJoCo's inertia-box fluid model (density 4000, viscosity 0.1), RK4 at
h=0.01, frame_skip=4, soft joint limits ±100° on both motor joints.

Dynamics pieces, each validated against the mujoco wheel
(tests/test_swimmer_device.py):

- mass matrix / Coriolis: assembled by forward-mode AD of the planar
  kinematics (com positions + link angles); M = Jᵀ diag(m,m,I) J +
  armature·I₅, bias = (∂(Mq̇)/∂q)q̇ − ∂T/∂q — exact, no hand-derivation.
- fluid forces (reverse-engineered from qfrc_passive probes on an isolated
  capsule; the "inertia-box" model): equivalent box sides
  sᵢ = √(6(Iⱼ+Iₖ−Iᵢ)/m); per inertial axis quadratic drag
  −½ρ·sⱼ·sₖ·|vᵢ|vᵢ, isotropic viscous force −3πνd·v with
  d = (s₁+s₂+s₃)/3, quadratic torque −(ρ/64)·sᵢ(sⱼ⁴+sₖ⁴)|ωᵢ|ωᵢ, viscous
  torque −πνd³ω. Mapped to joint space through the kinematics VJP.
- joint limits: the same soft-constraint model as reacher_device.py
  (solref (0.02,1), solimp (0.9,0.95,0.001,0.5,2), regularizer
  R = (1−imp)/imp · dof_invweight0[j] — a model constant), extended to the
  2-constraint case with an exhaustive active-set enumeration of the 2×2
  projected solve. Matches mj_forward's qacc to ~1e-15 with one or both
  limits active.

TPU layout note: every quantity is a SCALAR expression over a pytree of
(5|9|10)-tuples — never a (…,5) array. Under vmap the scalars become
dense (K,) vectors that fill all 128 VPU lanes; a (K,5) layout pads the
minor dimension to 128 lanes (4% utilization) and was measured ~100×
slower end-to-end. The 5×5 solves are unrolled scalar Cholesky for the
same reason (batched tiny jnp.linalg.cholesky lowers to dynamic-slice
loops on TPU).

Reward/obs follow swimmer_v4.py: reward = (x_after−x_before)/dt −
1e-4·Σa² (pre/post-step torso x), obs = [qpos[2:], qvel]; deterministic
reset to qpos0 (zeros) like the batch engine.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models.base import Env, EnvState, make_state

# --- constants from swimmer.xml via mjModel (f64) --------------------------
_MASS = 35.604716740684324  # per link (capsule r=0.1, l=1.0, density 1000)
_I_MAX = 3.9175660390264717  # principal inertia, short axes (in-plane rot)
_I_MIN = 0.17383479349863523  # about the capsule's long axis
_ARMATURE = 0.1
_GEAR = 150.0
_H = 0.01
_FRAME_SKIP = 4
_LIMIT = float(np.deg2rad(100.0))  # motor joint range
_RHO, _VISC = 4000.0, 0.1
# equivalent-box sides from the principal inertias
_S_SHORT = float(np.sqrt(6.0 * (_I_MAX + _I_MIN - _I_MAX) / _MASS))
_S_LONG = float(np.sqrt(6.0 * (_I_MAX + _I_MAX - _I_MIN) / _MASS))
_D_EQ = (2.0 * _S_SHORT + _S_LONG) / 3.0
_C_VISC_F = 3.0 * np.pi * _VISC * _D_EQ
_C_VISC_T = np.pi * _VISC * _D_EQ**3
_C_PAR = 0.5 * _RHO * _S_SHORT * _S_SHORT  # motion along the link axis
_C_PERP = 0.5 * _RHO * _S_SHORT * _S_LONG  # in-plane perpendicular motion
_C_ROT = _RHO / 64.0 * _S_SHORT * (_S_SHORT**4 + _S_LONG**4)
# constraint model constants (defaults, same as reacher)
_D0, _DMAX, _WIDTH, _MID = 0.9, 0.95, 0.001, 0.5
_KC = 1.0 / (_DMAX * 0.02) ** 2
_BC = 2.0 / (_DMAX * 0.02)
# mjModel.dof_invweight0[3:5]: constraint regularizer weights (R)
_INVWEIGHT = (0.38529334162134676, 0.3933336741383495)


def _kin(q):
    """Kinematics over a 5-tuple qpos: 9-tuple of link-com coordinates and
    absolute angles (p1x, p1y, p2x, p2y, p3x, p3y, th1, th2, th3).

    Geometry from swimmer.xml: torso origin at the slides, its capsule com
    at +1.0 along the link axis (fromto 1.5..0.5, ipos (1,0)); mid body at
    +0.5 on the torso with its com at −0.5; back at −1.0 on mid, com −0.5.
    """
    x, y, t1, a2, a3 = q
    th1 = t1
    th2 = t1 + a2
    th3 = th2 + a3
    c1, s1 = jnp.cos(th1), jnp.sin(th1)
    c2, s2 = jnp.cos(th2), jnp.sin(th2)
    c3, s3 = jnp.cos(th3), jnp.sin(th3)
    o2x, o2y = x + 0.5 * c1, y + 0.5 * s1
    o3x, o3y = o2x - c2, o2y - s2
    return (
        x + c1,
        y + s1,
        o2x - 0.5 * c2,
        o2y - 0.5 * s2,
        o3x - 0.5 * c3,
        o3y - 0.5 * s3,
        th1,
        th2,
        th3,
    )


_W_OUT = (_MASS,) * 6 + (_I_MAX,) * 3  # kinetic-energy weights per output


def _kinetic(q, qv):
    vel = jax.jvp(_kin, (q,), (qv,))[1]
    t = 0.5 * _ARMATURE * sum(v * v for v in qv)
    for w, v in zip(_W_OUT, vel):
        t = t + 0.5 * w * v * v
    return t


def _mass_entries(q):
    """M(q) as a lower-triangle list-of-lists of scalars."""
    jac = jax.jacfwd(_kin)(q)  # tuple(9 outputs) of tuple(5 inputs)
    m = [[None] * (i + 1) for i in range(5)]
    for i in range(5):
        for j in range(i + 1):
            s = _ARMATURE if i == j else 0.0
            for out in range(9):
                s = s + _W_OUT[out] * jac[out][i] * jac[out][j]
            m[i][j] = s
    return m


def _bias(q, qv):
    """Coriolis/centrifugal: (∂(M q̇)/∂q)q̇ − ∂T/∂q (gravity-free plane).

    The first term is a directional derivative along q̇ (single JVP)."""
    def mom(q_):
        m = _mass_entries(q_)
        return tuple(
            sum(
                (m[i][j] if i >= j else m[j][i]) * qv[j] for j in range(5)
            )
            for i in range(5)
        )

    dir_term = jax.jvp(mom, (q,), (qv,))[1]
    grad_q = jax.grad(_kinetic, argnums=0)(q, qv)
    return tuple(d - g for d, g in zip(dir_term, grad_q))


def _fluid_qfrc(q, qv):
    """Generalized fluid forces: per-link drag/viscous wrench pulled back
    through the kinematics VJP (exactly Σ JᵀF without forming J)."""
    out, kin_vjp = jax.vjp(_kin, q)
    vel = jax.jvp(_kin, (q,), (qv,))[1]
    th = out[6:9]
    cot = [None] * 9
    for i in range(3):
        c, s = jnp.cos(th[i]), jnp.sin(th[i])
        vx, vy, w = vel[2 * i], vel[2 * i + 1], vel[6 + i]
        v_par = vx * c + vy * s
        v_perp = -vx * s + vy * c
        f_par = -(_C_VISC_F + _C_PAR * jnp.abs(v_par)) * v_par
        f_perp = -(_C_VISC_F + _C_PERP * jnp.abs(v_perp)) * v_perp
        cot[2 * i] = f_par * c - f_perp * s
        cot[2 * i + 1] = f_par * s + f_perp * c
        cot[6 + i] = -(_C_VISC_T + _C_ROT * jnp.abs(w)) * w
    return kin_vjp(tuple(cot))[0]


def _chol5(m):
    """Unrolled scalar Cholesky of the lower-triangle scalar matrix from
    _mass_entries. Batched tiny-matrix jnp.linalg.cholesky lowers to
    dynamic-slice loops on TPU; this stays dense elementwise VPU work."""
    l = [[None] * 5 for _ in range(5)]
    for i in range(5):
        for j in range(i + 1):
            s = m[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(s)
            else:
                l[i][j] = s / l[j][j]
    return l


def _chol_solve5(l, b):
    """Solve L Lᵀ x = b (b: 5 scalars) with the unrolled factor."""
    y = []
    for i in range(5):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y.append(s / l[i][i])
    x = [None] * 5
    for i in reversed(range(5)):
        s = y[i]
        for k in range(i + 1, 5):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return x


def _impedance(pos):
    x = jnp.clip(jnp.abs(pos) / _WIDTH, 0.0, 1.0)
    y = jnp.where(x < _MID, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) ** 2)
    return _D0 + (_DMAX - _D0) * y


def _limit_lambdas(q, qv, c3, c4, a_smooth):
    """Soft-limit λ for the two motor joints (dofs 3, 4): the projected
    2-constraint solve, enumerating the active set (KKT of the convex QP:
    λ ≥ 0, slack ≥ 0 on inactive components). c3/c4 are M⁻¹'s columns for
    unit loads on dofs 3/4. Returns (s3·λ3, s4·λ4)."""
    arefs, signs, active, rs = [], [], [], []
    for k, dof in enumerate((3, 4)):
        qk = q[dof]
        d_lo = qk + _LIMIT
        d_hi = _LIMIT - qk
        lower_closer = d_lo < d_hi
        pos = jnp.where(lower_closer, d_lo, d_hi)
        s = jnp.where(lower_closer, 1.0, -1.0)
        imp = _impedance(pos)
        arefs.append(-_BC * (s * qv[dof]) - _KC * imp * pos)
        signs.append(s)
        active.append(pos < 0.0)
        rs.append((1.0 - imp) / imp * _INVWEIGHT[k])
    s3, s4 = signs
    a00, a11 = c3[3], c4[4]
    a01 = s3 * s4 * c4[3]
    a10 = s3 * s4 * c3[4]
    rhs0 = jnp.where(active[0], arefs[0] - s3 * a_smooth[3], 0.0)
    rhs1 = jnp.where(active[1], arefs[1] - s4 * a_smooth[4], 0.0)
    r00, r11 = a00 + rs[0], a11 + rs[1]
    # candidate: both active (2x2 solve)
    det = r00 * r11 - a01 * a10
    lb0 = (r11 * rhs0 - a01 * rhs1) / det
    lb1 = (-a10 * rhs0 + r00 * rhs1) / det
    # candidates: single active
    l0 = rhs0 / r00
    l1 = rhs1 / r11
    ok_both = active[0] & active[1] & (lb0 >= 0.0) & (lb1 >= 0.0)
    ok_0 = active[0] & (l0 > 0.0) & ((~active[1]) | (a10 * l0 - rhs1 >= 0.0))
    ok_1 = active[1] & (l1 > 0.0) & ((~active[0]) | (a01 * l1 - rhs0 >= 0.0))
    lam0 = jnp.where(ok_both, lb0, jnp.where(ok_0, l0, 0.0))
    lam1 = jnp.where(ok_both, lb1, jnp.where(ok_1, l1, 0.0))
    lam0 = jnp.maximum(lam0, 0.0)
    lam1 = jnp.maximum(lam1, 0.0)
    return s3 * lam0, s4 * lam1


def _qacc(q, qv, tau3, tau4):
    """Constrained forward dynamics over 5-tuples; exactly mj_forward."""
    m = _mass_entries(q)
    l = _chol5(m)
    fluid = _fluid_qfrc(q, qv)
    bias = _bias(q, qv)
    rhs = [fluid[i] - bias[i] for i in range(5)]
    rhs[3] = rhs[3] + tau3
    rhs[4] = rhs[4] + tau4
    a_smooth = _chol_solve5(l, rhs)
    zero = jnp.zeros_like(q[0])
    one = jnp.ones_like(q[0])
    c3 = _chol_solve5(l, [zero, zero, zero, one, zero])
    c4 = _chol_solve5(l, [zero, zero, zero, zero, one])
    f3, f4 = _limit_lambdas(q, qv, c3, c4, a_smooth)
    return tuple(a_smooth[i] + c3[i] * f3 + c4[i] * f4 for i in range(5))


def _rk4(q, qv, tau3, tau4):
    """One mj_RungeKutta step at h=_H over (5-tuple, 5-tuple) state."""
    def f(qq, vv):
        return vv, _qacc(qq, vv, tau3, tau4)

    def add(a, b, h):
        return tuple(x + h * y for x, y in zip(a, b))

    k1q, k1v = f(q, qv)
    k2q, k2v = f(add(q, k1q, 0.5 * _H), add(qv, k1v, 0.5 * _H))
    k3q, k3v = f(add(q, k2q, 0.5 * _H), add(qv, k2v, 0.5 * _H))
    k4q, k4v = f(add(q, k3q, _H), add(qv, k3v, _H))
    qn = tuple(
        a + (_H / 6.0) * (b + 2.0 * c + 2.0 * d + e)
        for a, b, c, d, e in zip(q, k1q, k2q, k3q, k4q)
    )
    vn = tuple(
        a + (_H / 6.0) * (b + 2.0 * c + 2.0 * d + e)
        for a, b, c, d, e in zip(qv, k1v, k2v, k3v, k4v)
    )
    return qn, vn


@dataclasses.dataclass(frozen=True, eq=False)
class SwimmerDeviceEnv(Env):
    """gymnasium Swimmer-v4 with on-device dynamics.

    State x = [qpos(5), qvel(5)]; action = 2 motor torques ∈ [−1,1]
    (gear 150). Reward follows swimmer_v4.py (forward x velocity of the
    torso slide minus 1e-4·Σa²), exposed via step_reward since it needs
    the pre-step x.
    """

    state_dim = 10
    action_dim = 2
    action_low = np.array([-1.0, -1.0])
    action_high = np.array([1.0, 1.0])

    @property
    def dt(self) -> float:
        return _H * _FRAME_SKIP

    def reset(self, key: jax.Array | None = None) -> EnvState:
        return make_state(jnp.zeros((10,), dtype=self.dtype))

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        a = jnp.clip(action, -1.0, 1.0)
        tau3 = _GEAR * a[0]
        tau4 = _GEAR * a[1]
        q = tuple(state.x[i] for i in range(5))
        qv = tuple(state.x[5 + i] for i in range(5))

        def sub(carry, _):
            qq, vv = carry
            return _rk4(qq, vv, tau3, tau4), None

        (q, qv), _ = jax.lax.scan(sub, (q, qv), None, length=_FRAME_SKIP)
        x = jnp.stack(q + qv).astype(self.dtype)
        return EnvState(x=x, t=state.t + 1, done=state.done)

    def step_reward(self, state: EnvState, action: jnp.ndarray):
        new = self.step(state, action)
        x_vel = (new.x[0] - state.x[0]) / self.dt
        r = x_vel - 1e-4 * jnp.sum(action * action)  # gym uses the raw action
        return new, r

    def reward(self, state: EnvState) -> jnp.ndarray:
        """Instantaneous forward velocity (harness accounting; the exact
        gym reward comes from step_reward)."""
        return state.x[5]

    def observation(self, state: EnvState) -> jnp.ndarray:
        """gym obs: qpos[2:] + qvel (8,)."""
        return jnp.concatenate([state.x[2:5], state.x[5:]])
