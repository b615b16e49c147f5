"""On-device (pure-JAX) HalfCheetah-v4 — MuJoCo-exact dynamics WITH contacts.

The flagship benchmark of the reference (README.md:58-100 is a HalfCheetah
run through envpool). This module implements half_cheetah.xml end to end on
the TPU: the 9-DoF planar kinematic tree (energy-AD mass matrix/Coriolis via
models/planar.py), joint springs/damping/armature, plane-capsule contacts
with MuJoCo's pyramidal friction model, the joint soft limits, and Euler
integration with implicit damping. Every constant and formula below was
probed from the mujoco wheel and verified numerically (docs/ROADMAP.md
records the probe results):

- plane-capsule contact: one candidate per capsule end sphere (16 total);
  gap = p_z − r, active when gap < 0; contact point (p_x, gap/2); condim-3
  PYRAMIDAL cone ⇒ 4 rows per contact with J = J_normal ± μ·J_tangent per
  tangent direction (the y-tangent rows reduce to two copies of J_normal
  in the plane);
- per-row aref = −b·(J q̇) − k·imp·gap with k = (dmax·tc)⁻², b = 2/(dmax·tc)
  (contact solimp (0, 0.8, 0.01), solref (0.02, 1) ⇒ k=3906.25, b=125);
  row regularizer R = (1−imp)/imp · body_invweight0[b][0] · 2μ²(1+μ²);
- joint limits (6 rows, solimplimit (0, 0.8, 0.03)) solved JOINTLY with
  the contacts: R = (1−imp)/imp · dof_invweight0[d];
- the constrained step is a strictly convex box-QP in λ ≥ 0
  (A = J M⁻¹ Jᵀ + diag(R)); a fixed-iteration ACTIVE-SET solver (refine the
  active set, solve the reduced system by conjugate gradients, project)
  matches MuJoCo's Newton to machine precision on realistic trajectories
  (measured: max rel qfrc error 1.4e-14 over 329 contact substeps with
  outer=3, cg=20, cold start);
- Euler with implicit damping: v' = v + h·(M + h·diag(damping))⁻¹
  (qfrc_smooth + Jᵀλ), q' = q + h·v' (λ solved against the UNDAMPED M).

Obs/reward follow half_cheetah_v4.py: obs = [qpos[1:], qvel] (fresh —
cheetah reads joint state, not xpos), reward = (x'−x)/dt − 0.1·Σa²
(pre-step x ⇒ exposed through step_reward).

TPU layout: scalar/SoA over tuples like the rest of the on-device family;
the CG state is (R_ROWS, K)-shaped with K minor (lane-dense); J is a
static-sparsity structure (each row touches ≤ 6 dofs), applied as unrolled
scalar accumulations.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.models.base import Env, EnvState, make_state
from mpopis_tpu.models.planar import (
    build_planar_dynamics,
    chol_solve_unrolled,
    chol_unrolled,
    impedance,
)

_G = 9.81
_H = 0.01
_FRAME_SKIP = 5
_MU = 0.4
_RADIUS = 0.046

# --- bodies: (name, parent(-1=root/torso chain), offset(x,z) in parent,
#              com(x,z), mass, I_yy, hinge dof index) -----------------------
# torso is the root: origin (q0, 0.7+q1), angle q2.
_BODIES = (
    # torso I_yy is the BODY-FRAME yy inertia (its inertial frame is
    # tilted by iquat, so the principal middle entry does not apply)
    ("torso", -1, (0.0, 0.7), (0.15238987816307403, 0.025398313027179008),
     6.25020920502092, 0.8971176881117483, 2),
    ("bthigh", 0, (-0.5, 0.0), (0.1, -0.13),
     1.5435146443514645, 0.01684433958158996, 3),
    ("bshin", 1, (0.16, -0.25), (-0.14, -0.07),
     1.5874476987447697, 0.018267419079497905, 4),
    ("bfoot", 2, (-0.28, -0.14), (0.03, -0.097),
     1.0953974895397491, 0.0063524232635983275, 5),
    ("fthigh", 0, (0.5, 0.0), (-0.07, -0.12),
     1.4380753138075317, 0.013739643347280341, 6),
    ("fshin", 4, (-0.14, -0.24), (0.065, -0.09),
     1.200836820083682, 0.008222108619246861, 7),
    ("ffoot", 5, (0.13, -0.18), (0.045, -0.07),
     0.8845188284518829, 0.003529109456066946, 8),
)
# capsule endpoints in body-local (x,z); two candidates per geom
_ENDPOINTS = (
    (0, (-0.5, 3.061616997868383e-17)), (0, (0.5, -3.061616997868383e-17)),
    (0, (0.7146493405538257, 0.19672398208600017)),
    (0, (0.4853506594461742, 0.0032760179139998263)),
    (1, (0.18871939418669426, -0.24469031822759044)),
    (1, (0.011280605813305769, -0.015309681772409572)),
    (2, (-0.27446086117273405, -0.13648516234985636)),
    (2, (-0.005539138827266005, -0.003514837650143668)),
    (3, (0.004927244951249871, -0.006405535741606294)),
    (3, (0.05507275504875013, -0.1875944642583937)),
    (4, (-0.003914941666783009, -0.00458004910287256)),
    (4, (-0.136085058333217, -0.23541995089712742)),
    (5, (0.005147897820126257, -0.0025144248195740904)),
    (5, (0.12485210217987375, -0.1774855751804259)),
    (6, (0.005475026862347521, -0.01222650695632252)),
    (6, (0.08452497313765248, -0.1277734930436775)),
)
_N_CON = len(_ENDPOINTS)
_DAMPING = (0.0, 0.0, 0.0, 6.0, 4.5, 3.0, 4.5, 3.0, 1.5)
_ARMATURE = (0.0, 0.0, 0.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
_STIFFNESS = (0.0, 0.0, 0.0, 240.0, 180.0, 120.0, 180.0, 120.0, 60.0)
_GEAR = (120.0, 90.0, 60.0, 120.0, 60.0, 30.0)  # dofs 3..8
_LIMITS = (  # (dof, lo, hi)
    (3, -0.52, 1.05), (4, -0.785, 0.785), (5, -0.4, 0.785),
    (6, -1.0, 0.7), (7, -1.2, 0.87), (8, -0.5, 0.5),
)
_DOF_INVWEIGHT0 = (
    0.10673572816871127, 0.08459229161068711, 0.41634706198577387,
    2.729788644884893, 5.893248984162904, 8.894877004054676,
    3.0813926054768768, 6.882795962275771, 9.468134962769764,
)
_BODY_INVWEIGHT0 = (  # translation component, bodies in _BODIES order
    0.06415751945610272, 0.09691101560963138, 0.12720922534654555,
    0.24374928349017175, 0.08148379481367073, 0.1319968179007737,
    0.2661441029233887,
)
# constraint constants: contact solimp (0, 0.8, 0.01); limit solimp (0, 0.8, 0.03)
_DMAX = 0.8
_KC = 1.0 / (_DMAX * 0.02) ** 2  # 3906.25
_BC = 2.0 / (_DMAX * 0.02)  # 125.0
_CON_WIDTH, _LIM_WIDTH = 0.01, 0.03
_R_FACTOR = 2.0 * _MU * _MU * (1.0 + _MU * _MU)  # pyramidal R scaling
_N_ROWS = len(_LIMITS) + 3 * _N_CON  # [n+μt, n−μt, merged-normal] per contact
# NOTE on row count: each contact's 4 pyramid rows are (n+μt, n−μt, n, n);
# the two identical pure-normal rows carry equal λ at the optimum, so they
# merge into ONE row whose λ represents the TOTAL force of the pair and
# whose regularizer is R/2 (two parallel identical regularized rows):
# substituting ν = λ₁+λ₂ into the stationarity conditions gives
# a·ν + (R/2)·ν = rhs, identical equations, identical coupling into the
# other rows. The solved QP is exactly MuJoCo's.

# chain of hinge dofs (body-index anchors) from each body to the root
_CHAINS = []
for bi, (_, parent, *_rest) in enumerate(_BODIES):
    chain = []
    cur = bi
    while cur != -1:
        chain.append(cur)
        cur = _BODIES[cur][1]
    _CHAINS.append(tuple(chain))


def _frames(q):
    """Per-body world origin (x, z) and absolute angle from qpos tuple."""
    ox = [None] * 7
    oz = [None] * 7
    th = [None] * 7
    for bi, (_, parent, (px, pz), _com, _m, _i, dof) in enumerate(_BODIES):
        if parent == -1:
            ox[bi] = q[0]  # torso slides from (0, 0.7)
            oz[bi] = q[1] + pz
            th[bi] = q[2]
        else:
            c, s = jnp.cos(th[parent]), jnp.sin(th[parent])
            ox[bi] = ox[parent] + c * px + s * pz
            oz[bi] = oz[parent] - s * px + c * pz
            th[bi] = th[parent] + q[dof]
    return ox, oz, th


def _kin(q):
    """Kinematics outputs: 7×(com_x, com_z) + 7 angles (21-tuple)."""
    ox, oz, th = _frames(q)
    out = []
    for bi, (_, _p, _off, (cx, cz), _m, _i, _d) in enumerate(_BODIES):
        c, s = jnp.cos(th[bi]), jnp.sin(th[bi])
        out.append(ox[bi] + c * cx + s * cz)
        out.append(oz[bi] - s * cx + c * cz)
    out.extend(th)
    return tuple(out)


_MASSES = tuple(b[4] for b in _BODIES)
_IYY = tuple(b[5] for b in _BODIES)
_W_OUT = tuple(
    w for m in _MASSES for w in (m, m)
) + _IYY
_POT = tuple(
    c for m in _MASSES for c in (0.0, m * _G)
) + (0.0,) * 7

_, _mass_entries, _bias = build_planar_dynamics(
    _kin,
    kin_weights=_W_OUT,
    pot_coeffs=_POT,
    n_dof=9,
    damping=(0.0,) * 9,  # damping/springs handled in qfrc_smooth below
    armature=_ARMATURE,
    limits=(),
    timestep=_H,
)


def _impedance(pos, width):
    """Cheetah solimp: d0=0 (clamped to mjMINIMP inside planar.impedance),
    dmax=0.8."""
    return impedance(pos, d0=0.0, dmax=_DMAX, width=width)


def _endpoint_world(q):
    """World (x, z) of the 16 candidate contact spheres."""
    ox, oz, th = _frames(q)
    pts = []
    for bi, (lx, lz) in _ENDPOINTS:
        c, s = jnp.cos(th[bi]), jnp.sin(th[bi])
        pts.append((ox[bi] + c * lx + s * lz, oz[bi] - s * lx + c * lz))
    return pts, (ox, oz, th)


def _contact_rows(q, qv, zero):
    """Constraint rows: (J as list of 9 scalars, aref, R, active) per row.

    Rows: 6 joint limits, then per contact [n+μt, n−μt, merged-normal]
    (see the row-count note above). Jacobians are analytic over the static
    kinematic chains: for a hinge dof anchored at world (ax, az),
    ∂p_z/∂θ = −(p_x − ax) and ∂p_x/∂θ = (p_z − az); slides contribute
    identity entries. Normal rows use the sphere-center x; tangential rows
    use the CONTACT POINT z = gap/2 (verified against efc_J). `zero` is
    the caller's structural-zero sentinel: the solver skips J entries that
    ARE this object, so it must be shared (XLA does not fold float x·0).
    """
    rows = []
    # --- joint limits ---
    for dof, lo, hi in _LIMITS:
        d_lo = q[dof] - lo
        d_hi = hi - q[dof]
        lower_closer = d_lo < d_hi
        pos = jnp.where(lower_closer, d_lo, d_hi)
        sgn = jnp.where(lower_closer, 1.0, -1.0)
        imp = _impedance(pos, _LIM_WIDTH)
        aref = -_BC * (sgn * qv[dof]) - _KC * imp * pos
        r_reg = (1.0 - imp) / imp * _DOF_INVWEIGHT0[dof]
        j = [zero] * 9
        j[dof] = sgn
        rows.append((j, aref, r_reg, pos < 0.0))

    pts, (ox, oz, th) = _endpoint_world(q)
    for ci, (bi, _local) in enumerate(_ENDPOINTS):
        px, pz = pts[ci]
        gap = pz - _RADIUS
        active = gap < 0.0
        cpz = 0.5 * gap  # contact point z (midpoint of the gap)
        # normal and tangent Jacobians over the chain
        jn = [zero] * 9
        jt = [zero] * 9
        jn[1] = jnp.ones_like(q[0])  # rootz
        jt[0] = jnp.ones_like(q[0])  # rootx
        for body in _CHAINS[bi]:
            dof = _BODIES[body][6]
            ax, az = ox[body], oz[body]
            jn[dof] = -(px - ax)
            jt[dof] = cpz - az
        imp = _impedance(gap, _CON_WIDTH)
        r_reg = (1.0 - imp) / imp * _BODY_INVWEIGHT0[bi] * _R_FACTOR
        jv_n = sum(jn[d] * qv[d] for d in range(9) if not (jn[d] is zero))
        jv_t = sum(jt[d] * qv[d] for d in range(9) if not (jt[d] is zero))
        base_aref = -_KC * imp * gap
        # rows n ± μ t (preserve structural-zero identity for sparsity)
        for sgn in (1.0, -1.0):
            j = []
            for d in range(9):
                if jn[d] is zero and jt[d] is zero:
                    j.append(zero)
                elif jn[d] is zero:
                    j.append(sgn * _MU * jt[d])
                elif jt[d] is zero:
                    j.append(jn[d])
                else:
                    j.append(jn[d] + sgn * _MU * jt[d])
            aref = -_BC * (jv_n + sgn * _MU * jv_t) + base_aref
            rows.append((j, aref, r_reg, active))
        # merged pure-normal pair: R/2 and doubled force (see note)
        rows.append((list(jn), -_BC * jv_n + base_aref, 0.5 * r_reg, active))
    return rows


def _solve_qp(rows, zero, l_chol, a_smooth, outer: int, cg: int):
    """Fixed-iteration active-set/CG solve of the strictly convex box-QP
    min ½λᵀ(A+R)λ − rhsᵀλ, λ≥0 (A = J M⁻¹ Jᵀ), matrix-free through the
    static-sparsity J (`zero` is the shared structural-zero sentinel the
    rows were built with). Returns qfrc_constraint as a 9-tuple."""
    n = len(rows)
    assert n == _N_ROWS, (n, _N_ROWS)

    def j_t_apply(lam_rows):
        """u = Σ_r λ_r J_rᵀ (9 scalars)."""
        u = [zero] * 9
        for r, (j, _a, _r, _act) in enumerate(rows):
            lr = lam_rows[r]
            for d in range(9):
                if j[d] is not zero:
                    u[d] = u[d] + lr * j[d]
        return u

    def a_apply(lam_rows):
        """(A λ)_r = J_r M⁻¹ (Jᵀλ)."""
        u = j_t_apply(lam_rows)
        w = chol_solve_unrolled(l_chol, u, 9)
        out = []
        for j, _a, _r, _act in rows:
            s = zero
            for d in range(9):
                if j[d] is not zero:
                    s = s + j[d] * w[d]
            out.append(s)
        return out

    rhs = []
    for j, aref, _r, act in rows:
        s = zero
        for d in range(9):
            if j[d] is not zero:
                s = s + j[d] * a_smooth[d]
        rhs.append(jnp.where(act, aref - s, 0.0))
    rhs = jnp.stack(rhs)  # (n, ...) K-minor
    r_diag = jnp.stack([r[2] for r in rows])
    valid = jnp.stack([jnp.broadcast_to(r[3], rhs[0].shape) for r in rows])

    def ar_apply(lam):
        a = a_apply([lam[r] for r in range(n)])
        return jnp.stack(a) + r_diag * lam

    lam0 = jnp.zeros_like(rhs)

    def outer_body(lam, _):
        grad = ar_apply(lam) - rhs
        active = valid & ((lam > 0.0) | (grad < 0.0))
        x0 = jnp.where(active, lam, 0.0)

        def masked_ar(v):
            return jnp.where(active, ar_apply(jnp.where(active, v, 0.0)), 0.0)

        r0 = jnp.where(active, rhs - ar_apply(x0), 0.0)

        def cg_body(carry, _):
            x, r, p, rs = carry
            ap = masked_ar(p)
            denom = jnp.sum(p * ap, axis=0)
            alpha = jnp.where(denom > 1e-30, rs / jnp.maximum(denom, 1e-30), 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            rs_new = jnp.sum(r * r, axis=0)
            beta = jnp.where(rs > 1e-30, rs_new / jnp.maximum(rs, 1e-30), 0.0)
            p = r + beta * p
            return (x, r, p, rs_new), None

        (x, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, r0, r0, jnp.sum(r0 * r0, axis=0)), None, length=cg
        )
        return jnp.maximum(jnp.where(active, x, 0.0), 0.0), None

    lam, _ = jax.lax.scan(outer_body, lam0, None, length=outer)

    # qfrc = Jᵀλ (merged normal rows' λ already represents the pair total)
    return tuple(j_t_apply([lam[r] for r in range(n)]))


def _qfrc_smooth(q, qv, tau):
    """Actuation + passive (springs + explicit damping) − bias."""
    bias = _bias(q, qv)
    out = []
    for d in range(9):
        s = tau[d] - bias[d] - _DAMPING[d] * qv[d] - _STIFFNESS[d] * q[d]
        out.append(s)
    return out


def _euler_step(q, qv, tau, outer, cg):
    m = _mass_entries(q)
    l = chol_unrolled(m, 9)
    smooth = _qfrc_smooth(q, qv, tau)
    a_smooth = chol_solve_unrolled(l, smooth, 9)
    zero = jnp.zeros_like(q[0])
    rows = _contact_rows(q, qv, zero)
    qfrc_c = _solve_qp(rows, zero, l, a_smooth, outer, cg)
    # implicit damping: (M + h·D) Δv/h = smooth + qfrc_c
    md = [[m[i][j] for j in range(i + 1)] for i in range(9)]
    for d in range(9):
        md[d][d] = md[d][d] + _H * _DAMPING[d]
    ld = chol_unrolled(md, 9)
    acc = chol_solve_unrolled(
        ld, [smooth[d] + qfrc_c[d] for d in range(9)], 9
    )
    qv2 = tuple(qv[d] + _H * acc[d] for d in range(9))
    q2 = tuple(q[d] + _H * qv2[d] for d in range(9))
    return q2, qv2


@dataclasses.dataclass(frozen=True, eq=False)
class CheetahDeviceEnv(Env):
    """gymnasium HalfCheetah-v4 with on-device dynamics (incl. contacts).

    State x = [qpos(9), qvel(9)]; action = 6 joint torques ∈ [−1, 1]
    scaled by the per-joint gears. solver_outer/solver_cg set the fixed
    iteration counts of the contact QP solve: the defaults (3, 16) are
    control-grade (contact forces to ~1e-3 — ample for sampling-based
    control); (6, 40) matches mj_step to solver tolerance even on
    deep-contact states (the parity tests use that setting).
    """

    solver_outer: int = 3
    solver_cg: int = 16

    state_dim = 18
    action_dim = 6
    action_low = np.array([-1.0] * 6)
    action_high = np.array([1.0] * 6)

    @property
    def dt(self) -> float:
        return _H * _FRAME_SKIP

    def reset(self, key: jax.Array | None = None) -> EnvState:
        return make_state(jnp.zeros((18,), dtype=self.dtype))

    def step(self, state: EnvState, action: jnp.ndarray) -> EnvState:
        a = jnp.clip(action, -1.0, 1.0)
        zero = jnp.zeros_like(state.x[0])
        tau = (zero, zero, zero) + tuple(
            _GEAR[i] * a[i] for i in range(6)
        )
        q = tuple(state.x[i] for i in range(9))
        qv = tuple(state.x[9 + i] for i in range(9))

        def sub(carry, _):
            qq, vv = carry
            return _euler_step(qq, vv, tau, self.solver_outer, self.solver_cg), None

        (q, qv), _ = jax.lax.scan(sub, (q, qv), None, length=_FRAME_SKIP)
        x = jnp.stack(q + qv).astype(self.dtype)
        return EnvState(x=x, t=state.t + 1, done=state.done)

    def step_reward(self, state: EnvState, action: jnp.ndarray):
        new = self.step(state, action)
        x_vel = (new.x[0] - state.x[0]) / self.dt
        r = x_vel - 0.1 * jnp.sum(action * action)  # half_cheetah_v4.py
        return new, r

    def reward(self, state: EnvState) -> jnp.ndarray:
        """Instantaneous forward velocity (harness accounting)."""
        return state.x[9]

    def observation(self, state: EnvState) -> jnp.ndarray:
        """gym obs: qpos[1:] + qvel (17,)."""
        return jnp.concatenate([state.x[1:9], state.x[9:]])
