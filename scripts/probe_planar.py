"""Probe a planar gymnasium MuJoCo model and dump the constants needed by
an on-device (models/planar_contact.py) implementation.

Usage: python scripts/probe_planar.py Hopper-v4

Prints a Python-literal constants block (body table, capsule endpoints,
limits, invweights, gears) plus diagnostic checks on the live contact
structure (pairs, condim, friction, includemargin, solref/solimp, KBIP).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np


def _quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def main(env_name: str) -> None:
    import gymnasium
    import mujoco

    env = gymnasium.make(env_name)
    m = env.unwrapped.model
    d = env.unwrapped.data

    print(f"# === {env_name} ===")
    print(f"# timestep={m.opt.timestep} integrator={m.opt.integrator} "
          f"(0=Euler 1=RK4) gravity={m.opt.gravity[2]}")
    print(f"# frame_skip={env.unwrapped.frame_skip} nq={m.nq} nv={m.nv} nu={m.nu}")
    print(f"# qpos0={m.qpos0}")

    # --- joints/dofs ---
    print("# dofs: name axis anchor(pos in body) damping armature stiffness "
          "range(rad) invweight0")
    for j in range(m.njnt):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_JOINT, j)
        dof = m.jnt_dofadr[j]
        print(f"#  dof {dof}: {name} type={m.jnt_type[j]} axis={m.jnt_axis[j]} "
              f"pos={m.jnt_pos[j]} body={m.jnt_bodyid[j]} "
              f"damp={m.dof_damping[dof]} arm={m.dof_armature[dof]} "
              f"stiff={m.jnt_stiffness[j]} limited={m.jnt_limited[j]} "
              f"range={m.jnt_range[j]} solimp={m.jnt_solimp[j]} "
              f"solref={m.jnt_solref[j]} margin={m.jnt_margin[j]} "
              f"invw0={m.dof_invweight0[dof]}")

    # --- bodies ---
    print("# bodies: (name, parent_body, pos(x,z), ipos(x,z), mass, Iyy_bodyframe)")
    for b in range(1, m.nbody):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b)
        R = _quat_mat(m.body_iquat[b])
        iyy = (R @ np.diag(m.body_inertia[b]) @ R.T)[1, 1]
        print(f"#  body {b}: {name!r} parent={m.body_parentid[b]} "
              f"pos=({m.body_pos[b][0]!r}, {m.body_pos[b][2]!r}) "
              f"ipos=({m.body_ipos[b][0]!r}, {m.body_ipos[b][2]!r}) "
              f"mass={m.body_mass[b]!r} iyy={iyy!r} "
              f"invw0={m.body_invweight0[b][0]!r}")

    # --- geoms / capsule endpoints ---
    print("# capsule endpoints (body-local): geom body (x1,z1) (x2,z2) r mu "
          "margin solimp solref")
    for g in range(m.ngeom):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g)
        t = m.geom_type[g]
        if t == mujoco.mjtGeom.mjGEOM_PLANE:
            print(f"#  geom {g}: {name!r} PLANE friction={m.geom_friction[g]} "
                  f"margin={m.geom_margin[g]} solimp={m.geom_solimp[g]} "
                  f"condim={m.geom_condim[g]} contype={m.geom_contype[g]} "
                  f"conaff={m.geom_conaffinity[g]}")
            continue
        R = _quat_mat(m.geom_quat[g])
        half = m.geom_size[g][1] if t == mujoco.mjtGeom.mjGEOM_CAPSULE else 0.0
        axis = R[:, 2]
        p = m.geom_pos[g]
        e1 = p + half * axis
        e2 = p - half * axis
        print(f"#  geom {g}: {name!r} body={m.geom_bodyid[g]} type={t} "
              f"e1=({e1[0]!r}, {e1[2]!r}) e2=({e2[0]!r}, {e2[2]!r}) "
              f"r={m.geom_size[g][0]!r} fric={m.geom_friction[g]} "
              f"margin={m.geom_margin[g]!r} solimp={m.geom_solimp[g]} "
              f"solref={m.geom_solref[g]} condim={m.geom_condim[g]} "
              f"contype={m.geom_contype[g]} conaff={m.geom_conaffinity[g]}")

    print("# actuators: gear per actuated dof")
    for a in range(m.nu):
        j = m.actuator_trnid[a][0]
        print(f"#  act {a}: joint={mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_JOINT, j)} "
              f"dof={m.jnt_dofadr[j]} gear={m.actuator_gear[a][0]!r} "
              f"ctrlrange={m.actuator_ctrlrange[a]}")

    # --- live contact structure over a random rollout ---
    rng = np.random.default_rng(0)
    env.reset(seed=0)
    pair_stats: dict[tuple[str, str], int] = {}
    max_con = 0
    example = None
    for step in range(400):
        a = rng.uniform(-1, 1, m.nu)
        env.step(a)
        max_con = max(max_con, d.ncon)
        for ci in range(d.ncon):
            c = d.contact[ci]
            g1 = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, c.geom1)
            g2 = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, c.geom2)
            pair_stats[(g1, g2)] = pair_stats.get((g1, g2), 0) + 1
            if example is None or step == 200:
                example = (g1, g2, c.dim, c.friction.copy(),
                           c.includemargin, c.solref.copy(), c.solimp.copy(),
                           c.dist, c.pos.copy(), c.frame.copy())
        if env.unwrapped.data.time > 1e9:
            break
    print(f"# contact pairs over 400 random steps (max ncon={max_con}):")
    for k, v in sorted(pair_stats.items(), key=lambda kv: -kv[1]):
        print(f"#  {k}: {v}")
    if example:
        g1, g2, dim, fric, inc, solref, solimp, dist, pos, frame = example
        print(f"# example contact: {g1}/{g2} dim={dim} friction={fric} "
              f"includemargin={inc!r} solref={solref} solimp={solimp} "
              f"dist={dist!r} pos={pos} frame={frame}")

    # efc row structure on the final state
    mujoco.mj_forward(m, d)
    print(f"# final state: ncon={d.ncon} nefc={d.nefc}")
    if d.nefc:
        print(f"# efc_type={d.efc_type[:d.nefc]}")
        print(f"# efc_pos={np.array(d.efc_pos[:d.nefc])}")
        print(f"# efc_margin={np.array(d.efc_margin[:d.nefc])}")
        print(f"# efc_R={np.array(d.efc_R[:d.nefc])}")
        print(f"# efc_aref={np.array(d.efc_aref[:d.nefc])}")
        nv = m.nv
        J = np.array(d.efc_J[:d.nefc * nv]).reshape(d.nefc, nv)
        print(f"# efc_J=\n{J}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Hopper-v4")
