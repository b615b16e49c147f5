"""Probe a SPATIAL gymnasium MuJoCo model and dump the constants needed
by an on-device (models/spatial_contact.py) implementation.

Usage: python scripts/probe_spatial.py Ant-v4

Prints a Python-literal constants block (body table with full body-frame
inertias, joint descriptors, floor-contact candidates with capsule axes,
limits, invweights, actuator map) plus diagnostic checks on the live
contact structure. The 3D sibling of scripts/probe_planar.py.
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


def _t(a):
    return "(" + ", ".join(repr(float(x)) for x in np.asarray(a).ravel()) + ")"


def main(env_name: str) -> None:
    import mujoco

    try:
        import gymnasium

        env = gymnasium.make(env_name)
        m = env.unwrapped.model
        frame_skip = env.unwrapped.frame_skip
    except ImportError:
        # Pusher-v4 refuses to build under mujoco>=3 (Farama #950); the
        # parity target is the XML under the INSTALLED mujoco (what the
        # native host engine steps), so load it directly.
        from mpopis_tpu.models.mujoco_host import _TASKS, _gym_asset

        env = None
        m = mujoco.MjModel.from_xml_path(_gym_asset(_TASKS[env_name][0]))
        frame_skip = 5  # gymnasium pusher_v4.py frame_skip
    print(f"# === {env_name} ===")
    print(f"# timestep={m.opt.timestep} integrator={m.opt.integrator} "
          f"(0=Euler 1=RK4) gravity={m.opt.gravity[2]} cone={m.opt.cone}")
    print(f"# frame_skip={frame_skip} nq={m.nq} nv={m.nv} "
          f"nu={m.nu} nbody={m.nbody}")
    print(f"# qpos0={[float(x) for x in m.qpos0]}")

    jnt_kind = {0: "free", 2: "slide", 3: "hinge"}
    print("_BODIES = (  # parent, pos, quat, joints, com(ipos), mass, "
          "inertia(full body-frame 6)")
    for b in range(1, m.nbody):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b)
        riq = _quat_mat(m.body_iquat[b])
        ifull = riq @ np.diag(m.body_inertia[b]) @ riq.T
        i6 = (ifull[0, 0], ifull[0, 1], ifull[0, 2],
              ifull[1, 1], ifull[1, 2], ifull[2, 2])
        joints = []
        jadr = m.body_jntadr[b]
        for j in range(jadr, jadr + m.body_jntnum[b]):
            joints.append(
                f"SJoint(kind={jnt_kind[int(m.jnt_type[j])]!r}, "
                f"dof={int(m.jnt_dofadr[j])}, qadr={int(m.jnt_qposadr[j])}, "
                f"axis={_t(m.jnt_axis[j])}, anchor={_t(m.jnt_pos[j])})"
            )
        print(f"    # {name}")
        print(f"    ({int(m.body_parentid[b]) - 1}, {_t(m.body_pos[b])}, "
              f"{_t(m.body_quat[b])}, ({', '.join(joints)}{',' if joints else ''}), "
              f"{_t(m.body_ipos[b])}, {float(m.body_mass[b])!r}, {_t(i6)}),")
    print(")")

    # floor-contact candidates: every geom that can collide with the plane
    plane = [g for g in range(m.ngeom) if m.geom_type[g] == 0]
    assert len(plane) == 1, "expected exactly one floor plane"
    pg = plane[0]
    assert m.geom_quat[pg][0] == 1.0, "floor must be horizontal (+z)"
    print(f"_FLOOR_Z = {float(m.geom_pos[pg][2])!r}")

    def _collides(g1, g2):
        return bool(
            (m.geom_contype[g1] & m.geom_conaffinity[g2])
            or (m.geom_contype[g2] & m.geom_conaffinity[g1])
        )

    cylinders = []
    print("_CONTACTS = (  # body(0-based), local center, radius, mu, "
          "includemargin, solimp, capsule axis_local (None=sphere), condim")
    for g in range(m.ngeom):
        if g == pg or not _collides(pg, g):
            continue
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g)
        b = int(m.geom_bodyid[g])
        mu = max(m.geom_friction[pg][0], m.geom_friction[g][0])
        margin = float(m.geom_margin[pg] + m.geom_margin[g])
        solimp = _t(m.geom_solimp[g][:3])
        condim = int(max(m.geom_condim[pg], m.geom_condim[g]))
        gr = _quat_mat(m.geom_quat[g])
        if m.geom_type[g] == 2:  # sphere
            print(f"    # {name} (sphere)")
            print(f"    ({b - 1}, {_t(m.geom_pos[g])}, "
                  f"{float(m.geom_size[g][0])!r}, {float(mu)!r}, {margin!r}, "
                  f"{solimp}, None, {condim}),")
        elif m.geom_type[g] == 3:  # capsule
            hl = m.geom_size[g][1]
            axis = gr[:, 2]
            for sgn in (1.0, -1.0):
                end = m.geom_pos[g] + sgn * hl * axis
                print(f"    # {name} end {'+' if sgn > 0 else '-'}")
                print(f"    ({b - 1}, {_t(end)}, {float(m.geom_size[g][0])!r}, "
                      f"{float(mu)!r}, {margin!r}, {solimp}, {_t(axis)}, "
                      f"{condim}),")
        elif m.geom_type[g] == 5:  # upright cylinder on a slide-only body
            cylinders.append(g)
            print(f"    # NOTE geom {name} (cylinder) vs plane: its body "
                  "has no z dof -> the rows have identically zero J and "
                  "contribute no force (skipped; see spatial_contact.py)")
        else:
            print(f"    # SKIPPED geom {name} type {m.geom_type[g]} "
                  f"(unsupported vs plane)")
    print(")")

    # capsule-vs-upright-cylinder pairs (the Pusher arm-object contact)
    cylinders += [g for g in range(m.ngeom)
                  if m.geom_type[g] == 5 and g not in cylinders
                  and any(_collides(g, o) for o in range(m.ngeom)
                          if o != g and m.geom_type[o] == 3)]
    print("_PAIRS = (  # body1, a1, b1, r1, body2, center2, r2, hh2, mu, "
          "includemargin, solimp, condim")
    for cg in cylinders:
        cb = int(m.geom_bodyid[cg])
        # assert the cylinder stays upright: no rotational dofs rootward
        bb = cb
        while bb != 0:
            ja = m.body_jntadr[bb]
            for j in range(ja, ja + m.body_jntnum[bb]):
                assert int(m.jnt_type[j]) == 2, \
                    "cylinder body chain must be slide-only"
            bb = int(m.body_parentid[bb])
        for g in range(m.ngeom):
            if m.geom_type[g] != 3 or not _collides(g, cg):
                continue
            if m.geom_bodyid[g] == cb:
                continue
            name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g)
            b = int(m.geom_bodyid[g])
            gr = _quat_mat(m.geom_quat[g])
            hl = m.geom_size[g][1]
            axis = gr[:, 2]
            a1 = m.geom_pos[g] - hl * axis
            b1 = m.geom_pos[g] + hl * axis
            mu = max(m.geom_friction[g][0], m.geom_friction[cg][0])
            margin = float(m.geom_margin[g] + m.geom_margin[cg])
            condim = int(max(m.geom_condim[g], m.geom_condim[cg]))
            print(f"    # {name} vs cylinder "
                  f"{mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, cg)}")
            print(f"    ({b - 1}, {_t(a1)}, {_t(b1)}, "
                  f"{float(m.geom_size[g][0])!r}, {cb - 1}, "
                  f"{_t(m.geom_pos[cg])}, {float(m.geom_size[cg][0])!r}, "
                  f"{float(m.geom_size[cg][1])!r}, {float(mu)!r}, "
                  f"{margin!r}, {_t(m.geom_solimp[cg][:3])}, {condim}),")
    print(")")

    # body-body self-collision pairs (sphere/capsule geoms) — MuJoCo's
    # broadphase exclusion: same weld, or parent-child welds (the world
    # exception never applies here since neither body is the world).
    # Pair order matches mjCOLLISIONFUNC: swap so type1 <= type2 (sphere
    # before capsule), else ascending geom index.
    def _seg(g):
        gr = _quat_mat(m.geom_quat[g])
        if m.geom_type[g] == 2:  # sphere: zero-length segment
            return m.geom_pos[g], m.geom_pos[g], float(m.geom_size[g][0])
        hl = m.geom_size[g][1]
        axis = gr[:, 2]
        return (m.geom_pos[g] - hl * axis, m.geom_pos[g] + hl * axis,
                float(m.geom_size[g][0]))

    print("_SELF_PAIRS = (  # body1, a1, b1, r1, body2, a2, b2, r2, "
          "includemargin, solimp, condim")
    for g1 in range(m.ngeom):
        for g2 in range(g1 + 1, m.ngeom):
            if m.geom_type[g1] not in (2, 3) or m.geom_type[g2] not in (2, 3):
                continue
            if not _collides(g1, g2):
                continue
            w1 = int(m.body_weldid[m.geom_bodyid[g1]])
            w2 = int(m.body_weldid[m.geom_bodyid[g2]])
            if w1 == w2:
                continue
            wp1 = int(m.body_weldid[m.body_parentid[w1]])
            wp2 = int(m.body_weldid[m.body_parentid[w2]])
            if w1 == wp2 or w2 == wp1:  # parent-child (filterparent)
                continue
            ga, gb = g1, g2
            if m.geom_type[ga] > m.geom_type[gb]:
                ga, gb = gb, ga
            aa, ab, ra = _seg(ga)
            ba, bb, rb = _seg(gb)
            condim = int(max(m.geom_condim[ga], m.geom_condim[gb]))
            margin = float(m.geom_margin[ga] + m.geom_margin[gb])
            n1 = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, ga)
            n2 = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, gb)
            print(f"    # {n1} vs {n2}")
            print(f"    ({int(m.geom_bodyid[ga]) - 1}, {_t(aa)}, {_t(ab)}, "
                  f"{ra!r}, {int(m.geom_bodyid[gb]) - 1}, {_t(ba)}, "
                  f"{_t(bb)}, {rb!r}, {margin!r}, "
                  f"{_t(m.geom_solimp[ga][:3])}, {condim}),")
    print(")")

    print("_LIMITS = (  # dof, lo, hi, solimp, margin")
    for j in range(m.njnt):
        if m.jnt_limited[j]:
            print(f"    ({int(m.jnt_dofadr[j])}, {float(m.jnt_range[j][0])!r}, "
                  f"{float(m.jnt_range[j][1])!r}, {_t(m.jnt_solimp[j][:3])}, "
                  f"{float(m.jnt_margin[j])!r}),")
    print(")")

    print(f"_DAMPING = {_t(m.dof_damping)}")
    print(f"_ARMATURE = {_t(m.dof_armature)}")
    stiff = np.zeros(m.nv)
    springref = np.zeros(m.nv)
    for j in range(m.njnt):
        if m.jnt_type[j] in (2, 3) and m.jnt_stiffness[j] != 0.0:
            stiff[m.jnt_dofadr[j]] = m.jnt_stiffness[j]
            springref[m.jnt_dofadr[j]] = m.qpos_spring[m.jnt_qposadr[j]]
    print(f"_STIFFNESS = {_t(stiff)}")
    print(f"_SPRINGREF = {_t(springref)}")
    print(f"_DOF_INVWEIGHT0 = {_t(m.dof_invweight0)}")
    print(f"_BODY_INVWEIGHT0 = {_t(m.body_invweight0[1:, 0])}")
    print("_ACTUATORS = (  # (dof, gear) per actuator, XML order")
    for a in range(m.nu):
        j = m.actuator_trnid[a, 0]
        print(f"    ({int(m.jnt_dofadr[j])}, {float(m.actuator_gear[a][0])!r}),"
              f"  # {mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_ACTUATOR, a)}")
    print(")")
    if env is not None:
        env.close()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Ant-v4")
