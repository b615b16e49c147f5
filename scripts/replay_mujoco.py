"""Cross-implementation correctness check: replay an exported action CSV in
vanilla gymnasium and print the total reward (and optionally render a gif).

Parity with the reference's make_mujoco_gif.py (src/envs/make_mujoco_gif.py):
matching total rewards between the batch engine (C++) and gymnasium (Python)
validates the executed action sequence end-to-end.

Usage:
    python scripts/replay_mujoco.py ACTS.csv --env HalfCheetah-v4 [--gif out.gif]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def replay(csv_path: str, env_name: str, gif: str | None = None) -> float:
    import gymnasium

    actions = np.loadtxt(csv_path, delimiter=",", ndmin=2)
    render_mode = "rgb_array" if gif else None
    try:
        env = gymnasium.make(
            env_name, reset_noise_scale=0.0, render_mode=render_mode
        )
    except TypeError:
        env = gymnasium.make(env_name, render_mode=render_mode)
    env.reset(seed=1)
    # pin the start state exactly (some tasks inject reset noise that no
    # kwarg disables); matches the batch engine's deterministic reset
    u = env.unwrapped
    u.set_state(u.init_qpos, u.init_qvel)
    frames = []
    total = 0.0
    for a in actions:
        _, r, term, trunc, _ = env.step(a)
        total += float(r)
        if gif:
            frames.append(env.render())
        if term or trunc:
            break
    if gif and frames:
        import imageio.v2 as imageio

        imageio.mimsave(gif, frames, fps=20)
    print(f"Total reward: {total:.6f} over {len(actions)} actions")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv")
    ap.add_argument("--env", default="HalfCheetah-v4")
    ap.add_argument("--gif", default=None)
    args = ap.parse_args()
    replay(args.csv, args.env, args.gif)


if __name__ == "__main__":
    main()
