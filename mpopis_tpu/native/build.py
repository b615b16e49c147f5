"""Build the envpool_lite native engine against the MuJoCo library shipped
with the `mujoco` wheel. Cached; rebuilt when the source changes."""

from __future__ import annotations

import hashlib
import os
import subprocess

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "envpool_lite.cc")
_OUT = os.path.join(_DIR, "libenvpool_lite.so")
_STAMP = os.path.join(_DIR, ".build_stamp")


def _mujoco_paths():
    import mujoco

    pkg = os.path.dirname(mujoco.__file__)
    include = os.path.join(pkg, "include")
    libs = [f for f in os.listdir(pkg) if f.startswith("libmujoco.so")]
    if not os.path.isdir(include) or not libs:
        raise RuntimeError("mujoco wheel does not ship headers/library")
    return pkg, include, libs[0]


def build(force: bool = False) -> str:
    """Compile (if needed) and return the path to libenvpool_lite.so."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if not force and os.path.exists(_OUT) and os.path.exists(_STAMP):
        with open(_STAMP) as f:
            if f.read().strip() == digest:
                return _OUT

    pkg, include, libname = _mujoco_paths()
    # Link against the versioned .so directly; rpath the wheel dir.
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread", "-fopenmp",
        f"-I{include}", _SRC,
        os.path.join(pkg, libname),
        f"-Wl,-rpath,{pkg}",
        "-o", _OUT,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    with open(_STAMP, "w") as f:
        f.write(digest)
    return _OUT
