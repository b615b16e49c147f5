"""Round-over-round bench drift report.

Reads every BENCH_r*.json the driver has recorded plus (optionally) a
fresh local `python bench.py` output line, flattens the numeric details,
and prints one table with per-round values and the last-round delta —
so K150/harness-style drift (VERDICT r3 weak-7) is visible at a glance
instead of requiring manual artifact archaeology.

Usage: python scripts/bench_compare_rounds.py [extra_bench_output.json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def _load_round(path: str):
    """Return (label, flat dict of numeric metrics) for one artifact."""
    with open(path) as f:
        raw = json.load(f)
    label = os.path.basename(path).replace("BENCH_", "").replace(".json", "")
    # Driver artifacts wrap the bench line under "parsed"; a raw bench
    # output line is the object itself.
    obj = raw.get("parsed") if isinstance(raw, dict) and "parsed" in raw else raw
    if obj is None:  # r03: the driver could not parse the line
        # salvage what we can from the tail blob
        flat = _flatten(_best_effort_tail(raw.get("tail", "")))
        return label + "*", flat  # * = salvaged from an unparseable tail
    return label, _flatten(obj)


def _best_effort_tail(tail: str) -> dict:
    """r03-style salvage: the tail holds detail fragments like
    '"roofline": {...}, "cemppi_ms_per_ais_iteration": 0.5, ...'."""
    out = {}
    for key, val in re.findall(r'"([a-zA-Z0-9_]+)"\s*:\s*(-?[0-9.]+)', tail):
        try:
            out[key] = float(val)
        except ValueError:
            pass
    return {"details": out}


def _flatten(obj: dict) -> dict:
    flat = {}
    if not isinstance(obj, dict):
        return flat
    if isinstance(obj.get("value"), (int, float)):
        flat["HEADLINE car K8192 steps/s"] = float(obj["value"])
    det = obj.get("details", {})
    for k, v in det.items():
        if isinstance(v, (int, float)):
            flat[k] = float(v)
        elif isinstance(v, dict):  # roofline block
            for kk, vv in v.items():
                if isinstance(vv, (int, float)):
                    flat[f"{k}.{kk}"] = float(vv)
    return flat


def main(extra: str | None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    rounds = [_load_round(p) for p in paths]
    if extra:
        with open(extra) as f:
            line = [ln for ln in f.read().splitlines() if ln.strip()][-1]
        rounds.append(("local", _flatten(json.loads(line))))
    if not rounds:
        print("no BENCH artifacts found")
        return

    keys: list[str] = []
    for _, flat in rounds:
        for k in flat:
            if k not in keys and not k.startswith("compile_s"):
                keys.append(k)
    labels = [lab for lab, _ in rounds]
    w = max(len(k) for k in keys) + 1
    print(f"{'metric'.ljust(w)} " + " ".join(f"{lab:>10s}" for lab in labels)
          + f" {'Δ last':>8s}")
    for k in keys:
        if k.startswith("compile_s"):
            continue
        vals = [flat.get(k) for _, flat in rounds]
        cells = " ".join(
            f"{v:10.1f}" if isinstance(v, float) else f"{'—':>10s}"
            for v in vals
        )
        present = [v for v in vals if isinstance(v, float)]
        delta = ""
        if len(present) >= 2 and present[-2]:
            delta = f"{100.0 * (present[-1] - present[-2]) / abs(present[-2]):+7.1f}%"
        print(f"{k.ljust(w)} {cells} {delta:>8s}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
