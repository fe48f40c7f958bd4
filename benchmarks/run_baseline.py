#!/usr/bin/env python
"""Measure the CPU baseline for bench.py's ``vs_baseline``.

The reference implementation is Fortran+OpenMP on CPU; this image has no
Fortran compiler, so the committed stand-in is ``native/oracle.cc`` — a
loop-faithful C++/OpenMP transcription of the same numerics (validated
bit-for-bit against the NumPy spec oracle by tests/test_native_oracle.py) —
run on all host cores over the same synthetic workload bench.py uses.

Writes benchmarks/baseline_cpu.json:
    {grid: {"grid_points_per_s": N, "seconds_per_step": s,
            "threads": n, "steps": T}}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from bench import GRIDS, make_world  # noqa: E402
from tests.golden import native_oracle as no  # noqa: E402

import numpy as np  # noqa: E402


def run(grid_name: str, steps: int, nlev: int):
    nlat, nlon = GRIDS[grid_name]
    lsm, z, std, pres, theta, u, v, ci = make_world(nlat, nlon, nlev, steps)
    lat = np.linspace(90.0, -90.0, nlat).astype(np.float32)
    lon = np.linspace(0.0, 360.0, nlon, endpoint=False).astype(np.float32)
    # warm once (small) to page in the library
    t0 = time.perf_counter()
    no.native_diag_sequence(steps, pres, z, std, theta, v, u, lsm, ci,
                            lon, lat)
    dt = time.perf_counter() - t0
    pts = steps * nlat * nlon
    return pts / dt, dt / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", nargs="+", default=["global100", "global050",
                                                   "global025"])
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--nlev", type=int, default=4)
    args = ap.parse_args()

    if not no.available():
        print("native oracle unavailable; no baseline written",
              file=sys.stderr)
        return 1

    out_path = os.path.join(HERE, "baseline_cpu.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for g in args.grids:
        thr, sps = run(g, args.steps, args.nlev)
        results[g] = {"grid_points_per_s": round(thr, 1),
                      "seconds_per_step": round(sps, 4),
                      "threads": no.lib().sb_num_threads(),
                      "steps": args.steps}
        print(g, results[g])
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
