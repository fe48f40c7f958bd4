#!/usr/bin/env python
"""Analytic ICI halo-traffic model for the overlapped sharded step.

Computes, from the actual pipeline constants (k, nn, apron widths — the
same numbers ``parallel.sharded.ShardedPipeline`` derives), the per-device
halo bytes per step on a (py, px) mesh, and compares them against (a) the
v5e ICI link bandwidth and (b) the measured single-chip compute step — the
overlap-headroom argument behind the >= 90% weak-scaling north star
(BASELINE.md row 3).  No device needed; this is the committed, reproducible
form of the "Scaling" analysis in BASELINE.md.

Usage: python benchmarks/ici_model.py [--grid global010] [--mesh 2x4]
       [--compute-ms 0.46]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from bench import GRIDS, GRID_DOMAIN  # noqa: E402

# TPU v5e public interconnect spec: 1600 Gbit/s inter-chip bandwidth per
# chip over 4 ICI links -> 50 GB/s per link per direction.  HBM: 819 GB/s.
ICI_PER_LINK_GBS = 1600 / 8 / 4
HBM_GBS = 819.0


def model(grid_name: str, mesh: tuple[int, int], compute_ms: float,
          nlev: int = 4):
    from seabreeze_param_tpu.core.grid import Grid
    from seabreeze_param_tpu.core.params import Params
    from seabreeze_param_tpu.models.pipeline import TriggerPipeline

    nlat, nlon = GRIDS[grid_name]
    lat0, lat1, lon_span = GRID_DOMAIN.get(grid_name, (90.0, -90.0, 360.0))
    g = Grid.regular(nlat, nlon, lat0=lat0, lat1=lat1, lon1=lon_span)
    pipe = TriggerPipeline(g)
    k, nn = pipe.k, pipe.nn_max
    py, px = mesh
    lh, lw = -(-nlat // py), nlon // px
    a_m = nn + k + 1                 # overlapped mask apron (sharded.py)
    a_t = nn                         # theta apron

    # Exchanged strips per device per step (send side; receive is symmetric
    # on the opposite links): N/S strips w x local_w, E/W strips local_h x
    # w, plus 4 corner blocks w x w, for each exchanged field.
    def field_bytes(wd):
        return 4 * (2 * wd * lw + 2 * lh * wd + 4 * wd * wd)

    b_mask, b_theta = field_bytes(a_m), field_bytes(a_t)
    total = b_mask + b_theta
    # The per-direction worst case rides one link: N (or S) carries
    # (a_m + a_t) rows x local_w cols of both fields.
    per_dir = 4 * (a_m + a_t) * max(lw, lh)
    t_halo_us = per_dir / (ICI_PER_LINK_GBS * 1e3)
    # The overlap window: wind_at_level's full 3-D u/v HBM read, issued
    # between halo_start and halo_finish (sharded.py::_core_overlap).
    window_us = 2 * nlev * lh * lw * 4 / (HBM_GBS * 1e3)
    compute_us = compute_ms * 1e3
    eff = compute_us / (compute_us + max(0.0, t_halo_us - window_us))
    return {
        "grid": grid_name, "mesh": f"{py}x{px}",
        "local_block": [lh, lw], "k": k, "nn": nn,
        "mask_apron": a_m,
        "halo_bytes_per_device_per_step": total,
        "worst_link_bytes": per_dir,
        "t_halo_us_per_link": round(t_halo_us, 2),
        "overlap_window_us": round(window_us, 2),
        "halo_hidden": bool(t_halo_us <= window_us),
        "compute_ms_per_step": compute_ms,
        "projected_weak_scaling_pct": round(100 * eff, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="global010", choices=sorted(GRIDS))
    ap.add_argument("--mesh", default="2x4")
    ap.add_argument("--compute-ms", type=float, default=None,
                    help="measured per-chip compute step for the LOCAL "
                         "block size (default: scaled from the measured "
                         "single-chip step of the global grid)")
    ap.add_argument("--nlev", type=int, default=4)
    args = ap.parse_args()

    py, px = (int(s) for s in args.mesh.split("x"))
    compute = args.compute_ms
    if compute is None:
        # scale the measured full-grid single-chip step by the local-block
        # fraction (the pipeline is cell-local: cost ~ area)
        measured = {"global025": 0.55, "global010": 5.3}
        base = measured.get(args.grid, 0.55)
        compute = base / (py * px)
    print(json.dumps(model(args.grid, (py, px), compute, args.nlev)))


if __name__ == "__main__":
    main()
