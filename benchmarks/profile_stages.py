#!/usr/bin/env python
"""Per-stage device timing of the trigger pipeline.

Times each pipeline stage (coastline Sobel, coast-distance transform, ring
THC search, trigger elementwise tail, full fused step) as its own jitted
program on the current backend, so optimization effort goes where the
milliseconds are.  Stage timings measured standalone slightly overcount the
fused total (XLA fuses across stage boundaries in the real step), so the
full-step time is also printed.

Usage: python benchmarks/profile_stages.py [--grid global025] [--pallas/--no-pallas]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import GRIDS, make_world  # noqa: E402


def timeit(fn, *args, repeats=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="global025", choices=sorted(GRIDS))
    ap.add_argument("--nlev", type=int, default=4)
    ap.add_argument("--pallas", default=None, action="store_true")
    ap.add_argument("--no-pallas", dest="pallas", action="store_false")
    args = ap.parse_args()

    from seabreeze_param_tpu.utils.compile_cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    from seabreeze_param_tpu.core.grid import Grid
    from seabreeze_param_tpu.core.params import Params
    from seabreeze_param_tpu.core.state import TriggerState
    from seabreeze_param_tpu.models.pipeline import TriggerPipeline
    from seabreeze_param_tpu.ops.coastline import get_edges
    from seabreeze_param_tpu.ops.distance import coast_distance
    from seabreeze_param_tpu.ops.trigger import trigger_step, wind_at_level

    platform = jax.devices()[0].platform
    if args.pallas is None:
        args.pallas = platform not in ("cpu", "gpu")

    nlat, nlon = GRIDS[args.grid]
    lsm, z, std, pres, theta, u, v, ci = make_world(nlat, nlon, args.nlev, 1)
    grid = Grid.regular(nlat, nlon, lat0=90.0, lat1=-90.0)
    pipe = TriggerPipeline(grid, use_pallas=args.pallas)
    params = Params()

    lsm_d = jnp.asarray(lsm)
    ci_d = jnp.asarray(ci[0])
    th_d = jnp.asarray(theta[0])
    u_d, v_d = jnp.asarray(u[0]), jnp.asarray(v[0])
    z_d, std_d, pres_d = jnp.asarray(z), jnp.asarray(std), jnp.asarray(pres)

    f_edges = jax.jit(lambda l, c: get_edges(l, c))
    coast = f_edges(lsm_d, ci_d)

    f_dist = jax.jit(lambda c, l: coast_distance(
        c, l, grid, params.maxdist, use_pallas=args.pallas))
    cdist = f_dist(coast, lsm_d)

    state = TriggerState.zeros((nlat, nlon))
    f_trig = jax.jit(lambda s, t, uu, vv, cd: trigger_step(
        s, t, uu, vv, cd, z_d, std_d, pres_d, params, pipe.nn_max,
        use_pallas=args.pallas))
    f_wind = jax.jit(lambda uu, vv: wind_at_level(
        uu, vv, pres_d, params.target_plev_pa))
    f_step = jax.jit(lambda s, t, uu, vv, c: pipe.step(
        s, t, uu, vv, lsm_d, z_d, std_d, pres_d, ci=c))

    rows = [
        ("get_edges (sobel)", timeit(f_edges, lsm_d, ci_d)),
        ("coast_distance", timeit(f_dist, coast, lsm_d)),
        ("trigger_step (ring+tail)", timeit(f_trig, state, th_d, u_d, v_d,
                                            cdist)),
        ("  wind_at_level only", timeit(f_wind, u_d, v_d)),
        ("FULL step (fused)", timeit(f_step, state, th_d, u_d, v_d, ci_d)),
    ]
    print(f"# {args.grid} ({nlat}x{nlon}) nlev={args.nlev} "
          f"pallas={args.pallas} platform={platform} "
          f"k={pipe.k} nn={pipe.nn_max}")
    for name, t in rows:
        print(f"{name:28s} {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
