#!/usr/bin/env python
"""Tile-shape sweep for the fused ring+trigger Pallas kernel.

The kernel's cost is VPU work on coastal tiles (the band is ~2k+1 cells
wide, so tile granularity sets how much non-band area rides along) plus
the DMA apron amplification (rows to 8, cols to 128 quanta).  This sweeps
tile shapes on the bench world and reports per-step device time via the
N-vs-4N slope method (see profile_stages.py).

Usage: python benchmarks/sweep_ring.py [--grid global025] [--iters 32]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import GRIDS, GRID_DOMAIN, make_world  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="global025", choices=sorted(GRIDS))
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--nlev", type=int, default=4)
    ap.add_argument("--tiles", nargs="*", default=None,
                    help="explicit tile list, e.g. 64x128 128x256")
    args = ap.parse_args()

    from seabreeze_param_tpu.utils.compile_cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from seabreeze_param_tpu.core.grid import Grid
    from seabreeze_param_tpu.core.params import Params
    from seabreeze_param_tpu.models.pipeline import TriggerPipeline
    from seabreeze_param_tpu.ops.coastline import get_edges
    from seabreeze_param_tpu.ops.distance import coast_distance
    from seabreeze_param_tpu.ops.indexing import pad2d
    from seabreeze_param_tpu.ops.orography import sigmoid_weight
    from seabreeze_param_tpu.ops.pallas.ring_kernel import (
        ring_trigger_pallas_padded)
    from seabreeze_param_tpu.ops.trigger import (sea_level_temperature,
                                                 wind_at_level)

    nlat, nlon = GRIDS[args.grid]
    lat0, lat1, lon_span = GRID_DOMAIN.get(args.grid, (90.0, -90.0, 360.0))
    lsm, z, std, pres, theta, u, v, ci = make_world(nlat, nlon, args.nlev, 1)
    grid = Grid.regular(nlat, nlon, lat0=lat0, lat1=lat1, lon1=lon_span)
    pipe = TriggerPipeline(grid)
    params = Params()
    nn = pipe.nn_max

    coast = jax.jit(lambda l, c: get_edges(l, c))(jnp.asarray(lsm),
                                                  jnp.asarray(ci[0]))
    cdist = jax.jit(lambda c, l: coast_distance(c, l, grid, params.maxdist))(
        coast, jnp.asarray(lsm))
    smod = sigmoid_weight(jnp.asarray(std))
    t0 = sea_level_temperature(jnp.asarray(theta[0]), jnp.asarray(z), smod)
    ws_new, wd_new = wind_at_level(jnp.asarray(u[0]), jnp.asarray(v[0]),
                                   jnp.asarray(pres), params.target_plev_pa)
    t0_pad = jax.jit(lambda a: pad2d(a, nn, nn))(t0)
    cd_pad = jax.jit(lambda a: pad2d(a, nn, nn))(cdist)
    fields = (t0_pad, cd_pad, cdist, ws_new, wd_new)

    coastal_frac = float(jnp.mean(
        (jnp.abs(cdist) <= params.maxdist).astype(jnp.float32)))
    print(f"# {args.grid} nn={nn} coastal-band fraction "
          f"{coastal_frac:.3f}")

    def timed(tile):
        def body(c, _, t0_pad, cd_pad, cdist, ws_new, wd_new):
            sb, ws_o, wd_o = ring_trigger_pallas_padded(
                t0_pad + c, cd_pad, cdist, ws_new, wd_new, ws_new, wd_new,
                jnp.bool_(False), jnp.bool_(True), params, nn,
                tile_rows=tile[0], tile_cols=tile[1])
            chk = (c * jnp.float32(0.5)
                   + jnp.sum(jnp.where(jnp.abs(sb) < 1e19, sb, 0.0))
                   * jnp.float32(1e-12))
            return chk, None

        def total(n):
            @jax.jit
            def run(c, *flds):
                return lax.scan(lambda cc, x: body(cc, x, *flds), c, None,
                                length=n)
            float(run(jnp.float32(0.0), *fields)[0])
            best = np.inf
            for _ in range(3):
                t0_ = time.perf_counter()
                float(run(jnp.float32(0.0), *fields)[0])
                best = min(best, time.perf_counter() - t0_)
            return best

        t1 = total(args.iters)
        t4 = total(4 * args.iters)
        return max((t4 - t1) / (3 * args.iters), 0.0)

    tiles = [(128, 256), (64, 256), (64, 128), (32, 128), (32, 256),
             (16, 128), (16, 256), (64, 512), (128, 128), (256, 256),
             (8, 128), (32, 512)]
    if args.tiles:
        tiles = [tuple(map(int, t.split("x"))) for t in args.tiles]
    for tile in tiles:
        try:
            t = timed(tile)
            print(f"tile {tile[0]:4d}x{tile[1]:<4d} {t*1e3:8.3f} ms")
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"tile {tile[0]:4d}x{tile[1]:<4d} FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
