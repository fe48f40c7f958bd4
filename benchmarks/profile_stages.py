#!/usr/bin/env python
"""Per-stage device timing of the trigger pipeline.

Each pipeline stage (coastline Sobel, coast-distance transform, ring THC
search, trigger step, full fused step) runs as a ``lax.scan`` inside ONE
jitted dispatch, timed at N and 4N iterations; the reported per-iteration
cost is the slope ``(t(4N) - t(N)) / 3N``, which cancels the fixed
per-dispatch host/tunnel latency (~25-30 ms on axon backends) exactly.  The
scan carry perturbs each stage's inputs so XLA cannot hoist the stage out
of the loop.  Slopes are clamped at 0 and flagged when below timing noise
(cheap bodies — e.g. the empty dispatch floor — can land within jitter).

Usage: python benchmarks/profile_stages.py [--grid global025]
       [--pallas/--no-pallas] [--iters 64]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import GRIDS, make_world  # noqa: E402


def timeit_scanned(make_scan_fn, init_carry, iters, repeats=3, fields=()):
    """Per-iteration device time of ``lax.scan(scan_fn, carry, length=N)``.

    The axon tunnel adds a LARGE fixed per-dispatch roundtrip (~30 ms), so a
    single measurement at one iteration count is dominated by it.  We time
    the scan at N and 4N iterations and take the slope
    ``(t(4N) - t(N)) / 3N`` — the dispatch offset cancels exactly and the
    result is true device time per iteration.

    ``fields`` holds the large device arrays the body reads: they are passed
    as jit *arguments* (closed-over arrays embed as HLO constants, which
    blows the axon upload limit at 0.1 deg) and forwarded to the body.
    """
    import jax
    from jax import lax

    def total(n):
        @jax.jit
        def run(carry, *flds):
            def body(c, x):
                return make_scan_fn(c, x, *flds)
            return lax.scan(body, carry, None, length=n)

        def fetch(out):
            # Pull the scalar checksum to the host: on axon backends
            # block_until_ready can return before execution completes, so a
            # concrete fetch is the only reliable completion barrier.  The
            # checksum is always the LAST carry leaf (bodies carry (state?,
            # checksum)).
            carry = out[0]
            return float(jax.tree_util.tree_leaves(carry)[-1])

        fetch(run(init_carry, *fields))
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fetch(run(init_carry, *fields))
            times.append(time.perf_counter() - t0)
        return min(times), max(times) - min(times)

    t1, spread1 = total(iters)
    t4, spread4 = total(4 * iters)
    slope = (t4 - t1) / (3 * iters)
    # Repeat-to-repeat jitter bounds what the slope can resolve; flag rows
    # whose cost is within noise rather than printing a misleading number.
    # The bound comes from the OBSERVED spread of each total() measurement
    # (not a fraction of wall time, which is dominated by the fixed
    # dispatch latency the slope method cancels).
    noise = (spread1 + spread4) / (3 * iters)
    return max(slope, 0.0), slope < noise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="global025", choices=sorted(GRIDS))
    ap.add_argument("--nlev", type=int, default=4)
    ap.add_argument("--iters", type=int, default=64)
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

    coast = jax.jit(lambda l, c: get_edges(l, c))(lsm_d, ci_d)
    cdist = jax.jit(lambda c, l: coast_distance(
        c, l, grid, params.maxdist, use_pallas=args.pallas))(coast, lsm_d)
    state = TriggerState.zeros((nlat, nlon))

    # Every scan body perturbs its field input with the loop carry (a
    # scalar) and folds a tiny-scaled checksum of the output back into the
    # carry — a dependency XLA cannot constant-fold away (a `* 0.0`
    # checksum gets the whole stage dead-code-eliminated).
    def dep(c, out):
        return (c * jnp.float32(0.5)
                + jnp.sum(jnp.where(jnp.abs(out) < 1e19, out, 0.0))
                * jnp.float32(1e-12))

    def empty_body(c, _):
        return c + 1.0, None

    def edges_body(c, _, lsm_d, ci_d):
        return dep(c, get_edges(lsm_d + c, ci_d)), None

    def dist_body(c, _, coast, lsm_d):
        out = coast_distance(coast + c, lsm_d, grid, params.maxdist,
                             use_pallas=args.pallas)
        return dep(c, out), None

    def trig_body(carry, _, th_d, u_d, v_d, cdist, z_d, std_d, pres_d):
        s, c = carry
        s2, out = trigger_step(s, th_d + c, u_d, v_d, cdist, z_d, std_d,
                               pres_d, params, pipe.nn_max,
                               use_pallas=args.pallas)
        return (s2, dep(c, out["sb_con"])), None

    def wind_body(c, _, u_d, v_d, pres_d):
        ws, wd = wind_at_level(u_d + c, v_d, pres_d, params.target_plev_pa)
        return dep(c, ws), None

    def step_body(carry, _, th_d, u_d, v_d, lsm_d, z_d, std_d, pres_d, ci_d):
        s, c = carry
        s2, out = pipe.step(s, th_d + c, u_d, v_d, lsm_d, z_d, std_d, pres_d,
                            ci=ci_d + c * 0)
        return (s2, dep(c, out["sb_con"])), None

    z0 = jnp.float32(0.0)
    rows = [
        ("dispatch floor (empty)", timeit_scanned(empty_body, z0,
                                                  args.iters)),
        ("get_edges (sobel)", timeit_scanned(edges_body, z0, args.iters,
                                             fields=(lsm_d, ci_d))),
        ("coast_distance", timeit_scanned(dist_body, z0, args.iters,
                                          fields=(coast, lsm_d))),
        ("trigger_step (ring+tail)",
         timeit_scanned(trig_body, (state, z0), args.iters,
                        fields=(th_d, u_d, v_d, cdist, z_d, std_d, pres_d))),
        ("  wind_at_level only",
         timeit_scanned(wind_body, z0, args.iters,
                        fields=(u_d, v_d, pres_d))),
        ("FULL step (fused)",
         timeit_scanned(step_body, (TriggerState.zeros((nlat, nlon)), z0),
                        args.iters,
                        fields=(th_d, u_d, v_d, lsm_d, z_d, std_d, pres_d,
                                ci_d))),
    ]
    print(f"# {args.grid} ({nlat}x{nlon}) nlev={args.nlev} "
          f"pallas={args.pallas} platform={platform} "
          f"k={pipe.k} nn={pipe.nn_max} iters={args.iters}")
    for name, (t, below_noise) in rows:
        note = "  (below measurement noise)" if below_noise else ""
        print(f"{name:28s} {t*1e3:8.3f} ms{note}")


if __name__ == "__main__":
    main()
