#!/usr/bin/env python
"""Quantify the output-stacking tax and the in-place-stacked fix.

Three variants of the 0.25-degree production scan, each timed as a
multi-pass single dispatch (bench.py's amortization scheme):

  state-only : scan carrying only the state, outputs discarded in-body —
               the compute floor (r4: ~0.42-0.45 ms/step).
  ys-stacked : the r4 production form — per-step (h, w) Pallas outputs
               stacked by lax.scan's ys dynamic-update-slice (r4: 0.549
               ms/step, i.e. a 0.134 ms/step copy tax).
  in-place   : the r5 form — the fused kernel writes slot t of carried
               (T, ., .) buffers via input_output_aliases + scalar-prefetch
               block index (models.pipeline._make_stacked_scan).

Usage: python benchmarks/stacked_probe.py [--grid global025] [--steps 32]
       [--passes 16] [--repeats 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from bench import GRIDS, GRID_DOMAIN, make_world  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="global025", choices=sorted(GRIDS))
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--passes", type=int, default=16)
    ap.add_argument("--nlev", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from seabreeze_param_tpu.utils.compile_cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    from seabreeze_param_tpu.core.grid import Grid
    from seabreeze_param_tpu.core.state import TriggerState
    from seabreeze_param_tpu.models.pipeline import TriggerPipeline
    from seabreeze_param_tpu.ops.trigger import trigger_step

    nlat, nlon = GRIDS[args.grid]
    lat0, lat1, lon_span = GRID_DOMAIN.get(args.grid, (90.0, -90.0, 360.0))
    grid = Grid.regular(nlat, nlon, lat0=lat0, lat1=lat1, lon1=lon_span)
    interpret = jax.default_backend() != "tpu"
    pipe = TriggerPipeline(grid, use_pallas=True,
                           pallas_interpret=interpret)
    lsm, z, std, pres, theta, u, v, ci = make_world(nlat, nlon, args.nlev,
                                                    args.steps)
    xs = (jnp.asarray(theta), jnp.asarray(u), jnp.asarray(v),
          jnp.asarray(ci))
    statics = (jnp.asarray(lsm), jnp.asarray(z), jnp.asarray(std),
               jnp.asarray(pres))

    def step_ys(carry, x, statics):
        th, uu, vv, cci = x
        return pipe.step(carry, th, uu, vv, *statics, ci=cci)

    def scan_state_only(st, xs, statics):
        def fn(carry, x):
            s, chk = carry
            s2, outs = step_ys(s, x, statics)
            chk = chk + jnp.sum(jnp.where(jnp.abs(outs["sb_con"]) < 1e19,
                                          outs["sb_con"], 0.0))
            return (s2, chk), None
        (s2, chk), _ = jax.lax.scan(fn, (st, jnp.float32(0)), xs)
        return s2, chk

    def scan_ys(st, xs, statics):
        s2, outs = jax.lax.scan(
            lambda c, x: step_ys(c, x, statics), st, xs)
        chk = sum(jnp.sum(jnp.where(jnp.abs(o) < 1e19, o, 0.0))
                  for o in outs.values())
        return s2, chk

    runner = pipe._get_runner(True, jit=False)

    def scan_inplace(st, xs, statics):
        s2, outs = runner(st, xs, *statics, None)
        chk = sum(jnp.sum(jnp.where(jnp.abs(o) < 1e19, o, 0.0))
                  for o in outs.values())
        return s2, chk

    def timed(scan):
        # xs/statics ride as jit ARGUMENTS — closed-over device arrays
        # would embed as HLO constants (530 MB of u/v at 0.25 deg) and
        # stall the remote compile path for tens of minutes.
        @jax.jit
        def body(state, xs, statics):
            def one_pass(carry, _):
                s, chk = carry
                s2, c2 = scan(s, xs, statics)
                return (s2, chk + c2), None
            (final, chk), _ = jax.lax.scan(
                one_pass, (state, jnp.float32(0)), None,
                length=args.passes)
            return chk

        state = TriggerState.zeros((nlat, nlon))
        float(body(state, xs, statics))           # compile + warm
        best = np.inf
        for _ in range(args.repeats):
            state = TriggerState.zeros((nlat, nlon))
            t0 = time.perf_counter()
            float(body(state, xs, statics))
            best = min(best, time.perf_counter() - t0)
        return best / (args.steps * args.passes)

    for name, scan in (("state-only", scan_state_only),
                       ("ys-stacked", scan_ys),
                       ("in-place ", scan_inplace)):
        t = timed(scan)
        sys.stdout.write(f"{name}: {t*1e3:7.3f} ms/step  "
              f"({nlat*nlon/t/1e9:.2f}e9 pts/s)\n"); sys.stdout.flush()


if __name__ == "__main__":
    main()
