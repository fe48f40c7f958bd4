#!/usr/bin/env python
"""Benchmark harness: full trigger pipeline throughput.

Runs the flagship workload — the global 0.25-degree trigger pipeline with a
moving sea-ice field (so the coastline + coast-distance transform is rebuilt
every step, the reference's hot path, ``__init__.py:219-245``) — and prints
ONE JSON line::

    {"metric": ..., "value": N, "unit": "grid-points/s", "vs_baseline": N}

``vs_baseline`` compares against the recorded CPU-host baseline in
``benchmarks/baseline_cpu.json`` (the reference is Fortran+OpenMP on CPU; no
Fortran compiler exists in this image, so the committed baseline is the same
pipeline semantics executed on all host CPU cores — see
benchmarks/README.md).  Falls back to 1.0 when absent.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def make_world(nlat, nlon, nlev, nt, seed=0):
    rng = np.random.default_rng(seed)
    F = np.float32
    y, x = np.mgrid[0:nlat, 0:nlon]
    coastx = (0.55 * nlon + 0.08 * nlon * np.sin(2 * np.pi * y / nlat * 2.3)
              + 0.03 * nlon * np.sin(2 * np.pi * y / nlat * 7.1))
    land = (x > coastx).astype(F)
    for cy, cx, r in ((int(0.3 * nlat), int(0.25 * nlon), 0.05),
                      (int(0.7 * nlat), int(0.15 * nlon), 0.03)):
        land[(y - cy) ** 2 + (x - cx) ** 2 < (r * nlon) ** 2] = 1.0
    lsm = (land * (0.6 + 0.4 * rng.random((nlat, nlon)))).astype(F)
    z = (700.0 * lsm * rng.random((nlat, nlon))).astype(F)
    std = (110.0 * lsm * rng.random((nlat, nlon))).astype(F)
    pres = np.linspace(100000.0, 50000.0, nlev).astype(F)
    theta = (288.0 + 5.0 * rng.standard_normal((nt, nlat, nlon))).astype(F)
    u = (6.0 * rng.standard_normal((nt, nlev, nlat, nlon))).astype(F)
    v = (6.0 * rng.standard_normal((nt, nlev, nlat, nlon))).astype(F)
    ci = np.zeros((nt, nlat, nlon), F)
    ci[:, : nlat // 12, :] = 0.8  # polar sea ice: coastline moves every step
    return lsm, z, std, pres, theta, u, v, ci


GRIDS = {
    # name: (nlat, nlon)  — global lat-lon resolutions
    "global100": (181, 360),     # 1.0 deg
    "global050": (361, 720),     # 0.5 deg
    "global025": (721, 1440),    # 0.25 deg  (headline config, BASELINE.md #3)
    "global010": (1801, 3600),   # 0.1 deg   (north-star config, BASELINE.md #4)
    # regional 0.25 deg (BASELINE.md config #2): a maritime-continent-sized
    # domain, ~40S-40N x 80 deg of longitude
    "regional025": (320, 320),
}

#: non-global domains: (lat0, lat1, lon_span_deg)
GRID_DOMAIN = {"regional025": (40.0, -39.75, 80.0)}


def _enable_compile_cache():
    from seabreeze_param_tpu.utils.compile_cache import enable
    enable()


def verify(grid_name: str, nlev: int, steps: int = 3):
    """On-device numerical check of the production kernels: a SHORT SCAN
    (``steps`` >= 3, entered at tt=14 so the window spans the 6-hourly
    wind-refresh cadence branch at tt=15: 15 * 24 min = 6 h) with the fused
    Pallas kernels + hybrid distance vs the pure-XLA path, on the actual
    backend under test (SURVEY §4c's allclose gate on real silicon —
    interpret-mode tests cannot catch a Mosaic miscompile).  Running the
    compiled scan — not a single step — also verifies the state carry
    threading through the fused path: a miscompile affecting only the
    carried state fails here.

    Returns True when every per-step output field agrees (identical
    missing-value structure, allclose elsewhere) and the final carried
    state (thc/windspeed/winddir) is bit-equal between the two paths.
    """
    import jax
    import jax.numpy as jnp
    from seabreeze_param_tpu.core.grid import Grid
    from seabreeze_param_tpu.core.state import TriggerState
    from seabreeze_param_tpu.models.pipeline import TriggerPipeline

    nlat, nlon = GRIDS[grid_name]
    lsm, z, std, pres, theta, u, v, ci = make_world(nlat, nlon, nlev, steps,
                                                    seed=3)
    lat0, lat1, lon_span = GRID_DOMAIN.get(grid_name, (90.0, -90.0, 360.0))
    grid = Grid.regular(nlat, nlon, lat0=lat0, lat1=lat1, lon1=lon_span)
    # off-TPU, the Pallas side runs in interpret mode (the harness can be
    # sanity-checked on CPU; on TPU the compiled kernels are the point)
    interpret = jax.default_backend() != "tpu"
    results = {}
    for name, kw in (("pallas", dict(use_pallas=True,
                                     distance_impl="hybrid",
                                     pallas_interpret=interpret)),
                     ("xla", dict(use_pallas=False, distance_impl="xla"))):
        pipe = TriggerPipeline(grid, **kw)
        # tt=14: steps 14 (pre-refresh), 15 (refresh), 16 (post-refresh)
        state = TriggerState(tt=jnp.int32(14),
                             thc=jnp.zeros((nlat, nlon), jnp.float32),
                             windspeed=jnp.full((nlat, nlon), 5.0,
                                                jnp.float32),
                             winddir=jnp.full((nlat, nlon), 90.0,
                                              jnp.float32))
        st, out = pipe.run(state, theta, u, v, lsm, z, std, pres, ci_t=ci)
        results[name] = {k: np.asarray(val) for k, val in out.items()}
        results[name]["_thc_state"] = np.asarray(st.thc)
        results[name]["_ws_state"] = np.asarray(st.windspeed)
        results[name]["_wd_state"] = np.asarray(st.winddir)
    ok = True
    for key in ("sb_con", "t0", "windspeed", "winddir"):
        g, r = results["pallas"][key], results["xla"][key]
        miss_g, miss_r = g == np.float32(2e20), r == np.float32(2e20)
        if not np.array_equal(miss_g, miss_r):
            ok = False
            print(f"# VERIFY FAIL {key}: missing-value structure differs",
                  file=sys.stderr)
            continue
        sel = ~miss_r
        if not np.allclose(g[sel], r[sel], rtol=2e-5, atol=2e-4):
            bad = np.abs(g[sel] - r[sel]).max()
            ok = False
            print(f"# VERIFY FAIL {key}: max abs diff {bad}",
                  file=sys.stderr)
    for key in ("_thc_state", "_ws_state", "_wd_state"):
        if not np.array_equal(results["pallas"][key], results["xla"][key]):
            ok = False
            print(f"# VERIFY FAIL {key}: final state differs after "
                  f"{steps}-step scan", file=sys.stderr)
    return ok


def run(grid_name: str, steps: int, nlev: int, use_pallas: bool,
        repeats: int = 3, passes: int = 8):
    import jax
    import jax.numpy as jnp
    from seabreeze_param_tpu.core.grid import Grid
    from seabreeze_param_tpu.core.state import TriggerState
    from seabreeze_param_tpu.models.pipeline import TriggerPipeline

    nlat, nlon = GRIDS[grid_name]
    lsm, z, std, pres, theta, u, v, ci = make_world(nlat, nlon, nlev, steps)
    lat0, lat1, lon_span = GRID_DOMAIN.get(grid_name, (90.0, -90.0, 360.0))
    grid = Grid.regular(nlat, nlon, lat0=lat0, lat1=lat1, lon1=lon_span)
    pipe = TriggerPipeline(grid, use_pallas=use_pallas)

    xs = (jnp.asarray(theta), jnp.asarray(u), jnp.asarray(v), jnp.asarray(ci))
    statics = (jnp.asarray(lsm), jnp.asarray(z), jnp.asarray(std),
               jnp.asarray(pres))

    # THE production scan (TriggerPipeline._get_runner): with use_pallas
    # this is the in-place-stacked form (kernel writes each step's output
    # slots directly; no ys-stack copies), so the bench measures exactly
    # what api.diag runs.
    runner = pipe._get_runner(True, jit=False)

    def body(state, xs, lsm, z, std, pres):
        # `passes` sweeps over the same `steps`-long input block inside ONE
        # dispatch: the per-dispatch tunnel latency (~25 ms on axon) is
        # amortized over passes*steps steps while the input block stays
        # small enough to hold in HBM.  Each pass stacks its outputs to HBM
        # exactly like a production run (the buffer is reused across
        # passes), and a device-side checksum over them forces execution
        # without timing a full-field host readback.
        def one_pass(carry, _):
            st, chk = carry
            final, outs = runner(st, xs, lsm, z, std, pres, None)
            # Execution barrier: checksum sb_con + t0 (+ the carried state
            # via `final`).  The ws/wd output buffers are written by the
            # SAME pallas call that produces sb_con, so they cannot be
            # dead-code-eliminated; checksumming them too would only add
            # ~2 full-buffer HBM reads per step of pure harness overhead
            # (~0.07 ms/step at 0.1 deg).
            chk = chk + sum(jnp.sum(jnp.where(jnp.abs(o) < 1e19, o, 0.0))
                            for o in (outs["sb_con"], outs["t0"]))
            return (final, chk), None

        (final, chk), _ = jax.lax.scan(one_pass,
                                       (state, jnp.float32(0.0)),
                                       None, length=passes)
        return final, chk

    fn = jax.jit(body, donate_argnums=(0,))

    # warmup/compile
    state = TriggerState.zeros((nlat, nlon))
    final, chk = fn(state, xs, *statics)
    float(chk)

    best = np.inf
    for _ in range(repeats):
        state = TriggerState.zeros((nlat, nlon))
        t0 = time.perf_counter()
        final, chk = fn(state, xs, *statics)
        float(chk)
        best = min(best, time.perf_counter() - t0)
    nsteps = steps * passes
    pts = nsteps * nlat * nlon
    return pts / best, best / nsteps, pipe.k, pipe.nn_max


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="global025", choices=sorted(GRIDS))
    ap.add_argument("--steps", type=int, default=32,
                    help="timesteps per input block (bounds HBM use)")
    ap.add_argument("--passes", type=int, default=24,
                    help="sweeps over the block inside one dispatch; "
                         "passes*steps total timesteps amortize the "
                         "per-dispatch tunnel latency (~25 ms on axon)")
    ap.add_argument("--nlev", type=int, default=4)
    ap.add_argument("--pallas", default=None, action="store_true",
                    help="force the fused Pallas kernels (default: auto — "
                         "on for TPU backends, off elsewhere)")
    ap.add_argument("--no-pallas", dest="pallas", action="store_false")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--verify", default=None, action="store_true",
                    help="on-device Pallas-vs-XLA allclose check of a "
                         "3-step scan spanning the wind-refresh cadence "
                         "(default: on for TPU backends)")
    ap.add_argument("--no-verify", dest="verify", action="store_false")
    ap.add_argument("--all-configs", action="store_true",
                    help="emit one JSON line per BASELINE.md config "
                         "(global025, regional025, global010) instead of "
                         "only --grid — the self-contained BENCH artifact")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    platform = jax.devices()[0].platform
    if args.pallas is None:
        # Auto: the fused Pallas kernels are the production path on TPU
        # (~1.6x the XLA path); fall back to pure-XLA elsewhere.
        args.pallas = platform not in ("cpu", "gpu")
    if args.verify is None:
        args.verify = args.pallas

    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_cpu.json")
    base = {}
    if os.path.exists(base_file):
        with open(base_file) as f:
            base = json.load(f)

    def one_config(grid_name, steps, passes):
        verified = verify(grid_name, args.nlev) if args.verify else None
        throughput, step_s, k, nn = run(grid_name, steps, args.nlev,
                                        args.pallas, args.repeats, passes)
        vs = 1.0
        ref = base.get(grid_name, {}).get("grid_points_per_s")
        if ref:
            vs = throughput / ref
        line = {
            "metric": f"trigger-pipeline throughput, {grid_name} "
                      f"({platform}, k={k}, nn={nn}, "
                      f"{steps * passes} steps)",
            "value": round(throughput, 1),
            "unit": "grid-points/s",
            "vs_baseline": round(vs, 3),
        }
        if verified is not None:
            line["verified"] = bool(verified)
        print(json.dumps(line))
        sys.stdout.flush()
        print(f"# {grid_name} step time: {step_s*1e3:.2f} ms/step",
              file=sys.stderr)
        return verified

    if args.all_configs:
        # Larger grids get fewer in-dispatch steps to bound HBM use.
        plans = (("global025", args.steps, args.passes),
                 ("regional025", args.steps, args.passes),
                 ("global010", min(args.steps, 8), args.passes))
        flags = [one_config(g, s, p) for g, s, p in plans]
    else:
        flags = [one_config(args.grid, args.steps, args.passes)]
    if any(v is False for v in flags):
        # the on-device allclose gate failed: report it loudly in the exit
        # status too, so automation gating on bench cannot record a
        # miscompiled kernel's throughput as a valid baseline
        sys.exit(1)


if __name__ == "__main__":
    main()
