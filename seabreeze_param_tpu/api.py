"""Drop-in public API mirroring ``seabreezediag.diag``.

The reference's user-facing entry point is
``python_wrapper/seabreezediag/__init__.py:91-263``:

    tt, sb_con, thc, ws, wd = diag(tt, lsm, z, std, lon, lat, pres,
                                   u, v, t, ci, **kwargs)

This module reproduces that contract — same positional order, same keyword
names and defaults, same returns, same state-threading and warning behavior —
on top of the jitted scan pipeline.  A user of the reference can switch
imports and keep their driver.

Differences by design (documented, not silent):
  * no ``c2f`` layout round-trips — arrays are (…, nlat, nlon) C-order end
    to end (the converter survives in ``utils.layout`` for interop tests);
  * the returned ``thc`` is, as in the reference, the *sea-level
    temperature* t0 (the out[1] quirk, ``__init__.py:244`` — see
    ``core.state``);
  * everything runs as one XLA program; masked sea-ice arrays are filled
    with 0 on the host first (``__init__.py:225``).
"""
from __future__ import annotations

import warnings

import numpy as np
import jax.numpy as jnp

from .core.grid import Grid
from .core.params import Params
from .core.state import TriggerState
from .models.pipeline import TriggerPipeline

_PARAM_KEYS = ("target_plev", "thresh_wind", "thresh_winddir",
               "thresh_windch", "thresh_thc", "target_time", "timestep",
               "maxdist")

#: Executable cache: TriggerPipeline / ShardedPipeline instances keyed by
#: (grid contents, params, impl flags, ring bound, mesh).  A pipeline
#: instance owns its jitted runners (``TriggerPipeline._get_runner``,
#: ``ShardedPipeline.build``), so reusing the instance across ``diag``
#: calls means a multi-file batch run traces ONCE — the reference paid a
#: c2f copy per step (``__init__.py:229-239``); without this cache we paid
#: a re-trace per file.  Stats are exposed for tests and the metrics layer.
_EXEC_CACHE: dict = {}
CACHE_STATS = {"pipeline_hits": 0, "pipeline_misses": 0}


def clear_exec_cache():
    """Drop all cached pipelines/executables (tests; memory pressure)."""
    _EXEC_CACHE.clear()
    CACHE_STATS["pipeline_hits"] = 0
    CACHE_STATS["pipeline_misses"] = 0


def _cached_pipeline(grid_key, build, *key_extra):
    key = (grid_key,) + key_extra
    pipe = _EXEC_CACHE.get(key)
    if pipe is None:
        CACHE_STATS["pipeline_misses"] += 1
        pipe = _EXEC_CACHE[key] = build()
    else:
        CACHE_STATS["pipeline_hits"] += 1
    return pipe


def _run_multihost(pipe, mesh, grid_key, pkey, ring_nn, state, t, u, v,
                   lsm, z, std, pres, ci, *, single=False):
    """Multi-process production path (the reference's decomposed MPI run,
    ``UM/vn10.7/sea_breeze_diag.F90:408-410``): a global ('y','x') mesh over
    ALL processes' devices, per-process local-row feeding through
    :class:`parallel.distributed.DistributedRunner`, and the outputs
    allgathered back so every process returns the reference-contract global
    fields.  ``t/u/v/ci`` may be LAZY netCDF variable handles: each process
    then reads ONLY its local row block from disk (the series is never
    materialized globally on any host); small static fields (lsm/z/std)
    arrive as host arrays."""
    import jax
    from .core.state import TriggerState
    from .parallel import distributed as dist
    from .parallel.sharded import ShardedPipeline

    if isinstance(mesh, jax.sharding.Mesh):
        shape = (mesh.shape["y"], mesh.shape["x"])
    elif mesh in (None, "auto"):
        shape = None
    elif isinstance(mesh, str):
        shape = tuple(int(s) for s in mesh.split("x"))
    else:
        shape = tuple(int(s) for s in mesh)
    key = (grid_key, "multihost", pkey, ring_nn, jax.process_count(), shape)
    runner = _EXEC_CACHE.get(key)
    if runner is None:
        CACHE_STATS["pipeline_misses"] += 1
        m = dist.make_multihost_mesh(shape)
        runner = dist.DistributedRunner(ShardedPipeline(pipe, m))
        _EXEC_CACHE[key] = runner
    else:
        CACHE_STATS["pipeline_hits"] += 1

    lo = runner.row_lo
    hi = min(runner.row_hi, runner.sp.nlat_real)

    def slab(a, lead_t=False):
        """Local-row block of a (possibly lazy) field; lazy handles read
        only [lo:hi) rows from disk.  ``lead_t`` adds the T axis for
        single-timestep (3-D/2-D) inputs."""
        nd = len(np.shape(a))
        key = (slice(None),) * (nd - 2) + (slice(lo, hi), slice(None))
        x = a[key]
        x = np.asarray(x.filled(0) if hasattr(x, "filled") else x,
                       np.float32)
        return x[None] if lead_t and single else x

    pres_np = np.asarray(pres, np.float32)
    state_l = TriggerState(tt=state.tt, thc=slab(state.thc),
                           windspeed=slab(state.windspeed),
                           winddir=slab(state.winddir))
    final_l, outs_l = runner.run(
        state_l, slab(t, lead_t=True), slab(u, lead_t=True),
        slab(v, lead_t=True), slab(lsm), slab(z), slab(std),
        slab(pres_np) if pres_np.ndim == 3 else pres_np,
        ci_t=None if ci is None else slab(ci, lead_t=True))

    # Gather the per-process local row blocks back to the global grid on
    # every process (the y axis is contiguous by process and every process
    # owns the same padded span, so a process-ordered allgather + row
    # concatenation reassembles the globe exactly).
    from jax.experimental import multihost_utils
    span = runner.row_hi - runner.row_lo
    nlat_real = runner.sp.nlat_real
    nlon = runner.nlon

    def gather(local):
        local = np.asarray(local, np.float32)
        buf = np.zeros(local.shape[:-2] + (span, nlon), np.float32)
        buf[..., : local.shape[-2], :] = local
        g = np.asarray(multihost_utils.process_allgather(buf))
        return np.concatenate(list(g), axis=-2)[..., :nlat_real, :]

    final = TriggerState(tt=final_l.tt, thc=gather(final_l.thc),
                         windspeed=gather(final_l.windspeed),
                         winddir=gather(final_l.winddir))
    return final, {k: gather(o) for k, o in outs_l.items()}


def _fill(ci):
    """``ci.filled(0)`` for masked arrays (__init__.py:225), else as-is."""
    if ci is None:
        return None
    if hasattr(ci, "filled"):
        return np.asarray(ci.filled(0), np.float32)
    return np.asarray(ci, np.float32)


def diag(tt, lsm, z, std, lon, lat, pres, *args, **kwargs):
    """See module docstring; parameter semantics as the reference docstring
    (``__init__.py:92-188``).

    Returns ``(tt, sb_con, thc, ws, wd)`` with ``sb_con`` of shape
    (T, nlat, nlon) (T=1 for 3-D input) and the three state fields 2-D.
    """
    ws = kwargs.pop("ws", None)
    wd = kwargs.pop("wd", None)
    thc = kwargs.pop("thc", None)
    meta = kwargs.pop("meta", None)
    # None = auto: the fused Pallas kernels are the production path on TPU
    # (~1.6x the XLA path, bench.py); pure XLA elsewhere.  Explicit
    # True/False forces (False is also the pallas_interpret-free CPU path
    # the tests golden against).
    use_pallas = kwargs.pop("use_pallas", None)
    # In a MULTI-PROCESS launch (jax.process_count() > 1) the call always
    # runs the decomposed multi-host pipeline over all processes' devices
    # (parallel.distributed); ``mesh`` then only fixes the global shape and
    # the returned fields are the allgathered global arrays on every
    # process.
    full_output = kwargs.pop("full_output", False)
    # Device-mesh selection (extension over the reference API): None =
    # single device; 'auto' = 2-D mesh over all local devices; a (py, px)
    # tuple or a jax.sharding.Mesh for explicit layouts.  Routes the same
    # pipeline through parallel.sharded.ShardedPipeline.
    mesh = kwargs.pop("mesh", None)
    if meta is None:
        u, v, t, ci = args
    else:
        u, v, t = meta.u, meta.v, meta.theta
        ci = getattr(meta, "ci", None)

    params = Params(**{k: kwargs.pop(k) for k in _PARAM_KEYS if k in kwargs})
    if kwargs:
        raise TypeError(f"unknown keyword arguments: {sorted(kwargs)}")

    from .utils.compile_cache import enable as _enable_cache
    _enable_cache()

    tt = max(1, int(tt))
    shape = np.asarray(lsm).shape
    for name, val in (("Windspeed", ws), ("Wind direction", wd),
                      ("Heating contrast", thc)):
        if val is None and tt > 1:
            # __init__.py:204-215 — state should be threaded between calls.
            warnings.warn(f"{name} should be given from previous timestep")
    state = TriggerState(
        tt=jnp.asarray(tt, jnp.int32),
        thc=jnp.asarray(thc if thc is not None else np.zeros(shape),
                        jnp.float32),
        windspeed=jnp.asarray(ws if ws is not None else np.zeros(shape),
                              jnp.float32),
        winddir=jnp.asarray(wd if wd is not None else np.zeros(shape),
                            jnp.float32),
    )

    import jax
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    lon_a = np.asarray(lon, np.float32)
    lat_a = np.asarray(lat, np.float32)
    grid_key = (lon_a.tobytes(), lat_a.tobytes())
    pkey = (params, use_pallas)
    grid = Grid(lon=lon_a, lat=lat_a)
    pipe = _cached_pipeline(
        grid_key, lambda: TriggerPipeline(grid=grid, params=params,
                                          use_pallas=use_pallas),
        "base", pkey)

    # u/v/theta/ci may be LAZY netCDF variable handles (io.netcdf.Variable,
    # the batch driver's meta= path) — keep them lazy through validation
    # and routing: the multi-host path then reads only each process's
    # local row block from disk (no host materializes the global series).
    single = len(tuple(v.shape)) <= 3

    def _tshape(s):
        return ((1,) + tuple(s)) if single else tuple(s)

    u_sh, v_sh, t_sh = _tshape(u.shape), _tshape(v.shape), _tshape(t.shape)
    ci_sh = None if ci is None else _tshape(np.shape(ci))
    T = u_sh[0]

    # Shape validation with clear errors (the reference's f2py build used
    # -fbounds-check, setup.py:13; a raw XLA shape error names no field).
    nlat, nlon = len(np.asarray(lat)), len(np.asarray(lon))
    nlev = len(np.asarray(pres))
    problems = []
    for name, got, want in (("lsm", np.shape(lsm), (nlat, nlon)),
                            ("z", np.shape(z), (nlat, nlon)),
                            ("std", np.shape(std), (nlat, nlon)),
                            ("u", u_sh, (T, nlev, nlat, nlon)),
                            ("v", v_sh, (T, nlev, nlat, nlon)),
                            ("theta", t_sh, (T, nlat, nlon))):
        if tuple(got) != want:
            problems.append(f"{name}: got {tuple(got)}, want {want}")
    if ci_sh is not None and ci_sh != (T, nlat, nlon):
        problems.append(f"ci: got {ci_sh}, want {(T, nlat, nlon)}")
    pres_arr = np.asarray(pres)
    if pres_arr.ndim == 3 and pres_arr.shape != (nlev, nlat, nlon):
        # UM coupling contract: per-column pressure on rho levels
        problems.append(f"pres: got {pres_arr.shape}, want "
                        f"{(nlev, nlat, nlon)} (or 1-D (nlev,))")
    if problems:
        raise ValueError(
            "diag input shapes inconsistent with (lon, lat, pres) — "
            + "; ".join(problems))

    # Tighten/raise the static ring-search bound from the first timestep's
    # actual distance field (host-side; exact for arbitrary grids, see
    # ops.ring_search.required_ring_radius_host).  The probe's jitted
    # distance transform is cached on the base pipeline, so repeated calls
    # on the same grid (the batch driver's per-file loop) only pay a device
    # execution, not a re-trace.
    from .ops.ring_search import required_ring_radius_host
    import jax
    dist_fn = pipe.distance_field_jit()
    if ci is None:
        cdist0 = np.asarray(dist_fn(jnp.asarray(lsm, jnp.float32)))
    else:
        ci0 = _fill(ci if single else ci[0])   # one 2-D read when lazy
        cdist0 = np.asarray(dist_fn(jnp.asarray(lsm, jnp.float32),
                                    jnp.asarray(ci0, jnp.float32)))
    req = required_ring_radius_host(cdist0, params.maxdist,
                                    exact_lon=params.exact_lon_indexing)
    needed = max(pipe.nn_max, req + params.ring_search_margin)
    # Sticky bound: if a previous call on this grid already compiled with a
    # bound >= needed, reuse it — the wider ring search is exact (latched
    # classes ignore extra rings) and reuse avoids a re-trace when sea ice
    # shifts the required radius slightly between files.
    nn_key = (grid_key, "ring_nn", pkey)
    prev_nn = _EXEC_CACHE.get(nn_key)
    ring_nn = prev_nn if isinstance(prev_nn, int) and prev_nn >= needed \
        else int(needed)
    _EXEC_CACHE[nn_key] = ring_nn
    pipe = _cached_pipeline(
        grid_key, lambda: TriggerPipeline(grid=grid, params=params,
                                          use_pallas=use_pallas,
                                          ring_nn=ring_nn),
        "ring", pkey, ring_nn)

    if jax.process_count() > 1:
        # Multi-process launch: ALWAYS the decomposed multi-host run (a
        # per-process single-device run would compute every step
        # process_count times over).  ``mesh``, when given, fixes the
        # global mesh shape.  u/v/t/ci go in possibly-lazy: each process
        # reads only its local row block.
        final, outs = _run_multihost(pipe, mesh, grid_key, pkey, ring_nn,
                                     state, t, u, v, lsm, z, std, pres, ci,
                                     single=single)
    else:
        # single-process: materialize the (full) inputs now
        u = np.asarray(u[...], np.float32)
        v = np.asarray(v[...], np.float32)
        t = np.asarray(t[...], np.float32)
        ci = _fill(None if ci is None else ci[...])
        if single:
            u, v, t = u[None], v[None], t[None]
            if ci is not None:
                ci = ci[None]
        if mesh is not None:
            from .parallel.mesh import make_mesh
            from .parallel.sharded import ShardedPipeline
            if isinstance(mesh, jax.sharding.Mesh):
                m = mesh
            elif mesh == "auto":
                m = make_mesh(None)
            elif isinstance(mesh, str):
                m = make_mesh(tuple(int(s)
                                    for s in mesh.split("x")))  # "2x4"
            else:
                m = make_mesh(tuple(int(s) for s in mesh))
            sp = _cached_pipeline(
                grid_key, lambda: ShardedPipeline(pipe, m),
                "sharded", pkey, ring_nn, m)
            final, outs = sp.run(state, t, u, v, lsm, z, std, pres,
                                 ci_t=ci)
        else:
            final, outs = pipe.run(state, t, u, v, lsm, z, std, pres,
                                   ci_t=ci)
    ret = (tt + T, outs["sb_con"], np.asarray(final.thc),
           np.asarray(final.windspeed), np.asarray(final.winddir))
    if full_output:
        # extension over the reference API: the per-step output fields
        # (sb_con, t0, windspeed, winddir), each (T, nlat, nlon) — what the
        # reference's production sb files evidently contained (plot.py:99
        # reads a per-step `thc` variable its own test_run.py never wrote).
        return ret + ({k: np.asarray(o) for k, o in outs.items()},)
    return ret
