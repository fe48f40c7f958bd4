"""Sharded trigger pipeline: shard_map over a ('y', 'x') device mesh.

2-D spatial domain decomposition with explicit ICI halo exchange — the
TPU-native re-design of the reference's MPI-decomposed UM variant
(``UM/vn10.7/sea_breeze_diag.F90``, SURVEY §2.8, §5.8).  Everything that was
a ``swap_bounds`` call becomes a ``parallel.halo.halo_pad``; the sigmoid's
global statistics become psum/pmax/pmin (SURVEY §2 native-checklist item 2).

Lat divisibility is handled by **edge-row replication padding**, which is
*exactly idempotent* under the reference's boundary semantics:

  * the Fortran lat clamp maps every beyond-edge row to the edge row, so a
    window that sees replicated fake rows sums precisely the duplicates the
    clamp would have summed;
  * replicated rows carry replicated phi, so any fake coastline cell is a
    duplicate (identical haversine parameter) of a real edge-row coastline
    cell — provably a subset of the edge row's coast — and the distance min
    dedups it;
  * fake-row cdist/t0 come out as exact copies of the edge row's, keeping
    the ring-search class counts identical to the clamp's.

Global statistics exclude fake rows via ``valid_mask``; outputs are sliced
back to the real rows on the host.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..core.grid import Grid
from ..core.state import TriggerState
from ..models.pipeline import TriggerPipeline
from ..ops.coastline import make_mask, sobel_edges_from_padded
from ..ops.distance import (distance_tables, finalize_distance,
                            min_haversine_param_from_padded, resolve_impl)
from ..ops.trigger import trigger_step
from .halo import halo_pad
from .mesh import AXIS_Y, AXIS_X


def _pad_lat_host(arr, nlat_pad, axis=-2):
    """Replicate the last lat row up to nlat_pad (see module docstring)."""
    arr = np.asarray(arr)
    nlat = arr.shape[axis]
    if nlat == nlat_pad:
        return arr
    idx = np.minimum(np.arange(nlat_pad), nlat - 1)
    return np.take(arr, idx, axis=axis)


@dataclasses.dataclass
class ShardedPipeline:
    """shard_map-parallel version of :class:`TriggerPipeline`.

    Requires nlon % mesh_x == 0; nlat is replication-padded to a multiple of
    mesh_y.
    """

    pipeline: TriggerPipeline
    mesh: jax.sharding.Mesh

    def __post_init__(self):
        grid = self.pipeline.grid
        py, px = (self.mesh.shape[AXIS_Y], self.mesh.shape[AXIS_X])
        if grid.nlon % px:
            raise ValueError(
                f"nlon={grid.nlon} not divisible by mesh x={px}")
        self.nlat_real = grid.nlat
        self.nlat_pad = ((grid.nlat + py - 1) // py) * py
        lat_padded = _pad_lat_host(grid.lat, self.nlat_pad, axis=-1)
        self.grid_padded = Grid(lon=grid.lon, lat=lat_padded)
        # Search radius must come from the *real* grid (the padded grid has
        # a duplicated last lat, which would corrupt the 70-deg cell size
        # only if 70 deg were the duplicated row — compute on real anyway).
        self.k = self.pipeline.k
        self.tables = distance_tables(self.grid_padded, self.k)
        self.nn_max = self.pipeline.nn_max
        # Halo-width guard: halo_pad slices hy/hx-wide strips out of the
        # LOCAL shard, so every exchanged width must fit inside one shard
        # (a mesh too large for the grid would otherwise exchange
        # garbage-width strips or fail deep inside shard_map).
        local_h = self.nlat_pad // py
        local_w = grid.nlon // px
        widest = max(1, self.k, self.nn_max)
        if widest > local_h or widest > local_w:
            raise ValueError(
                f"halo width {widest} (max of sobel=1, distance k={self.k}, "
                f"ring nn_max={self.nn_max}) exceeds the local shard extent "
                f"{local_h}x{local_w} on a {py}x{px} mesh; use fewer shards "
                f"or a finer grid")

    # ------------------------------------------------------------------
    def _core(self, state, xs, lsm, z, std, pres, sdphi2, po, sdlam2, *,
              has_ci: bool = True):
        """Per-shard scan over time (runs inside shard_map)."""
        pipe = self.pipeline
        params = pipe.params
        exact = params.exact_lon_indexing
        h = lsm.shape[0]
        row_offset = lax.axis_index(AXIS_Y) * h
        valid = ((row_offset + jnp.arange(h)) < self.nlat_real)[:, None]

        def ring_pad(q, nn):
            return halo_pad(q, nn, nn, lat_fill="clamp", exact_lon=exact)

        def distance(ci):
            mask = make_mask(lsm, ci)
            mpad = halo_pad(mask, 1, 1, lat_fill="clamp", exact_lon=exact)
            coast = sobel_edges_from_padded(mpad)
            # get_dist uses the clean periodic lon map (sobel.f90:163-164)
            cpad = halo_pad(coast, self.k, self.k, lat_fill="zero",
                            exact_lon=False)
            amin = min_haversine_param_from_padded(
                cpad, sdphi2, po, sdlam2, self.k,
                impl=resolve_impl(pipe.distance_impl),
                interpret=pipe.pallas_interpret)
            return finalize_distance(amin, lsm, params.maxdist)

        # Static coastline (no sea ice): one distance transform outside the
        # scan, like the unsharded pipeline (reference __init__.py:216-218).
        cdist0 = None if has_ci else distance(None)

        def scan_fn(carry, x):
            if has_ci:
                th, uu, vv, ci = x
                cdist = distance(ci)
            else:
                th, uu, vv = x
                cdist = cdist0
            new_state, out = trigger_step(
                carry, th, uu, vv, cdist, z, std, pres, params, self.nn_max,
                axis_names=(AXIS_Y, AXIS_X), ring_pad_fn=ring_pad,
                row_offset=row_offset, nlat_total=self.nlat_real,
                valid_mask=valid, use_pallas=pipe.use_pallas,
                pallas_interpret=pipe.pallas_interpret)
            return new_state, out

        return lax.scan(scan_fn, state, xs)

    # ------------------------------------------------------------------
    def build(self, has_ci: bool = True):
        """The jitted shard_map-wrapped scan function (cached per variant —
        rebuilding the wrapper every call would re-trace)."""
        cache = getattr(self, "_built", None)
        if cache is None:
            cache = self._built = {}
        if has_ci in cache:
            return cache[has_ci]
        fld = P(AXIS_Y, AXIS_X)
        state_spec = TriggerState(tt=P(), thc=fld, windspeed=fld, winddir=fld)
        xs_spec = (P(None, AXIS_Y, AXIS_X), P(None, None, AXIS_Y, AXIS_X),
                   P(None, None, AXIS_Y, AXIS_X))
        if has_ci:
            xs_spec = xs_spec + (P(None, AXIS_Y, AXIS_X),)
        in_specs = (state_spec, xs_spec, fld, fld, fld, P(),
                    P(AXIS_Y, None), P(AXIS_Y, None), P(AXIS_X, None))
        out_specs = (state_spec,
                     {k: P(None, AXIS_Y, AXIS_X)
                      for k in ("sb_con", "t0", "windspeed", "winddir")})
        # check_vma=False: loop carries inside the ops layer are initialized
        # from fresh constants (jnp.full/zeros), which the vma checker types
        # as unvarying even though the loop bodies mix them with (y,x)-varying
        # data.  The ops are mesh-agnostic by design (the same code runs
        # single-device), so we opt out of the static check; shard-count
        # invariance is instead enforced dynamically by tests/test_sharded.py.
        fn = jax.shard_map(functools.partial(self._core, has_ci=has_ci),
                           mesh=self.mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        cache[has_ci] = jax.jit(fn)
        return cache[has_ci]

    # ------------------------------------------------------------------
    def run(self, state: TriggerState, theta_t, u_t, v_t, lsm, z, std, pres,
            ci_t=None):
        """Host-friendly entry: pads lat, shards, runs, slices back."""
        T = np.asarray(theta_t).shape[0]
        nlat, nlon = self.nlat_pad, self.pipeline.grid.nlon
        padf = functools.partial(_pad_lat_host, nlat_pad=nlat)
        has_ci = ci_t is not None
        xs = (jnp.asarray(padf(theta_t), jnp.float32),
              jnp.asarray(padf(u_t), jnp.float32),
              jnp.asarray(padf(v_t), jnp.float32))
        if has_ci:
            xs = xs + (jnp.asarray(padf(ci_t), jnp.float32),)
        state_p = TriggerState(
            tt=state.tt,
            thc=jnp.asarray(padf(np.asarray(state.thc)), jnp.float32),
            windspeed=jnp.asarray(padf(np.asarray(state.windspeed)),
                                  jnp.float32),
            winddir=jnp.asarray(padf(np.asarray(state.winddir)), jnp.float32))
        args = (state_p, xs, jnp.asarray(padf(lsm), jnp.float32),
                jnp.asarray(padf(z), jnp.float32),
                jnp.asarray(padf(std), jnp.float32),
                jnp.asarray(pres, jnp.float32),
                jnp.asarray(self.tables[0]), jnp.asarray(self.tables[1]),
                jnp.asarray(self.tables[2]))
        final, outs = self.build(has_ci)(*args)
        sl = slice(0, self.nlat_real)
        final = TriggerState(tt=final.tt, thc=final.thc[sl],
                             windspeed=final.windspeed[sl],
                             winddir=final.winddir[sl])
        outs = {k: v[:, sl] for k, v in outs.items()}
        return final, outs
