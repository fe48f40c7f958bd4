"""The full trigger pipeline: mask -> coastline -> distance -> trigger.

This is the TPU-native equivalent of the reference's per-timestep inner loop
(``python_wrapper/seabreezediag/__init__.py:219-245``): per step, rebuild the
coastline and coast-distance from the (moving) sea-ice field, run the trigger
kernel, and thread the persistent state forward.  The whole loop is one
jitted ``lax.scan`` with donated state — the reference's per-step
Python->Fortran boundary (and its double ``c2f`` copy of every field,
``__init__.py:229-239``) disappears entirely.

Call-sequence parity with the model-coupling contract
(``generic/dummy_model.f90:27-55``): ``get_edges`` -> ``get_dist`` ->
``physics/seabreeze_diag`` once per step, *before* the trigger.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..core.grid import Grid
from ..core.params import Params
from ..core.state import TriggerState
from ..ops.coastline import get_edges
from ..ops.distance import coast_distance, effective_radius
from ..ops.orography import sigmoid_weight
from ..ops.trigger import trigger_step


@dataclass(frozen=True)
class TriggerPipeline:
    """Bound pipeline over static fields.

    Static inputs mirror the reference ``diag(tt, lsm, z, std, lon, lat,
    pres, ...)`` signature (``__init__.py:91``): land fraction, orography,
    sub-grid orography std, coordinates, pressure levels.
    """

    grid: Grid
    params: Params = field(default_factory=Params)
    use_pallas: bool = False
    # Optional explicit ring-search bound (see ops.ring_search.
    # required_ring_radius_host); None = the provable global-grid bound.
    ring_nn: int | None = None
    # Distance-transform implementation ('auto' | 'xla' | 'hybrid' |
    # 'pallas'); 'auto' resolves per backend (ops.distance.resolve_impl).
    distance_impl: str = "auto"
    # Pass-1 lon form: 'taps' (exact reference parity) or 'nearest' (the
    # O(log k) uniform-grid form, allclose parity — see
    # ops.distance.pass1_extrema_nearest).
    distance_lon_form: str = "taps"
    # Run every Pallas kernel in interpret mode (CPU testing of the TPU
    # production path — the fake-backend pattern of SURVEY §4b).
    pallas_interpret: bool = False

    @property
    def k(self) -> int:
        return effective_radius(self.grid, self.params.maxdist)

    @property
    def nn_max(self) -> int:
        """Static ring-search bound: both cdist signs provably occur within
        k+2 cells of any |cdist| <= maxdist point on physically-periodic
        grids (SURVEY §7 hard part 2); regional grids with a fake wrap seam
        can need more — measure with required_ring_radius_host and pass
        ``ring_nn``."""
        if self.ring_nn is not None:
            return max(1, int(self.ring_nn))
        return max(3, self.k + 2 + self.params.ring_search_margin)

    # ------------------------------------------------------------------
    def distance_field(self, lsm, ci=None):
        """Coastline + signed coast distance for one (lsm, sea-ice) pair."""
        coast = get_edges(lsm, ci, exact_lon=self.params.exact_lon_indexing)
        return coast_distance(coast, lsm, self.grid, self.params.maxdist,
                              use_pallas=self.use_pallas,
                              impl=self.distance_impl,
                              interpret=self.pallas_interpret,
                              lon_form=self.distance_lon_form)

    def step(self, state: TriggerState, theta, u, v, lsm, z, std, pres,
             ci=None, smod=None):
        """One full timestep (distance rebuild + trigger)."""
        cdist = self.distance_field(lsm, ci)
        return trigger_step(state, theta, u, v, cdist, z, std, pres,
                            self.params, self.nn_max, smod=smod,
                            use_pallas=self.use_pallas,
                            pallas_interpret=self.pallas_interpret)

    # ------------------------------------------------------------------
    def run(self, state: TriggerState, theta_t, u_t, v_t, lsm, z, std, pres,
            ci_t=None, *, jit: bool = True):
        """Scan over the leading time axis.

        theta_t : (T, nlat, nlon); u_t, v_t : (T, nlev, nlat, nlon);
        ci_t : (T, nlat, nlon) or None (then the distance field is computed
        once from lsm alone, like the reference's ci=None branch,
        ``__init__.py:216-218``).

        Returns (final_state, outputs) with outputs a dict of
        (T, nlat, nlon) stacked fields.
        """
        lsm = jnp.asarray(lsm, jnp.float32)
        z = jnp.asarray(z, jnp.float32)
        std = jnp.asarray(std, jnp.float32)
        pres = jnp.asarray(pres, jnp.float32)

        # Without sea ice the coastline is static: compute the distance field
        # once outside the scan (the reference's ci=None branch likewise
        # computes it once, __init__.py:216-218).
        cdist0 = None if ci_t is not None else self.distance_field(lsm, None)

        def scan_fn(carry, xs):
            if ci_t is None:
                th, uu, vv = xs
                new_state, out = trigger_step(
                    carry, th, uu, vv, cdist0, z, std, pres, self.params,
                    self.nn_max, use_pallas=self.use_pallas,
                    pallas_interpret=self.pallas_interpret)
            else:
                th, uu, vv, ci = xs
                new_state, out = self.step(carry, th, uu, vv, lsm, z, std,
                                           pres, ci=ci)
            return new_state, out

        xs = (jnp.asarray(theta_t, jnp.float32),
              jnp.asarray(u_t, jnp.float32),
              jnp.asarray(v_t, jnp.float32))
        if ci_t is not None:
            xs = xs + (jnp.asarray(ci_t, jnp.float32),)

        runner = functools.partial(jax.lax.scan, scan_fn)
        if jit:
            runner = jax.jit(runner, donate_argnums=(0,))
        return runner(state, xs)
