"""Pallas kernels vs their jnp references (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from seabreeze_param_tpu.core.grid import Grid
from seabreeze_param_tpu.ops.coastline import get_edges
from seabreeze_param_tpu.ops.distance import (distance_tables,
                                              effective_radius,
                                              min_haversine_param)
from seabreeze_param_tpu.ops.pallas.distance_kernel import (
    min_haversine_param_pallas)


@pytest.mark.parametrize("case", ["small_case", "global_case"])
@pytest.mark.parametrize("tile_rows", [32, 128])
def test_distance_kernel_matches_jnp(case, tile_rows, request):
    c = request.getfixturevalue(case)
    grid = Grid(lon=c["lon"], lat=c["lat"])
    k = effective_radius(grid, 180.0)
    tables = distance_tables(grid, k)
    coast = get_edges(c["lsm"], c["ci_t"][0])

    ref = np.asarray(min_haversine_param(coast, *tables, k))
    got = np.asarray(min_haversine_param_pallas(coast, *tables, k,
                                                tile_rows=tile_rows,
                                                interpret=True))
    # identical candidate set + monotone float32 ops -> bit-identical
    np.testing.assert_array_equal(got, ref)
