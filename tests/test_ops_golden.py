"""Golden allclose tests: vectorized TPU ops vs the loop-faithful NumPy
oracle (tests/golden/reference_numpy.py), per SURVEY §4c."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seabreeze_param_tpu.core.grid import Grid
from seabreeze_param_tpu.ops.coastline import get_edges, make_mask
from seabreeze_param_tpu.ops.distance import coast_distance
from seabreeze_param_tpu.ops.orography import sigmoid_weight
from seabreeze_param_tpu.ops.ring_search import ring_thc

from tests.golden.reference_numpy import (
    F, golden_get_edges, golden_get_dist, golden_search_radius,
    golden_sigmoid, golden_diag, lat_clamp, lon_quirky)


@pytest.mark.parametrize("case", ["small_case", "global_case"])
def test_get_edges_matches_golden(case, request):
    c = request.getfixturevalue(case)
    ref = golden_get_edges(c["lsm"], c["ci_t"][0])
    got = np.asarray(get_edges(c["lsm"], c["ci_t"][0]))
    np.testing.assert_array_equal(got, ref)


def test_get_edges_quirky_last_column(small_case):
    """The Fortran lon map aliases column nlons to column 1; a coastline in
    the last column must reproduce that behavior exactly."""
    nlat, nlon = 16, 24
    lsm = np.zeros((nlat, nlon), F)
    lsm[:, -1] = 1.0  # land only in the very last column
    ci = np.zeros_like(lsm)
    ref = golden_get_edges(lsm, ci)
    got = np.asarray(get_edges(lsm, ci))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("case", ["small_case", "global_case"])
def test_search_radius_matches(case, request):
    c = request.getfixturevalue(case)
    grid = Grid(lon=c["lon"], lat=c["lat"])
    assert grid.search_radius_cells(180.0) == golden_search_radius(
        c["lon"], c["lat"])


@pytest.mark.parametrize("case", ["small_case", "global_case"])
def test_get_dist_matches_golden(case, request):
    c = request.getfixturevalue(case)
    grid = Grid(lon=c["lon"], lat=c["lat"])
    assert grid.search_radius_cells(180.0) >= 1, "fixture too coarse"
    coast = golden_get_edges(c["lsm"], c["ci_t"][0])
    ref = golden_get_dist(coast, c["lsm"], c["lon"], c["lat"])
    got = np.asarray(coast_distance(jnp.asarray(coast), c["lsm"], grid))
    # identical sign/sentinel structure
    np.testing.assert_array_equal(np.sign(ref), np.sign(got))
    np.testing.assert_array_equal(ref == F(12000.0), got == F(12000.0))
    sel = ref != F(12000.0)
    np.testing.assert_allclose(got[sel], ref[sel], rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("unroll", [True, False])
def test_min_haversine_unroll_branches_agree(small_case, unroll):
    """The unrolled static-slice form and the fori_loop fallback (engaged in
    production only at k > 31) must produce identical winning parameters —
    goldened here so the two branches cannot silently diverge (ADVICE r2)."""
    from seabreeze_param_tpu.ops.distance import (
        distance_tables, finalize_distance, min_haversine_param_from_padded,
        pad_coast)
    c = small_case
    grid = Grid(lon=c["lon"], lat=c["lat"])
    coast = golden_get_edges(c["lsm"], c["ci_t"][0])
    k = grid.search_radius_cells(180.0)
    tables = distance_tables(grid, k)
    amin = min_haversine_param_from_padded(
        pad_coast(jnp.asarray(coast), k), *tables, k, unroll=unroll)
    got = np.asarray(finalize_distance(amin, c["lsm"], 180.0))
    ref = golden_get_dist(coast, c["lsm"], c["lon"], c["lat"])
    np.testing.assert_array_equal(np.sign(ref), np.sign(got))
    sel = ref != F(12000.0)
    np.testing.assert_allclose(got[sel], ref[sel], rtol=2e-5, atol=2e-3)


def test_sigmoid_matches_golden(small_case):
    ref = golden_sigmoid(small_case["std"])
    got = np.asarray(sigmoid_weight(small_case["std"]))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("case", ["small_case", "global_case"])
def test_ring_thc_matches_golden(case, request):
    """Cross-check the incremental-box-sum ring search against the literal
    expanding-while-loop on every coastal point."""
    c = request.getfixturevalue(case)
    grid = Grid(lon=c["lon"], lat=c["lat"])
    coast = golden_get_edges(c["lsm"], c["ci_t"][0])
    cdist = golden_get_dist(coast, c["lsm"], c["lon"], c["lat"])
    smod = golden_sigmoid(c["std"])
    t0 = (c["theta_t"][0] - (np.float32(-0.0060956) * c["z"] * smod)).astype(F)

    from seabreeze_param_tpu.ops.ring_search import required_ring_radius_host
    k = grid.search_radius_cells(180.0)
    nn_max = max(k + 4, required_ring_radius_host(cdist, 180.0))
    got_thc, got_found = ring_thc(jnp.asarray(t0), jnp.asarray(cdist), nn_max)
    got_thc = np.asarray(got_thc)

    nlat, nlon = t0.shape
    checked = 0
    for i in range(nlat - 1):
        for j in range(nlon):
            if abs(cdist[i, j]) > F(180.0):
                continue
            mul = F(1.0) if cdist[i, j] >= 0 else F(-1.0)
            nn = 1
            while True:
                n_l = n_s = 0
                T_l = F(0.0)
                T_s = F(0.0)
                for ii in range(i - nn, i + nn + 1):
                    for jj in range(j - nn, j + nn + 1):
                        ki = lat_clamp(ii, nlat)
                        kj = lon_quirky(jj, nlon)
                        if cdist[ki, kj] >= 0:
                            T_l = F(T_l + t0[ki, kj])
                            n_l += 1
                        else:
                            T_s = F(T_s + t0[ki, kj])
                            n_s += 1
                if n_l > 0 and n_s > 0:
                    break
                nn += 1
            assert nn <= nn_max, (i, j, nn)
            ref = F(mul * (T_l / F(n_l) - T_s / F(n_s)))
            np.testing.assert_allclose(got_thc[i, j], ref, rtol=2e-4,
                                       atol=2e-3)
            checked += 1
    assert checked > 50  # the fixture must actually exercise coastal cells
