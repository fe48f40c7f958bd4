"""The in-model coupling layer (`seabreeze_param_tpu.coupling`) — the UM
vn10.7 contract (``UM/vn10.7/sea_breeze_diag.F90``): precomputed-cdist mask
argument, 3-D per-column pressure, error codes, and the mock cumulus-mask
consumer (BASELINE.md config #5)."""
import numpy as np
import pytest

import jax.numpy as jnp

from seabreeze_param_tpu.core.grid import Grid
from seabreeze_param_tpu.core.params import Params, MISSING_VALUE
from seabreeze_param_tpu.core.state import TriggerState
from seabreeze_param_tpu.coupling import (CoupledTrigger, ERROR_BAD_GRID,
                                          ERROR_NONE, cumulus_mask,
                                          sea_breeze_diag, validate_grid)
from seabreeze_param_tpu.models.pipeline import TriggerPipeline


def _fields(c, tt=1, seed=13):
    rng = np.random.default_rng(seed)
    shape = c["lsm"].shape
    nlev = len(c["p"])
    state = TriggerState(
        tt=jnp.int32(tt),
        thc=jnp.asarray(290 + rng.standard_normal(shape), jnp.float32),
        windspeed=jnp.asarray(5 + rng.random(shape), jnp.float32),
        winddir=jnp.asarray(360 * rng.random(shape) - 180, jnp.float32))
    theta = jnp.asarray(288 + 5 * rng.standard_normal(shape), jnp.float32)
    u = jnp.asarray(6 * rng.standard_normal((nlev,) + shape), jnp.float32)
    v = jnp.asarray(6 * rng.standard_normal((nlev,) + shape), jnp.float32)
    return state, theta, u, v


def test_prepare_mask_matches_batch_pipeline(small_case):
    """prepare_mask (the pre-physics get_edges -> get_dist half,
    dummy_model.f90:32-33) must equal the batch pipeline's distance field."""
    c = small_case
    grid = Grid(lon=c["lon"], lat=c["lat"])
    pipe = TriggerPipeline(grid)
    ct = CoupledTrigger(grid=grid)
    got = np.asarray(ct.prepare_mask(c["lsm"], c["ci_t"][0]))
    ref = np.asarray(pipe.distance_field(c["lsm"], c["ci_t"][0]))
    np.testing.assert_array_equal(got, ref)


def test_physics_matches_batch_trigger_step(small_case):
    """physics with 1-D pressure == the batch trigger_step on the same
    precomputed cdist (the python_wrapper contract)."""
    from seabreeze_param_tpu.ops.trigger import trigger_step

    c = small_case
    grid = Grid(lon=c["lon"], lat=c["lat"])
    ct = CoupledTrigger(grid=grid)
    cdist = ct.prepare_mask(c["lsm"], c["ci_t"][0])
    state, theta, u, v = _fields(c)
    got_state, got_out = ct.physics(state, c["p"], u, v, theta, c["z"],
                                    c["std"], cdist)
    pipe = TriggerPipeline(grid)
    ref_state, ref_out = trigger_step(state, theta, u, v, cdist, c["z"],
                                      c["std"], c["p"], Params(),
                                      pipe.nn_max)
    for key in ("sb_con", "t0", "windspeed", "winddir"):
        np.testing.assert_array_equal(np.asarray(got_out[key]),
                                      np.asarray(ref_out[key]), err_msg=key)
    np.testing.assert_array_equal(np.asarray(got_state.windspeed),
                                  np.asarray(ref_state.windspeed))


def test_physics_3d_pressure_per_column(small_case):
    """The UM 3-D pressure branch (``UM/...F90:79-82, 265-274``): the wind
    level is selected *per column* — verified against an explicit NumPy
    per-column argmin of |p - target|."""
    from seabreeze_param_tpu.ops.trigger import wind_at_level

    c = small_case
    grid = Grid(lon=c["lon"], lat=c["lat"])
    ct = CoupledTrigger(grid=grid)
    cdist = ct.prepare_mask(c["lsm"], c["ci_t"][0])
    state, theta, u, v = _fields(c)
    nlev = len(c["p"])
    shape = c["lsm"].shape
    rng = np.random.default_rng(21)
    # 3-D pressure on rho levels: column-dependent perturbation big enough
    # to flip the nearest-level choice between columns.
    p3 = (c["p"][:, None, None]
          + 9000.0 * rng.standard_normal((nlev,) + shape)).astype(np.float32)

    target = Params().target_plev_pa
    lev = np.argmin(np.abs(p3 - target), axis=0)         # (nlat, nlon)
    un, vn = np.asarray(u), np.asarray(v)
    ii, jj = np.meshgrid(*map(np.arange, shape), indexing="ij")
    ul, vl = un[lev, ii, jj], vn[lev, ii, jj]
    ref_speed = np.sqrt(ul * ul + vl * vl)

    got_speed, got_dir = wind_at_level(u, v, p3, target)
    np.testing.assert_allclose(np.asarray(got_speed), ref_speed, rtol=1e-6)

    # and the full physics call runs on the 3-D branch without error
    got_state, got_out = ct.physics(state, jnp.asarray(p3), u, v, theta,
                                    c["z"], c["std"], cdist)
    assert np.isfinite(np.asarray(got_out["t0"])).all()
    assert int(got_state.tt) == int(state.tt) + 1


def test_sea_breeze_diag_functional_form(small_case):
    """The argument-for-argument UM routine: updates the inout triple and
    returns error=0 on a valid grid."""
    c = small_case
    grid = Grid(lon=c["lon"], lat=c["lat"])
    ct = CoupledTrigger(grid=grid)
    cdist = ct.prepare_mask(c["lsm"], c["ci_t"][0])
    state, theta, u, v = _fields(c, tt=15)

    sb, ws, wd, thc, err = sea_breeze_diag(
        24.0 * 60.0, 15, c["p"], u, v, theta, c["z"], c["std"], cdist,
        state.windspeed, state.winddir, state.thc, grid)
    assert err == ERROR_NONE
    # equivalent CoupledTrigger.physics call (identical params incl. the
    # seconds->minutes timestep conversion)
    ref_state, ref_out = ct.physics(state, c["p"], u, v, theta, c["z"],
                                    c["std"], cdist)
    np.testing.assert_array_equal(np.asarray(sb),
                                  np.asarray(ref_out["sb_con"]))
    np.testing.assert_array_equal(np.asarray(ws),
                                  np.asarray(ref_state.windspeed))
    np.testing.assert_array_equal(np.asarray(thc),
                                  np.asarray(ref_state.thc))


def test_error_path():
    """The UM bounds check (``UM/...F90:196-202``): empty vertical axis or
    horizontal grid -> error=1, inout state returned untouched."""
    assert validate_grid(0, 4, 3) == ERROR_BAD_GRID
    assert validate_grid(4, 0, 3) == ERROR_BAD_GRID
    assert validate_grid(4, 4, 0) == ERROR_BAD_GRID
    assert validate_grid(4, 4, 3) == ERROR_NONE

    grid = Grid.regular(4, 8, lat0=10.0, lat1=-10.0)
    theta = np.zeros((4, 8), np.float32)
    ws0 = np.full((4, 8), 7.0, np.float32)
    sb, ws, wd, thc, err = sea_breeze_diag(
        1440.0, 1, np.zeros((0,), np.float32),   # empty pressure axis
        np.zeros((0, 4, 8), np.float32), np.zeros((0, 4, 8), np.float32),
        theta, theta, theta, theta, ws0, theta, theta, grid)
    assert err == ERROR_BAD_GRID
    np.testing.assert_array_equal(np.asarray(ws), ws0)   # untouched inout


def test_cumulus_mask():
    """Downstream consumer shim: True exactly where sb_con > threshold and
    not the missing value."""
    sb = np.array([[0.0, 0.5, -0.2], [float(MISSING_VALUE), 2.0, 0.05]],
                  np.float32)
    got = np.asarray(cumulus_mask(sb))
    np.testing.assert_array_equal(
        got, [[False, True, False], [False, True, True]])
    got2 = np.asarray(cumulus_mask(sb, min_strength=0.1))
    np.testing.assert_array_equal(
        got2, [[False, True, False], [False, True, False]])


def test_cumulus_mask_from_sharded_trigger(small_case):
    """BASELINE config #5's chain: the sharded trigger's sb_con feeding the
    mock cumulus mask — mask from the mesh run equals mask from the
    single-device run."""
    from seabreeze_param_tpu.parallel.mesh import make_mesh
    from seabreeze_param_tpu.parallel.sharded import ShardedPipeline

    c = small_case
    grid = Grid(lon=c["lon"], lat=c["lat"])
    pipe = TriggerPipeline(grid)
    nlat, nlon = c["lsm"].shape
    state = TriggerState.zeros((nlat, nlon))
    ref_state, ref_out = pipe.run(state, c["theta_t"][:2], c["u_t"][:2],
                                  c["v_t"][:2], c["lsm"], c["z"], c["std"],
                                  c["p"], ci_t=c["ci_t"][:2])
    sp = ShardedPipeline(pipe, make_mesh((2, 2)))
    got_state, got_out = sp.run(TriggerState.zeros((nlat, nlon)),
                                c["theta_t"][:2], c["u_t"][:2],
                                c["v_t"][:2], c["lsm"], c["z"], c["std"],
                                c["p"], ci_t=c["ci_t"][:2])
    ref_mask = np.asarray(cumulus_mask(ref_out["sb_con"][-1]))
    got_mask = np.asarray(cumulus_mask(got_out["sb_con"][-1]))
    assert ref_mask.any()            # the fixture world does trigger
    mism = got_mask != ref_mask
    assert mism.mean() < 1e-3        # borderline threshold flips only
