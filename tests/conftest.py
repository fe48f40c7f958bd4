"""Test configuration: run the suite on CPU with 8 virtual devices.

This is the idiomatic JAX equivalent of the reference's no-op
``swap_bounds`` fake backend (``generic/halo_exchange_mod.f90:8-18``): the
same shard_map code paths run on a simulated 8-device mesh without a pod
(SURVEY §4).  The env vars must be set before jax initializes a backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xf = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (
        xf + " --xla_force_host_platform_device_count=8").strip()

# Some images pre-import jax from sitecustomize with a hardware platform
# pinned; the env vars above are then too late — override at runtime (works
# as long as no backend has been initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tests.golden.reference_numpy import F


def _coastline_world(nlat, nlon, seed=0):
    """Synthetic land/sea world with an irregular coastline plus islands —
    the dummy_model-style idealized fixture (SURVEY §4a)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:nlat, 0:nlon]
    # A continent in the east, a wavy west coast, two islands.
    coastx = (0.55 * nlon + 0.08 * nlon * np.sin(2 * np.pi * y / nlat * 2.3)
              + 0.03 * nlon * np.sin(2 * np.pi * y / nlat * 7.1))
    land = (x > coastx).astype(F)
    for cy, cx, r in ((int(0.3 * nlat), int(0.25 * nlon), 0.06),
                      (int(0.7 * nlat), int(0.18 * nlon), 0.04)):
        land[(y - cy) ** 2 + (x - cx) ** 2 < (r * nlon) ** 2] = 1.0
    # Fractional land only on land cells; open ocean is exactly 0 like real
    # land-fraction data.  (With nonzero fractions everywhere the reference's
    # get_dist sign test `mask > 0` would classify every cell as land and its
    # expanding-ring search would never find a sea point — infinite loop.)
    frac = 0.55 + 0.45 * rng.random((nlat, nlon)).astype(F)
    return (land * frac).astype(F)


@pytest.fixture(scope="session")
def small_case():
    """Regional grid fine enough that the distance search radius k >= 2."""
    nlat, nlon, nlev, nt = 64, 64, 5, 4
    # Descending (ERA-style) lats; 0.5 deg spacing so the distance search
    # radius k = 2 cells and the ring search genuinely expands.
    lat = np.linspace(7.0, -24.5, nlat).astype(F)
    lon = np.linspace(100.0, 132.0, nlon, endpoint=False).astype(F)
    rng = np.random.default_rng(7)
    lsm = _coastline_world(nlat, nlon)
    ci_t = np.zeros((nt, nlat, nlon), F)
    ci_t[2:, :6, :] = 0.9  # moving sea ice changes the coastline mid-run
    z = (800.0 * lsm * rng.random((nlat, nlon))).astype(F)
    std = (120.0 * lsm * rng.random((nlat, nlon))).astype(F)
    p = np.array([100000.0, 92500.0, 85000.0, 70000.0, 50000.0], F)
    theta_t = (288.0 + 8.0 * rng.standard_normal((nt, nlat, nlon))
               + 6.0 * lsm).astype(F)
    u_t = (6.0 * rng.standard_normal((nt, nlev, nlat, nlon))).astype(F)
    v_t = (6.0 * rng.standard_normal((nt, nlev, nlat, nlon))).astype(F)
    return dict(lat=lat, lon=lon, lsm=lsm, ci_t=ci_t, z=z, std=std, p=p,
                theta_t=theta_t, u_t=u_t, v_t=v_t)


@pytest.fixture(scope="session")
def global_case():
    """Global 1.5-degree grid with descending (ERA-style) latitudes."""
    nlat, nlon, nlev, nt = 121, 240, 3, 2
    lat = np.linspace(90.0, -90.0, nlat).astype(F)
    lon = np.linspace(0.0, 360.0, nlon, endpoint=False).astype(F)
    rng = np.random.default_rng(3)
    lsm = _coastline_world(nlat, nlon, seed=5)
    ci_t = np.zeros((nt, nlat, nlon), F)
    ci_t[:, :5, :] = 0.8
    z = (500.0 * lsm * rng.random((nlat, nlon))).astype(F)
    std = (90.0 * lsm * rng.random((nlat, nlon))).astype(F)
    p = np.array([100000.0, 70000.0, 50000.0], F)
    theta_t = (285.0 + 10.0 * rng.standard_normal((nt, nlat, nlon))).astype(F)
    u_t = (7.0 * rng.standard_normal((nt, nlev, nlat, nlon))).astype(F)
    v_t = (7.0 * rng.standard_normal((nt, nlev, nlat, nlon))).astype(F)
    return dict(lat=lat, lon=lon, lsm=lsm, ci_t=ci_t, z=z, std=std, p=p,
                theta_t=theta_t, u_t=u_t, v_t=v_t)
