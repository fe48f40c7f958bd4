"""Grid description for the lat-lon sphere.

The reference drives everything off two 1-D coordinate vectors (``lon``,
``lat``) plus a 1-D pressure vector (see
``/root/reference/python_wrapper/seabreezediag/__init__.py:91`` signature and
``sobel.f90:103-104``).  ``Grid`` is the static-metadata object of the new
framework: it owns the concrete (NumPy, host-side) coordinate vectors so that
shape- and radius-derived integers (the ``k`` search radius of the distance
transform, the ring-search bound) are *Python ints at trace time* — XLA sees
only static shapes and static loop bounds.

Float32 discipline: the reference Fortran uses default ``real`` (32-bit) with
``pi = 3.1415926`` and ``R = 6370.9989`` km (``sobel.f90:115-116``).  All
derived scalars here are computed in float32 with the same operation order so
that the integer truncation ``k = int(maxdist / dx)`` (``sobel.f90:137``)
lands on the same integer.
"""
from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np

# Exact float32 constants of the reference (sobel.f90:115-118).
EARTH_RADIUS_KM = np.float32(6370.9989)
PI_F32 = np.float32(3.1415926)
DEG2RAD_F32 = PI_F32 / np.float32(180.0)
RAD2DEG_F32 = np.float32(180.0) / PI_F32


@dataclasses.dataclass(frozen=True)
class Grid:
    """Static lat-lon grid metadata.

    Attributes
    ----------
    lon : (nlon,) float32 ndarray — longitudes in degrees (any branch;
        values > 180 are re-branched to (-180, 180] exactly like
        ``sobel.f90:165-174`` when distances are computed).
    lat : (nlat,) float32 ndarray — latitudes in degrees.  May be ascending
        or descending (ERA-Interim ships 90 → -90).
    """

    lon: np.ndarray
    lat: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "lon", np.asarray(self.lon, np.float32))
        object.__setattr__(self, "lat", np.asarray(self.lat, np.float32))

    @property
    def nlon(self) -> int:
        return int(self.lon.shape[0])

    @property
    def nlat(self) -> int:
        return int(self.lat.shape[0])

    @property
    def shape(self) -> tuple[int, int]:
        """Field shape as (nlat, nlon) — C/row-major layout, lat leading.

        The reference stores Fortran (nlons, nlats); the whole ``c2f`` layer
        (``__init__.py:13-40``) exists to bridge that.  The new framework is
        row-major (lat, lon) everywhere, so the conversion layer disappears.
        """
        return (self.nlat, self.nlon)

    @cached_property
    def lam(self) -> np.ndarray:
        """Longitudes in radians (``sobel.f90:131``)."""
        return (DEG2RAD_F32 * self.lon).astype(np.float32)

    @cached_property
    def phi(self) -> np.ndarray:
        """Latitudes in radians (``sobel.f90:130``)."""
        return (DEG2RAD_F32 * self.lat).astype(np.float32)

    @cached_property
    def lon_branched(self) -> np.ndarray:
        """Longitude in radians re-branched to (-180, 180] degrees.

        Mirrors the per-pair correction at ``sobel.f90:165-174``:
        ``l = d2r * (lon - 360)`` where ``lon > 180`` else ``d2r * lon``.
        """
        lon = self.lon
        return np.where(
            lon > np.float32(180.0),
            DEG2RAD_F32 * (lon - np.float32(360.0)),
            DEG2RAD_F32 * lon,
        ).astype(np.float32)

    def cell_diag_km_at70(self) -> np.float32:
        """Haversine length of one diagonal grid step evaluated at ~70° lat.

        Exact port of ``sobel.f90:129-136``: the search radius of the
        distance transform is converted from km to grid cells using the cell
        size at the latitude closest to 70°, so the radius shrinks poleward
        of 70° instead of blowing up.
        """
        lat = self.lat
        phi = self.phi
        lam = self.lam
        # Fortran: tlat = int(minloc(abs(70 - lat),1)) — first index of the
        # minimum, 1-based; phi1(tlat+1) is the next element.
        tlat = int(np.argmin(np.abs(np.float32(70.0) - lat)))
        if tlat + 1 >= lat.shape[0]:  # degenerate tiny grids
            tlat = lat.shape[0] - 2
        dphi = np.float32(phi[tlat + 1] - phi[tlat])
        dlam = np.float32(lam[1] - lam[0])
        a = np.float32(
            np.sin(dphi / 2, dtype=np.float32) ** 2
            + (
                np.cos(phi[tlat + 1], dtype=np.float32)
                * (
                    np.cos(phi[tlat], dtype=np.float32)
                    * np.sin(dlam / 2, dtype=np.float32) ** 2
                )
            )
        )
        dx = EARTH_RADIUS_KM * np.float32(2.0) * np.arctan2(
            np.sqrt(a, dtype=np.float32),
            np.sqrt(np.float32(1.0) - a, dtype=np.float32),
            dtype=np.float32,
        )
        return np.float32(dx)

    def search_radius_cells(self, maxdist_km: float) -> int:
        """``k = int(maxdist / dx)`` of ``sobel.f90:137`` as a Python int."""
        dx = self.cell_diag_km_at70()
        return int(np.float32(maxdist_km) / dx)

    @staticmethod
    def regular(nlat: int, nlon: int, lat0=-90.0, lat1=90.0, lon0=0.0,
                lon1=360.0, descending_lat: bool = False) -> "Grid":
        """Convenience constructor for a regular grid (endpoint-exclusive lon,
        endpoint-inclusive lat), matching common reanalysis layouts."""
        lat = np.linspace(lat0, lat1, nlat, dtype=np.float32)
        if descending_lat:
            lat = lat[::-1].copy()
        lon = np.linspace(lon0, lon1, nlon, endpoint=False, dtype=np.float32)
        return Grid(lon=lon, lat=lat)
