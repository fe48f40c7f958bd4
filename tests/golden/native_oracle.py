"""ctypes binding for the native C++ oracle (``native/oracle.cc``).

Builds on demand with make (cached .so).  The C++ oracle mirrors
``tests/golden/reference_numpy.py`` (the semantic spec) but runs ~1000x
faster; ``test_native_oracle.py`` asserts the two agree, after which the
larger golden fixtures use the native one.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

F = np.float32
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, os.pardir, "native")
_LIB = None


def _f32(a):
    return np.ascontiguousarray(np.asarray(a, F))


def lib():
    """Build (if needed) and load liboracle.so; None when no toolchain."""
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "liboracle.so")
    src = os.path.join(_NATIVE_DIR, "oracle.cc")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        _LIB = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    _LIB.sb_get_edges.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int, fp]
    _LIB.sb_search_radius.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_float]
    _LIB.sb_search_radius.restype = ctypes.c_int
    _LIB.sb_get_dist.argtypes = [fp, fp, fp, fp, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_float, fp]
    _LIB.sb_sigmoid.argtypes = [fp, ctypes.c_int64, fp]
    _LIB.sb_diag.argtypes = ([ctypes.c_int, fp, ctypes.c_int] + [fp] * 9
                             + [ctypes.c_int, ctypes.c_int]
                             + [ctypes.c_float] * 8 + [fp])
    _LIB.sb_num_threads.restype = ctypes.c_int
    return _LIB


def available() -> bool:
    return lib() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_get_edges(lsm, ci=None):
    lsm = _f32(lsm)
    nlat, nlon = lsm.shape
    ci = _f32(ci) if ci is not None else np.zeros_like(lsm)
    out = np.empty((nlat, nlon), F)
    lib().sb_get_edges(_ptr(lsm), _ptr(ci), nlat, nlon, _ptr(out))
    return out


def native_get_dist(coast, mask, lon, lat, maxdist=180.0):
    coast, mask = _f32(coast), _f32(mask)
    lon, lat = _f32(lon), _f32(lat)
    nlat, nlon = coast.shape
    out = np.empty((nlat, nlon), F)
    lib().sb_get_dist(_ptr(coast), _ptr(mask), _ptr(lon), _ptr(lat),
                      nlat, nlon, F(maxdist), _ptr(out))
    return out


def native_sigmoid(a):
    a = _f32(a)
    out = np.empty_like(a)
    lib().sb_sigmoid(_ptr(a), a.size, _ptr(out))
    return out


def native_diag(tt, p, z, std, theta, v, u, cdist, windspeed, winddir, thc,
                target_plev=700.0, thresh_wind=11.0, thresh_winddir=90.0,
                thresh_windch=5.0, thresh_thc=0.75, target_time=6.0,
                timestep=24.0, maxdist=180.0):
    """Same contract as reference_numpy.golden_diag (state updated in
    place; returns the (4, nlat, nlon) output array)."""
    p, z, std = _f32(p), _f32(z), _f32(std)
    theta, v, u, cdist = _f32(theta), _f32(v), _f32(u), _f32(cdist)
    for name, arr in (("windspeed", windspeed), ("winddir", winddir),
                      ("thc", thc)):
        if not (isinstance(arr, np.ndarray) and arr.dtype == F
                and arr.flags.c_contiguous):
            raise TypeError(f"{name} must be C-contiguous float32 "
                            "(updated in place)")
    nlat, nlon = theta.shape
    out = np.empty((4, nlat, nlon), F)
    lib().sb_diag(int(tt), _ptr(p), len(p), _ptr(z), _ptr(std), _ptr(theta),
                  _ptr(v), _ptr(u), _ptr(cdist), _ptr(windspeed),
                  _ptr(winddir), _ptr(thc), nlat, nlon,
                  F(target_plev), F(thresh_wind), F(thresh_winddir),
                  F(thresh_windch), F(thresh_thc), F(target_time),
                  F(timestep), F(maxdist), _ptr(out))
    return out


def native_diag_sequence(nsteps, p, z, std, theta_t, v_t, u_t, lsm, ci_t,
                         lon, lat, **kw):
    """Native mirror of reference_numpy.golden_diag_sequence."""
    lsm = _f32(lsm)
    nlat, nlon = lsm.shape
    ws = np.zeros((nlat, nlon), F)
    wd = np.zeros((nlat, nlon), F)
    thc = np.zeros((nlat, nlon), F)
    outs = []
    tt = 1
    for ts in range(nsteps):
        coast = native_get_edges(lsm, ci_t[ts])
        cdist = native_get_dist(coast, lsm, lon, lat,
                                kw.get("maxdist", 180.0))
        out = native_diag(tt, p, z, std, theta_t[ts], v_t[ts], u_t[ts],
                          cdist, ws, wd, thc, **kw)
        outs.append(out)
        thc, ws, wd = (out[1].copy(), out[2].copy(), out[3].copy())
        tt += 1
    return np.stack(outs, axis=1)
