"""ICI halo exchange — the TPU-native ``swap_bounds``.

Replaces the reference's MPI halo exchange (UM ``swap_bounds``,
``UM/vn10.7/sea_breeze_diag.F90:408-410, 531-545``; no-op stub
``generic/halo_exchange_mod.f90:8-18``) with ``jax.lax.ppermute`` shifts on
a ('y', 'x') mesh inside ``shard_map``.  Longitude is a ring (ICI torus
wrap); latitude is bounded, with the global-edge shards filling their
missing halo locally according to the reference's boundary semantics:

  * ``lat_fill='clamp'`` — replicate the global edge row (the Fortran
    ``min(max(1, i), nlats)`` clamp; sobel + ring search).
  * ``lat_fill='zero'``  — zeros (distance transform: out-of-grid rows are
    never coastline sources).

The reference's quirky lon map ``max(1, modulo(j, nlons))``
(sobel.f90:68, seabreeze_diag_python.f90:202) differs from clean
periodicity in exactly two places, both local to the seam shards after a
periodic exchange (see ops.indexing):

  * padded position -1 holds global column 0 (not n-1) — patched by the
    shard owning column 0;
  * interior position n-1 *aliases* to column 0 — patched by the shard
    owning column n-1 (its right halo's first column is column 0).

Two-phase exchange (x then y on the x-padded array) delivers the corner
halos for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .mesh import AXIS_Y, AXIS_X


def _shift_from_left(strip, axis_name, periodic):
    """Each shard receives its LEFT neighbor's strip (send right)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return strip if periodic else jnp.zeros_like(strip)
    perm = [(i, (i + 1) % n) for i in range(n if periodic else n - 1)]
    return lax.ppermute(strip, axis_name, perm)


def _shift_from_right(strip, axis_name, periodic):
    """Each shard receives its RIGHT neighbor's strip (send left)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return strip if periodic else jnp.zeros_like(strip)
    perm = [((i + 1) % n, i) for i in range(n if periodic else n - 1)]
    return lax.ppermute(strip, axis_name, perm)


def halo_pad(local, hy: int, hx: int, *, lat_fill: str = "clamp",
             exact_lon: bool = True, axis_y: str = AXIS_Y,
             axis_x: str = AXIS_X):
    """Attach hy/hx-wide halos to a local (..., h, w) block inside shard_map.

    Returns (..., h + 2*hy, w + 2*hx).
    """
    out = local
    # ---- phase 1: longitude ring ------------------------------------
    if hx:
        left = _shift_from_left(out[..., :, -hx:], axis_x, periodic=True)
        right = _shift_from_right(out[..., :, :hx], axis_x, periodic=True)
        out = jnp.concatenate([left, out, right], axis=-1)
    # ---- phase 2: latitude (bounded), on the x-padded array ----------
    if hy:
        top = _shift_from_left(out[..., -hy:, :], axis_y, periodic=False)
        bot = _shift_from_right(out[..., :hy, :], axis_y, periodic=False)
        y_idx = lax.axis_index(axis_y)
        ny = lax.axis_size(axis_y)
        if lat_fill == "clamp":
            top_fill = jnp.repeat(out[..., :1, :], hy, axis=-2)
            bot_fill = jnp.repeat(out[..., -1:, :], hy, axis=-2)
            top = jnp.where(y_idx == 0, top_fill, top)
            bot = jnp.where(y_idx == ny - 1, bot_fill, bot)
        elif lat_fill != "zero":
            raise ValueError(lat_fill)
        out = jnp.concatenate([top, out, bot], axis=-2)
    # ---- quirky-lon seam patches (see module docstring) --------------
    if hx and exact_lon:
        x_idx = lax.axis_index(axis_x)
        nx = lax.axis_size(axis_x)
        w = local.shape[-1]
        # position -1 := global column 0 (own first interior column)
        patched_lo = out.at[..., :, hx - 1].set(out[..., :, hx])
        out = jnp.where(x_idx == 0, patched_lo, out)
        # interior position n-1 := global column 0 (right halo's first col)
        patched_hi = out.at[..., :, hx + w - 1].set(out[..., :, hx + w])
        out = jnp.where(x_idx == nx - 1, patched_hi, out)
    return out


def swap_bounds(field, halo_size: int, **kw):
    """Name-compatible alias for the reference's ``swap_bounds`` contract
    (generic/halo_exchange_mod.f90:8): symmetric halo in both dims."""
    return halo_pad(field, halo_size, halo_size, **kw)
