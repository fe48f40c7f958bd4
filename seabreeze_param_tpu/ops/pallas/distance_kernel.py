"""Pallas TPU kernel for the coast-distance gather-min.

Fuses both passes of the separable haversine-parameter min
(``ops.distance.min_haversine_param_from_padded``; reference scatter form:
``sobel.f90:154-190``) into one VMEM-resident kernel:

  pass 1:  Mmin/Mmax[r, x] = masked min/max_dj { sdlam2[x, dj] : coast[r, x+dj] }
  pass 2:  amin[y,x] = min_di ( sdphi2[y,di]
                                + min(po[y,di]*Mmin[y+di,x],
                                      po[y,di]*Mmax[y+di,x]) )

(both extrema because float32 ``po = cos*cos`` dips to ~-4e-8 at the poles;
empty row-windows are poisoned — see ops.distance for the exactness proof).

The XLA fori_loop version re-reads the field from HBM on every one of the
~2*(2k+1) sliced passes; here each row tile (plus its 2k-row apron) is DMA'd
into VMEM once and all 2*(2k+1) min steps run on-chip, so the kernel is one
HBM read of the coast field + one HBM write of the result — the pipeline is
memory-bound, so this is the speed-of-light shape for the op.

Grid: 1-D over row tiles.  The apron overlap between adjacent tiles cannot
be expressed with regular BlockSpec tiling, so the coast field stays in
ANY/HBM and each tile slice is copied with an explicit async DMA.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_PARAM = np.float32(1.0e30)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(cpad_hbm, sdphi2_ref, po_ref, sdlam2t_ref, out_ref, scr,
            mmin_scr, mmax_scr, sem, *, k: int, th: int, w: int,
            rows_dma: int):
    i = pl.program_id(0)
    nwin = 2 * k + 1

    # Tile rows [i*th, i*th + rows_dma) of the padded coast field -> VMEM.
    # rows_dma = th + 2k rounded up to the f32 sublane tiling (8): Mosaic
    # requires DMA slice shapes tile-aligned on the second-minor dim.  The
    # extra rows are zero-padded in HBM (never coast sources) and land in
    # mmin rows >= th + 2k, which no pass-2 window (di <= 2k) ever reads.
    dma = pltpu.make_async_copy(
        cpad_hbm.at[pl.ds(i * th, rows_dma), :], scr, sem)
    dma.start()
    dma.wait()

    # --- pass 1: masked sliding min/max of sdlam2 over the lon window -----
    mmin_scr[:] = jnp.full((rows_dma, w), BIG_PARAM, jnp.float32)
    mmax_scr[:] = jnp.full((rows_dma, w), -BIG_PARAM, jnp.float32)
    for dj in range(nwin):
        coast_w = scr[:, dj:dj + w] > 0.0
        cand = sdlam2t_ref[dj:dj + 1, :]           # (1, w) broadcasts
        mmin_scr[:] = jnp.where(coast_w, jnp.minimum(mmin_scr[:], cand),
                                mmin_scr[:])
        mmax_scr[:] = jnp.where(coast_w, jnp.maximum(mmax_scr[:], cand),
                                mmax_scr[:])

    # --- pass 2: min over the lat window, empty windows poisoned ----------
    amin = jnp.full((th, w), BIG_PARAM, jnp.float32)
    for di in range(nwin):
        lo = mmin_scr[di:di + th, :]
        hi = mmax_scr[di:di + th, :]
        p = po_ref[:, di:di + 1]
        cand = sdphi2_ref[:, di:di + 1] + jnp.minimum(p * lo, p * hi)
        cand = jnp.where(lo > BIG_PARAM / 2, BIG_PARAM, cand)
        amin = jnp.minimum(amin, cand)
    out_ref[:] = amin


def min_haversine_param_pallas_padded(cpad, sdphi2, po, sdlam2, k: int,
                                      *, tile_rows: int = 128,
                                      interpret: bool = False):
    """Pallas form of ``min_haversine_param_from_padded`` (same contract)."""
    k = int(k)
    h = cpad.shape[0] - 2 * k
    w = cpad.shape[1] - 2 * k
    th = min(tile_rows, h)
    ntiles = -(-h // th)
    hp = ntiles * th
    if hp != h:
        # Row-pad so the grid divides evenly: extra rows are poisoned
        # (sdphi2=BIG, po=0 -> amin=BIG) and sliced off below.
        cpad = jnp.pad(cpad, ((0, hp - h), (0, 0)))
        sdphi2 = jnp.pad(jnp.asarray(sdphi2), ((0, hp - h), (0, 0)),
                         constant_values=BIG_PARAM)
        po = jnp.pad(jnp.asarray(po), ((0, hp - h), (0, 0)))

    # Align the per-tile DMA slice to the f32 tiling: rows to the sublane
    # quantum (8), the full copied width to the lane quantum (128).  The
    # padding is zeros = never coast sources, so results are unchanged.
    rows_dma = _round_up(th + 2 * k, 8)
    cols_dma = _round_up(w + 2 * k, 128)
    extra = (hp - th + rows_dma) - (hp + 2 * k)
    pad_c = cols_dma - (w + 2 * k)
    if extra > 0 or pad_c > 0:
        cpad = jnp.pad(cpad, ((0, max(extra, 0)), (0, pad_c)))

    nwin = 2 * k + 1
    sdlam2t = jnp.asarray(sdlam2).T                 # (2k+1, w)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, th=th, w=w, rows_dma=rows_dma),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # cpad
            pl.BlockSpec((th, nwin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                # sdphi2
            pl.BlockSpec((th, nwin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                # po
            pl.BlockSpec((nwin, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                # sdlam2^T
        ],
        out_specs=pl.BlockSpec((th, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows_dma, cols_dma), jnp.float32),        # tile
            pltpu.VMEM((rows_dma, w), jnp.float32),               # Mmin
            pltpu.VMEM((rows_dma, w), jnp.float32),               # Mmax
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * nwin * hp * w,
            bytes_accessed=4 * (hp + 2 * k) * (w + 2 * k) + 4 * hp * w,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(cpad, jnp.float32), jnp.asarray(sdphi2),
      jnp.asarray(po), sdlam2t)
    return out[:h]


def min_haversine_param_pallas(coast, sdphi2, po, sdlam2, k: int,
                               *, tile_rows: int = 128,
                               interpret: bool = False):
    """Single-device wrapper: zero-pad lat, wrap lon, run the kernel."""
    cpad = jnp.pad(jnp.asarray(coast, jnp.float32), ((k, k), (0, 0)))
    cpad = jnp.pad(cpad, ((0, 0), (k, k)), mode="wrap")
    return min_haversine_param_pallas_padded(
        cpad, sdphi2, po, sdlam2, k, tile_rows=tile_rows, interpret=interpret)
