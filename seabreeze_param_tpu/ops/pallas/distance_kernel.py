"""Pallas TPU kernel for the coast-distance gather-min.

Fuses both passes of the separable haversine-parameter min
(``ops.distance.min_haversine_param_from_padded``; reference scatter form:
``sobel.f90:154-190``) into one VMEM-resident kernel:

  pass 1:  Mmin[r, x] = masked min_dj { sdlam2[x, dj] : coast[r, x+dj] }
  pass 2:  amin[y,x] = min_di ( sdphi2[y,di] + po[y,di]*Mmin[y+di,x] )

(single extremum: ``distance_tables`` clamps po = cos*cos to >= 0, its
exact-arithmetic sign; empty row-windows are poisoned — see ops.distance
for the exactness proof).

The XLA fori_loop version re-reads the field from HBM on every one of the
~2*(2k+1) sliced passes; here each (tile_rows, tile_cols) tile plus its
2k-wide apron is DMA'd into VMEM once and all min steps run on-chip.

**Coast sparsity.**  A tile whose strip (tile + apron) contains no coastline
cell can only produce the poisoned value BIG (no window has any source), so
the kernel writes BIG and skips both passes — bit-identical to the dense
result.  Coastlines cover a small fraction of a global grid, so most tiles
skip.  The 2-D tiling gives the predicate spatial resolution in both axes.

Grid: 2-D over (row, col) tiles.  The apron overlap between adjacent tiles
cannot be expressed with regular BlockSpec tiling, so the coast field stays
in ANY/HBM and each tile slice is copied with an explicit async DMA.
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


def _kernel(cpad_hbm, sdphi2_ref, po_ref, sdlam2t_ref, out_ref, scr, sem,
            *, k: int, th: int, tw: int, rows_dma: int, cols_dma: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nwin = 2 * k + 1

    # Tile strip [i*th, i*th + rows_dma) x [j*tw, j*tw + cols_dma) of the
    # padded coast field -> VMEM.  rows_dma/cols_dma are the apron-extended
    # tile rounded up to the f32 tiling quanta (Mosaic requires tile-aligned
    # DMA slice shapes); the extra rows/cols are zero-padded in HBM (never
    # coast sources) and land beyond every window slice that is kept.
    dma = pltpu.make_async_copy(
        cpad_hbm.at[pl.ds(i * th, rows_dma), pl.ds(j * tw, cols_dma)],
        scr, sem)
    dma.start()
    dma.wait()

    # Sparsity: no coast source anywhere in the strip -> every window is
    # empty -> amin == BIG everywhere, exactly the dense result.
    any_coast = jnp.any(scr[:] > 0.0)

    @pl.when(jnp.logical_not(any_coast))
    def _skip():
        out_ref[:] = jnp.full((th, tw), BIG_PARAM, jnp.float32)

    @pl.when(any_coast)
    def _compute():
        # --- pass 1: masked sliding min of sdlam2 over the lon window -----
        # (single extremum: distance_tables clamps po >= 0.  SSA values,
        # not scratch refs: Mosaic schedules/spills them itself instead of
        # a VMEM load+store round-trip per dj step)
        mmin = jnp.full((rows_dma, tw), BIG_PARAM, jnp.float32)
        for dj in range(nwin):
            coast_w = scr[:, dj:dj + tw] > 0.0
            cand = sdlam2t_ref[dj:dj + 1, :]           # (1, tw) broadcasts
            mmin = jnp.where(coast_w, jnp.minimum(mmin, cand), mmin)

        # --- pass 2: min over the lat window, empty windows poisoned ------
        amin = jnp.full((th, tw), BIG_PARAM, jnp.float32)
        for di in range(nwin):
            lo = mmin[di:di + th, :]
            p = po_ref[:, di:di + 1]
            cand = sdphi2_ref[:, di:di + 1] + p * lo
            cand = jnp.where(lo > BIG_PARAM / 2, BIG_PARAM, cand)
            amin = jnp.minimum(amin, cand)
        out_ref[:] = amin


def min_haversine_param_pallas_padded(cpad, sdphi2, po, sdlam2, k: int,
                                      *, tile_rows: int = 128,
                                      tile_cols: int = 512,
                                      interpret: bool = False):
    """Pallas form of ``min_haversine_param_from_padded`` (same contract)."""
    k = int(k)
    h = cpad.shape[0] - 2 * k
    w = cpad.shape[1] - 2 * k
    th = min(tile_rows, h)
    tw = min(tile_cols, w)
    ni = -(-h // th)
    nj = -(-w // tw)
    hp = ni * th
    wp = nj * tw
    if hp != h:
        # Row-pad so the grid divides evenly: extra target rows are poisoned
        # (sdphi2=BIG, po=0 -> amin=BIG) and sliced off below.
        sdphi2 = jnp.pad(jnp.asarray(sdphi2), ((0, hp - h), (0, 0)),
                         constant_values=BIG_PARAM)
        po = jnp.pad(jnp.asarray(po), ((0, hp - h), (0, 0)))

    # Per-tile DMA slices aligned to the f32 tiling quanta; the HBM array
    # must contain every tile's slice.  Zero padding = never coast sources.
    rows_dma = _round_up(th + 2 * k, 8)
    cols_dma = _round_up(tw + 2 * k, 128)
    need_r = (ni - 1) * th + rows_dma
    need_c = (nj - 1) * tw + cols_dma
    pad_r = max(0, need_r - (h + 2 * k))
    pad_c = max(0, need_c - (w + 2 * k))
    if pad_r or pad_c:
        cpad = jnp.pad(cpad, ((0, pad_r), (0, pad_c)))
    # Column-table slices per column tile: sdlam2^T laid out (2k+1, w),
    # padded to every tile's (2k+1, tw) block.
    sdlam2t = jnp.asarray(sdlam2).T                 # (2k+1, w)
    if wp != w:
        sdlam2t = jnp.pad(sdlam2t, ((0, 0), (0, wp - w)))

    nwin = 2 * k + 1
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, th=th, tw=tw, rows_dma=rows_dma,
                          cols_dma=cols_dma),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # cpad
            pl.BlockSpec((th, nwin), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),                # sdphi2
            pl.BlockSpec((th, nwin), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),                # po
            pl.BlockSpec((nwin, tw), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                # sdlam2^T
        ],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows_dma, cols_dma), jnp.float32),        # tile
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * nwin * hp * wp,
            bytes_accessed=4 * (h + 2 * k) * (w + 2 * k) + 4 * hp * wp,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(cpad, jnp.float32), jnp.asarray(sdphi2),
      jnp.asarray(po), sdlam2t)
    return out[:h, :w]


def _pass2_kernel(mn_hbm, mx_hbm, sdphi2_ref, po_ref, out_ref, mn_s, mx_s,
                  sem, *, k: int, th: int, tw: int, rows_dma: int,
                  ni: int, nj: int, need_max: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nwin = 2 * k + 1
    # Double-buffered strip DMA: TPU grid steps run sequentially and scratch
    # persists across them, so each step prefetches the NEXT tile's strips
    # into the other slot while computing its own — the per-tile DMA latency
    # (the dominant cost of the serial form) overlaps with compute.
    t = i * nj + j
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def start(tt, sl):
        ii = tt // nj
        jj = jax.lax.rem(tt, nj)
        pltpu.make_async_copy(
            mn_hbm.at[pl.ds(ii * th, rows_dma), pl.ds(jj * tw, tw)],
            mn_s.at[sl], sem.at[sl, 0]).start()
        if need_max:
            pltpu.make_async_copy(
                mx_hbm.at[pl.ds(ii * th, rows_dma), pl.ds(jj * tw, tw)],
                mx_s.at[sl], sem.at[sl, 1]).start()

    def wait(tt, sl):
        ii = tt // nj
        jj = jax.lax.rem(tt, nj)
        pltpu.make_async_copy(
            mn_hbm.at[pl.ds(ii * th, rows_dma), pl.ds(jj * tw, tw)],
            mn_s.at[sl], sem.at[sl, 0]).wait()
        if need_max:
            pltpu.make_async_copy(
                mx_hbm.at[pl.ds(ii * th, rows_dma), pl.ds(jj * tw, tw)],
                mx_s.at[sl], sem.at[sl, 1]).wait()

    @pl.when(t == 0)
    def _first():
        start(t, slot)

    @pl.when(t + 1 < ni * nj)
    def _prefetch():
        start(t + 1, nxt)

    wait(t, slot)

    # Sparsity: every row-window in the strip empty (Mmin == BIG) -> amin
    # stays BIG everywhere — identical to the dense result, compute skipped.
    any_src = jnp.any(mn_s[slot] < BIG_PARAM / 2)

    @pl.when(jnp.logical_not(any_src))
    def _skip():
        out_ref[:] = jnp.full((th, tw), BIG_PARAM, jnp.float32)

    @pl.when(any_src)
    def _compute():
        amin = jnp.full((th, tw), BIG_PARAM, jnp.float32)
        for di in range(nwin):
            lo = mn_s[slot, di:di + th, :]
            p = po_ref[:, di:di + 1]
            if need_max:
                hi = mx_s[slot, di:di + th, :]
                inner = jnp.minimum(p * lo, p * hi)
            else:
                inner = p * lo
            cand = sdphi2_ref[:, di:di + 1] + inner
            cand = jnp.where(lo > BIG_PARAM / 2, BIG_PARAM, cand)
            amin = jnp.minimum(amin, cand)
        out_ref[:] = amin


def pass2_min_pallas(Mmin, Mmax, sdphi2, po, k: int, *, tile_rows: int = 128,
                     tile_cols: int = 512, interpret: bool = False):
    """Pallas form of the separable min's pass 2 (see ops.distance).

    Mmin, Mmax : (h+2k, w) f32 — pass-1 row-window extrema of sdlam2 (BIG /
        -BIG where the window holds no coast cell).  ``Mmax=None`` selects
        the single-extremum form (po >= 0, the ``distance_tables``
        guarantee): one strip DMA and one tap per di instead of two.
    sdphi2, po : (h, 2k+1) f32 row tables.
    Returns amin (h, w).

    Pass 2 only taps along ROWS (sublane offsets — cheap on the VPU), so
    each (th+2k, tw) strip is DMA'd into VMEM once and all 2k+1 taps run
    on-chip: ~3 HBM passes total instead of the XLA form's 2*(2k+1) sweeps
    (measured 2.8 ms -> ~0.3 ms at 0.1 deg, k=15).
    """
    k = int(k)
    need_max = Mmax is not None
    h = Mmin.shape[0] - 2 * k
    w = Mmin.shape[1]
    th = min(tile_rows, _round_up(h, 8))
    # tw must be a lane-quantum multiple: the per-tile HBM DMA slices
    # pl.ds(jj*tw, tw) are only tile-aligned for f32 when tw % 128 == 0.
    tw = min(_round_up(tile_cols, 128), _round_up(w, 128))
    ni = -(-h // th)
    nj = -(-w // tw)
    hp = ni * th
    wp = nj * tw
    if hp != h:
        sdphi2 = jnp.pad(jnp.asarray(sdphi2), ((0, hp - h), (0, 0)),
                         constant_values=BIG_PARAM)
        po = jnp.pad(jnp.asarray(po), ((0, hp - h), (0, 0)))
    rows_dma = _round_up(th + 2 * k, 8)
    need_r = (ni - 1) * th + rows_dma
    pad_r = max(0, need_r - (h + 2 * k))
    if pad_r or wp != w:
        # Fake rows/cols hold empty windows (Mmin=BIG): matching target rows
        # are poisoned via sdphi2=BIG and everything extra is sliced off.
        Mmin = jnp.pad(Mmin, ((0, pad_r), (0, wp - w)),
                       constant_values=BIG_PARAM)
        if need_max:
            Mmax = jnp.pad(Mmax, ((0, pad_r), (0, wp - w)),
                           constant_values=-BIG_PARAM)
    if not need_max:
        Mmax = Mmin       # dummy operand; never DMA'd or read

    nwin = 2 * k + 1
    out = pl.pallas_call(
        functools.partial(_pass2_kernel, k=k, th=th, tw=tw,
                          rows_dma=rows_dma, ni=ni, nj=nj,
                          need_max=need_max),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # Mmin
            pl.BlockSpec(memory_space=pl.ANY),                    # Mmax
            pl.BlockSpec((th, nwin), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),                # sdphi2
            pl.BlockSpec((th, nwin), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),                # po
        ],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows_dma, tw), jnp.float32),           # Mmin x2
            pltpu.VMEM((2, rows_dma, tw), jnp.float32),           # Mmax x2
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * nwin * hp * wp,
            bytes_accessed=8 * (h + 2 * k) * w + 4 * hp * wp,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(Mmin, jnp.float32), jnp.asarray(Mmax, jnp.float32),
      jnp.asarray(sdphi2), jnp.asarray(po))
    return out[:h, :w]


def min_haversine_param_pallas(coast, sdphi2, po, sdlam2, k: int,
                               *, tile_rows: int = 128, tile_cols: int = 512,
                               interpret: bool = False):
    """Single-device wrapper: zero-pad lat, wrap lon, run the kernel."""
    cpad = jnp.pad(jnp.asarray(coast, jnp.float32), ((k, k), (0, 0)))
    cpad = jnp.pad(cpad, ((0, 0), (k, k)), mode="wrap")
    return min_haversine_param_pallas_padded(
        cpad, sdphi2, po, sdlam2, k, tile_rows=tile_rows,
        tile_cols=tile_cols, interpret=interpret)
