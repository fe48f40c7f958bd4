"""Pallas TPU kernel: fused expanding-ring THC search.

The ring search (``ops.ring_search.ring_thc_from_padded``; reference
data-dependent while loop ``seabreeze_diag_python.f90:187-221``) is the
pipeline's dominant HBM consumer in XLA form: every one of the NN
incremental-window steps re-reads sliced copies of the 4-channel quantity
stack from HBM (~30 sliced passes at NN=10).  Here each row tile (plus its
NN-row apron) is DMA'd into VMEM once; the horizontal/vertical running
sums, all NN window updates, and the found-select all run on-chip — one
HBM read of (t0, cdist) + one write of (n_thc) total, the speed-of-light
shape for this memory-bound op.

The quantity channels are formed in VMEM from the two raw fields (land
class = ``cdist >= 0`` on the final field, sentinel cells land — the
reference quirk, ``seabreeze_diag_python.f90:204``), so HBM traffic is 2
input channels instead of the XLA path's pre-materialized 4.

Grid: 1-D over row tiles; apron overlap requires ANY memory + manual DMA
(regular BlockSpec tiling cannot overlap), as in ``distance_kernel``.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(t0_hbm, cd_hbm, cdc_ref, out_thc, t0s, cds, hp, vc, ws, sem,
            *, nn_max: int, th: int, w: int, rows_dma: int, cols_dma: int):
    i = pl.program_id(0)
    NN = int(nn_max)

    # rows_dma = th + 2NN rounded up to the f32 sublane tiling (8): Mosaic
    # requires tile-aligned DMA slice shapes.  Extra rows (zero-padded in
    # HBM) sit at strip indices >= th + 2NN, beyond every window slice
    # (max offset NN+nn+th <= th + 2NN), so they never enter a sum.
    t0_dma = pltpu.make_async_copy(
        t0_hbm.at[pl.ds(i * th, rows_dma), :], t0s, sem.at[0])
    cd_dma = pltpu.make_async_copy(
        cd_hbm.at[pl.ds(i * th, rows_dma), :], cds, sem.at[1])
    t0_dma.start()
    cd_dma.start()
    t0_dma.wait()
    cd_dma.wait()

    # Quantity channels in VMEM (t0*land exact, land indicator).
    land = (cds[:] >= 0.0).astype(jnp.float32)           # (th+2NN, w+2NN)
    tl = t0s[:] * land
    # Running-sum state at order 0 (see ops.ring_search docstring):
    #   hp[c] : horizontal sums over all rows        (th+2NN, w)
    #   vc[c] : vertical sums over the center rows   (th, w+2NN)
    #   ws[c] : window sums over the center block    (th, w)
    # Channels: 0 = t0*land, 1 = land, 2 = t0*sea, 3 = sea.
    ts = t0s[:] - tl                                      # exact: tl is t0|0
    sea = 1.0 - land
    tss = t0s[:] * 0.0 + ts                               # keep names clear
    for c, q in ((0, tl), (1, land), (2, tss), (3, sea)):
        hp[c] = q[:, NN:NN + w]
        vc[c] = q[NN:NN + th, :]
        ws[c] = q[NN:NN + th, NN:NN + w]

    found = jnp.zeros((th, w), jnp.bool_)
    n_thc = jnp.zeros((th, w), jnp.float32)
    # mul comes from the UNPADDED center (cdc_ref): the quirky lon pad maps
    # the last column onto column 0 inside the strip, so the strip center is
    # not the identity (ops.indexing.remap_lon_quirky) — but the reference
    # takes the target's own class unremapped (seabreeze_diag_python.f90:220).
    mul = jnp.where(cdc_ref[:] >= 0.0, jnp.float32(1.0), jnp.float32(-1.0))
    quants = (tl, land, tss, sea)

    val = n_thc
    for nn in range(1, NN + 1):
        for c in range(4):
            q = quants[c]
            # widen the horizontal running sum to order nn
            hp[c] = (hp[c] + q[:, NN - nn:NN - nn + w]
                     + q[:, NN + nn:NN + nn + w])
            top = hp[c, NN - nn:NN - nn + th, :]
            bot = hp[c, NN + nn:NN + nn + th, :]
            # vertical running sum is at order nn-1 (excludes the new rows)
            left = vc[c, :, NN - nn:NN - nn + w]
            right = vc[c, :, NN + nn:NN + nn + w]
            ws[c] = ws[c] + top + bot + left + right
            # then widen the vertical running sum for the next iteration
            vc[c] = (vc[c] + q[NN - nn:NN - nn + th, :]
                     + q[NN + nn:NN + nn + th, :])
        t_l, n_l, t_s, n_s = ws[0], ws[1], ws[2], ws[3]
        ok = (n_l > 0.0) & (n_s > 0.0)
        newly = ok & (~found)
        val = mul * (t_l / jnp.maximum(n_l, 1.0)
                     - t_s / jnp.maximum(n_s, 1.0))
        n_thc = jnp.where(newly, val, n_thc)
        found = found | ok

    # never-found fallback: the NN-window value (ops.ring_search semantics)
    out_thc[:] = jnp.where(found, n_thc, val)


def ring_thc_pallas_padded(t0_pad, cd_pad, cd_center, nn_max: int, *,
                           tile_rows: int = 32, interpret: bool = False):
    """Fused ring search on NN-padded fields.

    t0_pad, cd_pad : (h+2NN, w+2NN) f32 — padded sea-level temperature and
        signed coast distance (pad via the exact boundary maps
        single-device, or halo exchange sharded).
    cd_center : (h, w) f32 — the *unpadded* signed coast distance, used only
        for the target-cell class sign (the quirky lon pad is not the
        identity on its center, see kernel comment).
    Returns n_thc (h, w) — same contract/semantics as
    ``ops.ring_search.ring_thc_from_padded`` with channels formed from the
    raw fields (t0*sea by exact complement, see module docstring).
    """
    NN = int(nn_max)
    h = t0_pad.shape[0] - 2 * NN
    w = t0_pad.shape[1] - 2 * NN
    th = min(tile_rows, h)
    ntiles = -(-h // th)
    hp_rows = ntiles * th
    if hp_rows != h:
        # Row-pad the *top* of the apron region so the grid divides; the
        # extra target rows compute garbage and are sliced off.
        extra = hp_rows - h
        t0_pad = jnp.pad(t0_pad, ((0, extra), (0, 0)))
        cd_pad = jnp.pad(cd_pad, ((0, extra), (0, 0)),
                         constant_values=np.float32(12000.0))
        cd_center = jnp.pad(cd_center, ((0, extra), (0, 0)))

    # Align the per-tile DMA slice to the f32 tiling: rows to the sublane
    # quantum (8), the full copied width to the lane quantum (128).  Extra
    # rows/cols never enter a window sum (see kernel comment).
    rows_dma = _round_up(th + 2 * NN, 8)
    cols_dma = _round_up(w + 2 * NN, 128)
    align_extra = max(0, (hp_rows - th + rows_dma) - (hp_rows + 2 * NN))
    pad_c = cols_dma - (w + 2 * NN)
    if align_extra > 0 or pad_c > 0:
        t0_pad = jnp.pad(t0_pad, ((0, align_extra), (0, pad_c)))
        cd_pad = jnp.pad(cd_pad, ((0, align_extra), (0, pad_c)),
                         constant_values=np.float32(12000.0))

    out = pl.pallas_call(
        functools.partial(_kernel, nn_max=NN, th=th, w=w, rows_dma=rows_dma,
                          cols_dma=cols_dma),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # t0_pad
            pl.BlockSpec(memory_space=pl.ANY),   # cd_pad
            pl.BlockSpec((th, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # cd_center
        ],
        out_specs=pl.BlockSpec((th, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp_rows, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows_dma, cols_dma), jnp.float32),        # t0 strip
            pltpu.VMEM((rows_dma, cols_dma), jnp.float32),        # cd strip
            pltpu.VMEM((4, rows_dma, w), jnp.float32),            # hp
            pltpu.VMEM((4, th, cols_dma), jnp.float32),           # vc
            pltpu.VMEM((4, th, w), jnp.float32),                  # ws
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 8 * NN * hp_rows * w,
            bytes_accessed=8 * (hp_rows + 2 * NN) * (w + 2 * NN)
            + 4 * hp_rows * w,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(t0_pad, jnp.float32), jnp.asarray(cd_pad, jnp.float32),
      jnp.asarray(cd_center, jnp.float32))
    return out[:h]
