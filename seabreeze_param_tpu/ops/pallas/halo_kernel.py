"""Pallas ICI halo exchange: ``make_async_remote_copy`` neighbor DMA.

The reference's ``swap_bounds`` is MPI message passing
(``UM/vn10.7/sea_breeze_diag.F90:408-410``).  The framework's production
exchange is ``lax.ppermute`` (``parallel/halo.py``) — XLA lowers it to
async collective-permutes that its latency-hiding scheduler overlaps with
unrelated compute.  This module is the OTHER TPU-native form (SURVEY §5.8,
SNIPPETS §1): a Pallas kernel that DMAs edge strips and corner blocks
directly into the neighbors' output buffers over ICI, bypassing XLA's
collective machinery entirely.  One kernel launch assembles the full
padded block:

  * the local center via a local async copy,
  * 2 lon-ring strips + 0-2 bounded-lat strips + 0-4 corner blocks, each a
    ``make_async_remote_copy`` addressed by logical mesh coordinates
    (``DeviceIdType.MESH``) — corners go DIRECTLY to the diagonal
    neighbor, no two-hop;
  * semaphore slots are indexed by the *receiver's* incoming direction, so
    every device waits exactly for the transfers aimed at it (edge devices
    of the bounded lat axis expect fewer).

A barrier semaphore round (signal every neighbor, wait for every expected
neighbor) precedes the data transfers — remote DMA may not touch a
neighbor's buffers before that neighbor has entered the kernel
(``compiler_params.collective_id`` scopes it).

The global-lat-edge fill (clamp/zero) and the quirky-lon seam patches are
applied OUTSIDE the kernel by the caller (``halo_exchange_dma``), exactly
as ``parallel.halo.halo_finish`` does — they are local elementwise
patches, not communication.

Verified against ``parallel.halo.halo_pad`` bit-for-bit on the virtual
CPU mesh under ``pltpu.InterpretParams`` (tests/test_halo_dma.py), which
models the inter-device DMAs; on real hardware the ppermute path remains
the default (it overlaps better under the XLA scheduler), this kernel
being the explicit-DMA alternative for runtimes where collective-permute
is the bottleneck.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Receiver-perspective semaphore slots.
FROM_LEFT, FROM_RIGHT, FROM_ABOVE, FROM_BELOW = 0, 1, 2, 3
FROM_TL, FROM_TR, FROM_BL, FROM_BR = 4, 5, 6, 7


def _kernel(x_ref, out_ref, loc_sem, send_sem, recv_sem, *, h: int, w: int,
            hy: int, hx: int, axis_y: str, axis_x: str):
    my_y = lax.axis_index(axis_y)
    my_x = lax.axis_index(axis_x)
    ny = lax.axis_size(axis_y)
    nx = lax.axis_size(axis_x)
    up_ok = my_y > 0
    dn_ok = my_y < ny - 1

    # --- barrier: nobody writes into a neighbor's out_ref before that
    # neighbor has entered the kernel ---------------------------------
    barrier = pltpu.get_barrier_semaphore()
    left = (my_y, lax.rem(my_x + nx - 1, nx))
    right = (my_y, lax.rem(my_x + 1, nx))
    pltpu.semaphore_signal(barrier, device_id=left,
                           device_id_type=pltpu.DeviceIdType.MESH)
    pltpu.semaphore_signal(barrier, device_id=right,
                           device_id_type=pltpu.DeviceIdType.MESH)
    expected = jnp.int32(2)

    @pl.when(up_ok)
    def _():
        for tx in (my_x, left[1], right[1]):
            pltpu.semaphore_signal(barrier, device_id=(my_y - 1, tx),
                                   device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when(dn_ok)
    def _():
        for tx in (my_x, left[1], right[1]):
            pltpu.semaphore_signal(barrier, device_id=(my_y + 1, tx),
                                   device_id_type=pltpu.DeviceIdType.MESH)

    expected = expected + jnp.where(up_ok, 3, 0) + jnp.where(dn_ok, 3, 0)
    pltpu.semaphore_wait(barrier, expected)

    # --- local center ------------------------------------------------
    loc = pltpu.make_async_copy(
        x_ref, out_ref.at[pl.ds(hy, h), pl.ds(hx, w)], loc_sem)
    loc.start()

    def remote(src_rows, src_cols, dst_rows, dst_cols, dev, send_slot,
               recv_slot):
        """Start one strip/corner DMA into ``dev``'s out_ref."""
        return pltpu.make_async_remote_copy(
            src_ref=x_ref.at[src_rows, src_cols],
            dst_ref=out_ref.at[dst_rows, dst_cols],
            send_sem=send_sem.at[send_slot], recv_sem=recv_sem.at[recv_slot],
            device_id=dev, device_id_type=pltpu.DeviceIdType.MESH)

    rows_c = pl.ds(hy, h)        # receiver's center rows
    cols_c = pl.ds(hx, w)        # receiver's center cols
    sends = []
    # lon ring: my right edge -> right neighbor's LEFT halo, and v.v.
    sends.append(remote(pl.ds(0, h), pl.ds(w - hx, hx), rows_c, pl.ds(0, hx),
                        right, FROM_LEFT, FROM_LEFT))
    sends.append(remote(pl.ds(0, h), pl.ds(0, hx), rows_c,
                        pl.ds(hx + w, hx), left, FROM_RIGHT, FROM_RIGHT))
    for s in sends:
        s.start()

    # bounded lat: my top rows -> upper neighbor's BOTTOM halo, and v.v.
    @pl.when(up_ok)
    def _():
        up = (my_y - 1, my_x)
        s = remote(pl.ds(0, hy), pl.ds(0, w), pl.ds(hy + h, hy), cols_c,
                   up, FROM_BELOW, FROM_BELOW)
        s.start()
        s.wait_send()
        # corners to the diagonal neighbors
        ul = (my_y - 1, left[1])
        s = remote(pl.ds(0, hy), pl.ds(0, hx), pl.ds(hy + h, hy),
                   pl.ds(hx + w, hx), ul, FROM_BR, FROM_BR)
        s.start()
        s.wait_send()
        ur = (my_y - 1, right[1])
        s = remote(pl.ds(0, hy), pl.ds(w - hx, hx), pl.ds(hy + h, hy),
                   pl.ds(0, hx), ur, FROM_BL, FROM_BL)
        s.start()
        s.wait_send()

    @pl.when(dn_ok)
    def _():
        dn = (my_y + 1, my_x)
        s = remote(pl.ds(h - hy, hy), pl.ds(0, w), pl.ds(0, hy), cols_c,
                   dn, FROM_ABOVE, FROM_ABOVE)
        s.start()
        s.wait_send()
        dl = (my_y + 1, left[1])
        s = remote(pl.ds(h - hy, hy), pl.ds(0, hx), pl.ds(0, hy),
                   pl.ds(hx + w, hx), dl, FROM_TR, FROM_TR)
        s.start()
        s.wait_send()
        dr = (my_y + 1, right[1])
        s = remote(pl.ds(h - hy, hy), pl.ds(w - hx, hx), pl.ds(0, hy),
                   pl.ds(0, hx), dr, FROM_TL, FROM_TL)
        s.start()
        s.wait_send()

    # --- waits: everything aimed at me -------------------------------
    def wait_recv(dst_rows, dst_cols, slot):
        """Wait for one expected incoming transfer (descriptor only names
        my destination slice + the semaphore slot the sender signals)."""
        pltpu.make_async_remote_copy(
            src_ref=out_ref.at[dst_rows, dst_cols],
            dst_ref=out_ref.at[dst_rows, dst_cols],
            send_sem=send_sem.at[slot], recv_sem=recv_sem.at[slot],
            device_id=(my_y, my_x),
            device_id_type=pltpu.DeviceIdType.MESH).wait_recv()

    for s in sends:
        s.wait_send()
    wait_recv(rows_c, pl.ds(0, hx), FROM_LEFT)
    wait_recv(rows_c, pl.ds(hx + w, hx), FROM_RIGHT)

    @pl.when(up_ok)
    def _():
        wait_recv(pl.ds(0, hy), cols_c, FROM_ABOVE)
        wait_recv(pl.ds(0, hy), pl.ds(0, hx), FROM_TL)
        wait_recv(pl.ds(0, hy), pl.ds(hx + w, hx), FROM_TR)

    @pl.when(dn_ok)
    def _():
        wait_recv(pl.ds(hy + h, hy), cols_c, FROM_BELOW)
        wait_recv(pl.ds(hy + h, hy), pl.ds(0, hx), FROM_BL)
        wait_recv(pl.ds(hy + h, hy), pl.ds(hx + w, hx), FROM_BR)

    loc.wait()


def halo_strips_dma(local, hy: int, hx: int, *, axis_y: str = "y",
                    axis_x: str = "x", collective_id: int = 7,
                    interpret=False):
    """Raw exchanged block (h+2hy, w+2hx) — halos filled by neighbor DMA,
    global-lat-edge halos left as whatever the out buffer holds (the
    caller masks them).  Must run inside shard_map over (axis_y, axis_x).
    """
    h, w = local.shape
    grid_kernel = functools.partial(_kernel, h=h, w=w, hy=hy, hx=hx,
                                    axis_y=axis_y, axis_x=axis_x)
    return pl.pallas_call(
        grid_kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((h + 2 * hy, w + 2 * hx),
                                       local.dtype),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
        interpret=interpret,
    )(jnp.asarray(local))


def halo_exchange_dma(local, hy: int, hx: int, *, lat_fill: str = "clamp",
                      exact_lon: bool = True, axis_y: str = "y",
                      axis_x: str = "x", interpret=False,
                      collective_id: int = 7):
    """Drop-in equivalent of ``parallel.halo.halo_pad`` built on the remote
    DMA kernel: exchange + global-lat-edge fill + quirky-lon seam patches.
    Accepts an optional leading channel axis like ``halo_pad`` does — as
    one kernel launch (barrier round + 8 DMAs) PER channel, each with its
    OWN ``collective_id``: chained launches sharing one id would let a
    fast device's next-launch barrier signals alias a slow device's
    current-launch waits, weakening the entry barrier that protects
    neighbors' out buffers (interpret-mode tests cannot surface this).
    A multi-channel workload that is launch-bound should stack channels
    into one 2-D block or use the ppermute path instead.
    """
    from ...parallel.halo import quirky_seam_patch

    if local.ndim == 3:
        return jnp.stack([
            halo_exchange_dma(local[c], hy, hx, lat_fill=lat_fill,
                              exact_lon=exact_lon, axis_y=axis_y,
                              axis_x=axis_x, interpret=interpret,
                              collective_id=collective_id + c)
            for c in range(local.shape[0])])
    h, w = local.shape
    out = halo_strips_dma(local, hy, hx, axis_y=axis_y, axis_x=axis_x,
                          interpret=interpret, collective_id=collective_id)
    if hy:
        y_idx = lax.axis_index(axis_y)
        ny = lax.axis_size(axis_y)
        mid = out[hy:hy + h, :]
        if lat_fill == "clamp":
            top_fill = jnp.repeat(mid[:1, :], hy, axis=0)
            bot_fill = jnp.repeat(mid[-1:, :], hy, axis=0)
        elif lat_fill == "zero":
            top_fill = jnp.zeros((hy, w + 2 * hx), out.dtype)
            bot_fill = top_fill
        else:
            raise ValueError(lat_fill)
        top = jnp.where(y_idx == 0, top_fill, out[:hy, :])
        bot = jnp.where(y_idx == ny - 1, bot_fill, out[hy + h:, :])
        out = jnp.concatenate([top, mid, bot], axis=0)
    if hx and exact_lon:
        out = quirky_seam_patch(out, hx, w, axis_x=axis_x)
    return out
