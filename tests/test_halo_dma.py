"""The remote-DMA halo exchange kernel vs the ppermute exchange.

Runs the ``make_async_remote_copy`` kernel on the virtual CPU mesh under
``pltpu.InterpretParams`` (which models cross-device DMAs) and checks it
reproduces ``parallel.halo.halo_pad`` bit-for-bit, including corner
blocks, bounded-lat fills, and the quirky-lon seam patches.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from seabreeze_param_tpu.ops.pallas.halo_kernel import halo_exchange_dma
from seabreeze_param_tpu.parallel.halo import halo_pad
from seabreeze_param_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8), (8, 1)])
@pytest.mark.parametrize("lat_fill,exact_lon", [("clamp", True),
                                                ("clamp", False),
                                                ("zero", False)])
def test_dma_exchange_matches_ppermute(mesh_shape, lat_fill, exact_lon):
    mesh = make_mesh(mesh_shape)
    py, px = mesh_shape
    h, w = 48 // py * py // py, 64 // px
    nlat, nlon = h * py, w * px
    hy = hx = 3
    if hy > h or hx > w:
        pytest.skip("halo wider than shard")
    rng = np.random.default_rng(5)
    field = rng.standard_normal((nlat, nlon)).astype(np.float32)

    def ref_fn(x):
        return halo_pad(x, hy, hx, lat_fill=lat_fill, exact_lon=exact_lon)

    def dma_fn(x):
        return halo_exchange_dma(x, hy, hx, lat_fill=lat_fill,
                                 exact_lon=exact_lon,
                                 interpret=pltpu.InterpretParams())

    spec = P("y", "x")
    pad_spec = P("y", "x")
    run_ref = jax.jit(jax.shard_map(ref_fn, mesh=mesh, in_specs=spec,
                                    out_specs=pad_spec, check_vma=False))
    run_dma = jax.jit(jax.shard_map(dma_fn, mesh=mesh, in_specs=spec,
                                    out_specs=pad_spec, check_vma=False))
    ref = np.asarray(run_ref(field))
    got = np.asarray(run_dma(field))
    np.testing.assert_array_equal(got, ref)
