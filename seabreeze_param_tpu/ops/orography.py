"""Sub-grid-orography sigmoid weighting.

Equivalent of ``sigmoid`` (``seabreeze_diag_python.f90:287-311``; duplicated
at ``generic/sea_breeze_diag.f90:457-481`` and ``UM/...F90:603-627``): a
logistic weight built from global statistics of the sub-grid orography
standard-deviation field,

    mean = sum(std) / N
    var  = sum((std - mean)^2)          # the reference accumulates this in a
                                        # racy OpenMP loop with no reduction
                                        # clause — benign by luck; here it is
                                        # a deterministic reduction
    s    = 2 / sqrt(var / N)
    r    = (max(std) - min(std)) / 4
    w    = 1 / (1 + exp(-s * (std - r)))

In the decomposed (sharded) setting the four statistics are global
reductions; ``axis_names`` makes the same function correct inside
``shard_map`` by inserting psum/pmax/pmin over the mesh axes (the
reference's UM variant simply computes them on the full global field).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def sigmoid_weight(std_field, *, axis_names: tuple[str, ...] = (),
                   valid_mask=None):
    """``valid_mask`` excludes replication-padding cells (sharded grids whose
    lat extent was padded to a shard multiple) from the global statistics."""
    a = jnp.asarray(std_field, jnp.float32)
    if valid_mask is None:
        n = jnp.float32(a.size)
        total = jnp.sum(a)
        amax = jnp.max(a)
        amin = jnp.min(a)
        sq = lambda mean: jnp.sum((a - mean) ** 2)
    else:
        vm = jnp.broadcast_to(jnp.asarray(valid_mask), a.shape)
        n = jnp.sum(vm.astype(jnp.float32))
        total = jnp.sum(jnp.where(vm, a, 0.0))
        amax = jnp.max(jnp.where(vm, a, -jnp.inf))
        amin = jnp.min(jnp.where(vm, a, jnp.inf))
        sq = lambda mean: jnp.sum(jnp.where(vm, (a - mean) ** 2, 0.0))
    if axis_names:
        total = jax.lax.psum(total, axis_names)
        n = jax.lax.psum(n, axis_names) if valid_mask is not None else (
            n * np.prod([jax.lax.axis_size(ax) for ax in axis_names]))
        amax = jax.lax.pmax(amax, axis_names)
        amin = jax.lax.pmin(amin, axis_names)
    mean = total / n
    var = sq(mean)
    if axis_names:
        var = jax.lax.psum(var, axis_names)
    s = jnp.float32(2.0) / jnp.sqrt(var / n)
    r = (amax - amin) / jnp.float32(4.0)
    return jnp.float32(1.0) / (jnp.float32(1.0) + jnp.exp(-s * (a - r)))
