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

import jax
import jax.numpy as jnp


def sigmoid_weight(std_field, *, axis_names: tuple[str, ...] = ()):
    a = jnp.asarray(std_field, jnp.float32)
    n = a.size
    total = jnp.sum(a)
    amax = jnp.max(a)
    amin = jnp.min(a)
    if axis_names:
        total = jax.lax.psum(total, axis_names)
        for ax in axis_names:
            n = n * jax.lax.axis_size(ax)
        amax = jax.lax.pmax(amax, axis_names)
        amin = jax.lax.pmin(amin, axis_names)
    mean = total / jnp.float32(n)
    var = jnp.sum((a - mean) ** 2)
    if axis_names:
        var = jax.lax.psum(var, axis_names)
    s = jnp.float32(2.0) / jnp.sqrt(var / jnp.float32(n))
    r = (amax - amin) / jnp.float32(4.0)
    return jnp.float32(1.0) / (jnp.float32(1.0) + jnp.exp(-s * (a - r)))
