"""Persistent trigger state as an explicit pytree.

The reference threads a state triple ``(thc, windspeed, winddir)`` plus the
timestep counter ``tt`` through every call
(``python_wrapper/seabreezediag/__init__.py:244-245, 260-261``;
``test_run.py:39-49`` threads it across monthly files).  Checkpoint/resume in
the reference is exactly "re-enter diag with the saved triple" (SURVEY §5.4).

Here the state is a registered pytree dataclass so it can be scanned over,
donated to the jitted step, sharded on a mesh, and checkpointed with orbax.

Reference quirk, preserved deliberately: the Python wrapper assigns
``thc = out[1]`` (``__init__.py:244``), but the Fortran output slot 2 is the
sea-level temperature ``t0`` (``seabreeze_diag_python.f90:278``), *not* the
kernel-internal thermal heating contrast — and the Fortran kernel never reads
its ``thc`` input (it only writes it).  So the threaded "thc" state is
carried for API parity (and because downstream tooling plots it as sea-level
temperature, ``plot.py:97-99``) but does not influence the numerics.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TriggerState:
    """State threaded between timesteps.

    tt  : () int32 — timestep counter, 1-based like the reference.
    thc : (nlat, nlon) f32 — the threaded "thermal heating contrast" slot,
          which by reference convention holds last step's sea-level
          temperature t0 (see module docstring).
    windspeed : (nlat, nlon) f32 — wind speed at the target pressure level,
          updated every ``target_time`` hours (seabreeze_diag_python.f90:271-274).
    winddir : (nlat, nlon) f32 — wind direction in degrees, same cadence.
    """

    tt: jax.Array
    thc: jax.Array
    windspeed: jax.Array
    winddir: jax.Array

    @staticmethod
    def zeros(shape: tuple[int, int], tt: int = 1) -> "TriggerState":
        """Cold-start state: zeros, tt=1 (test_run.py:13-17)."""
        # Three distinct buffers — sharing one zeros array would make
        # donation of the state pytree donate the same buffer three times.
        return TriggerState(tt=jnp.asarray(tt, jnp.int32),
                            thc=jnp.zeros(shape, jnp.float32),
                            windspeed=jnp.zeros(shape, jnp.float32),
                            winddir=jnp.zeros(shape, jnp.float32))

    @property
    def shape(self):
        return self.thc.shape
