#!/usr/bin/env python
"""End-to-end production-driver check on the CURRENT backend: run the
batch driver (config -> read_nc -> api.diag -> CF netCDF) twice over one
synthetic series — forced pure-XLA vs the auto production path (fused
Pallas on TPU) — and require identical outputs.  The on-silicon e2e
counterpart of tests/test_io.py::test_batch_driver_end_to_end.
Prints DRIVER-TPU-E2E OK on success."""
import sys, pathlib, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np

# Build one synthetic dataset; run the driver twice from separate copies of
# the config dir: once forced XLA-on-CPU semantics (use_pallas=False) and
# once on the TPU production path (auto use_pallas=True), then compare the
# written netCDF outputs.
from tests.test_io import _build_synthetic_run
from seabreeze_param_tpu.io import Dataset

root1 = pathlib.Path(tempfile.mkdtemp())
root2 = pathlib.Path(tempfile.mkdtemp())
s1 = _build_synthetic_run(root1, nlat=160, nlon=288, nt=4)
s2 = _build_synthetic_run(root2, nlat=160, nlon=288, nt=4)

from seabreeze_param_tpu.cli.run import main
import jax
print("backend:", jax.default_backend())

ref = main(str(s1["conf"]), progress=None, use_pallas=False)
got = main(str(s2["conf"]), progress=None)          # auto: pallas on TPU
assert ref[0] == got[0] == 9, (ref[0], got[0])
np.testing.assert_allclose(got[1], ref[1], rtol=1e-5, atol=1e-4)

for fr, fg in zip(ref[4], got[4]):
    with Dataset(fr) as a, Dataset(fg) as b:
        for var in ("sb_con", "thc"):
            x = np.ma.getdata(a.variables[var][:])
            y = np.ma.getdata(b.variables[var][:])
            miss = x >= 1e19
            np.testing.assert_array_equal(y >= 1e19, miss, err_msg=var)
            mism = ~np.isclose(y[~miss], x[~miss], rtol=1e-5, atol=1e-4)
            assert mism.mean() < 1e-3, f"{var}: {mism.sum()}/{mism.size}"
print("DRIVER-TPU-E2E OK: pallas production output == XLA output on",
      jax.default_backend(), flush=True)
