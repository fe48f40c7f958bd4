"""The C++ oracle (native/oracle.cc) must agree with the loop-faithful
NumPy oracle — the semantic spec — so the larger golden fixtures can use
the ~1000x faster native one."""
import numpy as np
import pytest

from tests.golden import native_oracle as no
from tests.golden import reference_numpy as rn

F = np.float32

pytestmark = pytest.mark.skipif(not no.available(),
                                reason="native toolchain unavailable")


def test_native_matches_numpy_oracle(small_case):
    c = small_case
    nsteps = 2
    got = no.native_diag_sequence(nsteps, c["p"], c["z"], c["std"],
                                  c["theta_t"], c["v_t"], c["u_t"], c["lsm"],
                                  c["ci_t"], c["lon"], c["lat"])
    ref = rn.golden_diag_sequence(nsteps, c["p"], c["z"], c["std"],
                                  c["theta_t"], c["v_t"], c["u_t"], c["lsm"],
                                  c["ci_t"], c["lon"], c["lat"])
    # edges/dist/ring accumulations are same-order float32 -> exact;
    # sigmoid uses a double accumulator vs numpy pairwise -> tiny jitter.
    for s, name in enumerate(("sb_con", "t0", "windspeed", "winddir")):
        ok = np.isclose(got[s], ref[s], rtol=1e-5, atol=1e-4)
        assert ok.mean() > 0.9999, (name, (~ok).sum())


def test_native_components_match(small_case):
    c = small_case
    coast_n = no.native_get_edges(c["lsm"], c["ci_t"][0])
    coast_r = rn.golden_get_edges(c["lsm"], c["ci_t"][0])
    np.testing.assert_array_equal(coast_n, coast_r)

    d_n = no.native_get_dist(coast_n, c["lsm"], c["lon"], c["lat"])
    d_r = rn.golden_get_dist(coast_r, c["lsm"], c["lon"], c["lat"])
    # glibc sinf/cosf/atan2f differ from numpy's float32 routines by ~1 ulp
    np.testing.assert_allclose(d_n, d_r, rtol=1e-6, atol=1e-4)

    s_n = no.native_sigmoid(c["std"])
    s_r = rn.golden_sigmoid(c["std"])
    np.testing.assert_allclose(s_n, s_r, rtol=1e-6, atol=1e-6)
