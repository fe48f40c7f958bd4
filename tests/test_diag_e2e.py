"""End-to-end parity: the public ``diag`` API and the jitted scan pipeline
vs the golden N-step state evolution (SURVEY §4c: golden allclose of N-step
state evolution is the acceptance gate)."""
import numpy as np
import pytest

from seabreeze_param_tpu.api import diag
from tests.golden.reference_numpy import F, golden_diag_sequence

MISSING = F(2.0e20)


def _compare_outputs(got_sb, ref, nlat):
    """Compare sb_con (slot 0) over computed rows; the last lat row is the
    reference's uninitialized-row quirk (zeros in both implementations)."""
    ref_sb = ref[0]
    got_sb = np.asarray(got_sb)
    assert got_sb.shape == ref_sb.shape
    miss_ref = ref_sb == MISSING
    miss_got = got_sb == MISSING
    # identical missing-value structure
    np.testing.assert_array_equal(miss_ref[:, :nlat - 1], miss_got[:, :nlat - 1])
    sel = (~miss_ref) & (np.arange(nlat)[None, :, None] < nlat - 1)
    mismatch = ~np.isclose(got_sb[sel], ref_sb[sel], rtol=5e-4, atol=5e-4)
    # Threshold rules are step functions: float32 reassociation may flip an
    # occasional borderline cell.  Demand bit-identical decisions on all but
    # a vanishing fraction and tight agreement elsewhere.
    assert mismatch.mean() < 2e-3, f"{mismatch.sum()} / {mismatch.size}"


@pytest.mark.parametrize("case", ["small_case", "global_case"])
def test_diag_matches_golden_sequence(case, request):
    c = request.getfixturevalue(case)
    nsteps = 2 if case == "global_case" else 4
    nlat = len(c["lat"])

    ref = golden_diag_sequence(nsteps, c["p"], c["z"], c["std"],
                               c["theta_t"], c["v_t"], c["u_t"], c["lsm"],
                               c["ci_t"], c["lon"], c["lat"])

    tt, sb_con, thc, ws, wd = diag(
        1, c["lsm"], c["z"], c["std"], c["lon"], c["lat"], c["p"],
        c["u_t"][:nsteps], c["v_t"][:nsteps], c["theta_t"][:nsteps],
        c["ci_t"][:nsteps])

    assert tt == 1 + nsteps
    _compare_outputs(sb_con, ref, nlat)
    # final threaded state vs golden slots 1..3 of the last step
    np.testing.assert_allclose(np.asarray(thc)[:-1], ref[1, -1][:-1],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ws)[:-1], ref[2, -1][:-1],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(wd)[:-1], ref[3, -1][:-1],
                               rtol=1e-3, atol=0.2)


def test_diag_single_timestep_and_state_threading(small_case):
    """Calling diag per-timestep with threaded state must equal one batched
    call — the reference's monthly-file driver contract (test_run.py:39-49)."""
    c = small_case
    nsteps = 3
    _, sb_batch, thc_b, ws_b, wd_b = diag(
        1, c["lsm"], c["z"], c["std"], c["lon"], c["lat"], c["p"],
        c["u_t"][:nsteps], c["v_t"][:nsteps], c["theta_t"][:nsteps],
        c["ci_t"][:nsteps])

    tt = 1
    thc = ws = wd = None
    sbs = []
    for ts in range(nsteps):
        kwargs = {}
        if ts > 0:
            kwargs = dict(thc=thc, ws=ws, wd=wd)
        tt, sb, thc, ws, wd = diag(
            tt, c["lsm"], c["z"], c["std"], c["lon"], c["lat"], c["p"],
            c["u_t"][ts], c["v_t"][ts], c["theta_t"][ts], c["ci_t"][ts],
            **kwargs)
        sbs.append(np.asarray(sb)[0])
    np.testing.assert_allclose(np.stack(sbs), np.asarray(sb_batch),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(thc, thc_b, rtol=1e-6, atol=1e-6)


def test_diag_warns_without_state(small_case):
    c = small_case
    with pytest.warns(UserWarning, match="previous timestep"):
        diag(5, c["lsm"], c["z"], c["std"], c["lon"], c["lat"], c["p"],
             c["u_t"][0], c["v_t"][0], c["theta_t"][0], c["ci_t"][0])


def test_diag_mesh_kwarg_matches_single(small_case):
    """The public API's device-mesh extension: diag(mesh=(2, 2)) must
    reproduce the single-device call (state and outputs), golden-gated by
    transitivity with test_diag_matches_golden_sequence."""
    c = small_case
    nsteps = 2
    args = (1, c["lsm"], c["z"], c["std"], c["lon"], c["lat"], c["p"],
            c["u_t"][:nsteps], c["v_t"][:nsteps], c["theta_t"][:nsteps],
            c["ci_t"][:nsteps])
    tt1, sb1, thc1, ws1, wd1 = diag(*args)
    # (2, 2): the small world's seam-driven ring radius (16) equals the
    # (2, 4) shard width, which the quirky-seam guard now rejects
    tt2, sb2, thc2, ws2, wd2 = diag(*args, mesh=(2, 2))
    assert tt1 == tt2
    sb1, sb2 = np.asarray(sb1), np.asarray(sb2)
    np.testing.assert_array_equal(sb1 == MISSING, sb2 == MISSING)
    sel = sb1 != MISSING
    mism = ~np.isclose(sb2[sel], sb1[sel], rtol=1e-5, atol=1e-4)
    assert mism.mean() < 1e-3
    np.testing.assert_allclose(np.asarray(thc2), np.asarray(thc1),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ws2), np.asarray(ws1),
                               rtol=1e-5, atol=1e-4)


def test_diag_shape_validation(small_case):
    """Mismatched inputs raise a clear ValueError naming the field (the
    reference relied on f2py -fbounds-check)."""
    import pytest
    c = small_case
    with pytest.raises(ValueError, match="theta: got"):
        diag(1, c["lsm"], c["z"], c["std"], c["lon"], c["lat"], c["p"],
             c["u_t"][:1], c["v_t"][:1], c["theta_t"][:1, :, :-2],
             c["ci_t"][:1])
    with pytest.raises(ValueError, match="ci: got"):
        diag(1, c["lsm"], c["z"], c["std"], c["lon"], c["lat"], c["p"],
             c["u_t"][:2], c["v_t"][:2], c["theta_t"][:2], c["ci_t"][:1])
