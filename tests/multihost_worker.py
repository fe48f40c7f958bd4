"""Worker process for tests/test_multihost.py.

Run as ``python tests/multihost_worker.py <process_id> <port>``.  Two such
processes (4 virtual CPU devices each) form an 8-device global mesh over
the JAX distributed runtime (Gloo) — the CPU stand-in for a 2-host DCN
deployment.  Each process feeds ONLY its local row block via
``DistributedRunner`` and checks its local outputs against the full
single-device reference it computes independently.  Prints ``MULTIHOST-OK``
on success.

Standalone on purpose: must NOT import tests.conftest (which pins 8
devices in one process).
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import numpy as np
    from seabreeze_param_tpu.core.grid import Grid
    from seabreeze_param_tpu.core.state import TriggerState
    from seabreeze_param_tpu.models.pipeline import TriggerPipeline
    from seabreeze_param_tpu.parallel.distributed import (DistributedRunner,
                                                          make_multihost_mesh)
    from seabreeze_param_tpu.parallel.sharded import ShardedPipeline

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    # --- deterministic synthetic world (both processes build the same) ---
    F = np.float32
    nlat, nlon, nlev, nt = 64, 64, 4, 2
    lat = np.linspace(7.0, -24.5, nlat).astype(F)
    lon = np.linspace(100.0, 132.0, nlon, endpoint=False).astype(F)
    rng = np.random.default_rng(42)
    y, x = np.mgrid[0:nlat, 0:nlon]
    coastx = 0.55 * nlon + 0.08 * nlon * np.sin(2 * np.pi * y / nlat * 2.3)
    land = (x > coastx).astype(F)
    lsm = (land * (0.6 + 0.4 * rng.random((nlat, nlon)))).astype(F)
    z = (800.0 * lsm * rng.random((nlat, nlon))).astype(F)
    std = (120.0 * lsm * rng.random((nlat, nlon))).astype(F)
    p = np.array([100000.0, 92500.0, 85000.0, 70000.0], F)[:nlev]
    theta = (288.0 + 8.0 * rng.standard_normal((nt, nlat, nlon))).astype(F)
    u = (6.0 * rng.standard_normal((nt, nlev, nlat, nlon))).astype(F)
    v = (6.0 * rng.standard_normal((nt, nlev, nlat, nlon))).astype(F)
    ci = np.zeros((nt, nlat, nlon), F)
    ci[1:, :6, :] = 0.9

    grid = Grid(lon=lon, lat=lat)
    pipe = TriggerPipeline(grid)

    # full single-device reference, computed independently in this process
    # (the devices are virtual CPU; this uses device 0 only)
    ref_state, ref_out = pipe.run(TriggerState.zeros((nlat, nlon)),
                                  theta, u, v, lsm, z, std, p, ci_t=ci)

    mesh = make_multihost_mesh()            # (4, 2): y split across procs
    assert mesh.shape["y"] == 4 and mesh.shape["x"] == 2
    sp = ShardedPipeline(pipe, mesh)
    assert sp.overlap, "expected the overlapped step structure"
    runner = DistributedRunner(sp)
    lo = runner.row_lo
    hi = min(runner.row_hi, sp.nlat_real)

    def slab(a):
        return np.asarray(a)[..., lo:hi, :]

    state0 = TriggerState.zeros((nlat, nlon))
    final, outs = runner.run(
        TriggerState(tt=state0.tt, thc=slab(state0.thc),
                     windspeed=slab(state0.windspeed),
                     winddir=slab(state0.winddir)),
        slab(theta), slab(u), slab(v), slab(lsm), slab(z), slab(std), p,
        ci_t=slab(ci))

    for key in ("sb_con", "t0", "windspeed", "winddir"):
        g = np.asarray(outs[key])
        r = slab(ref_out[key])
        assert g.shape == r.shape, (key, g.shape, r.shape)
        miss = r == np.float32(2.0e20)
        np.testing.assert_array_equal(g == np.float32(2.0e20), miss,
                                      err_msg=key)
        sel = ~miss
        mism = ~np.isclose(g[sel], r[sel], rtol=1e-5, atol=1e-4)
        assert mism.mean() < 1e-3, f"{key}: {mism.sum()}/{mism.size}"
    np.testing.assert_allclose(np.asarray(final.thc),
                               slab(ref_state.thc), rtol=1e-6, atol=1e-5)
    assert int(np.asarray(final.tt)) == int(ref_state.tt)
    print(f"MULTIHOST-OK {pid}", flush=True)


if __name__ == "__main__":
    main()
