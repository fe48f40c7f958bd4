"""Worker process for tests/test_multihost.py::test_cli_driver_two_process.

Run as ``python tests/multihost_cli_worker.py <process_id> <port> <conf>``.
Two such processes (4 virtual CPU devices each) drive the PRODUCTION batch
driver ``cli.run.main`` end-to-end over the JAX distributed runtime: the
driver itself calls ``parallel.distributed.initialize`` (env-driven),
``api.diag`` routes through the global-mesh ``DistributedRunner``, and only
process 0 writes the netCDF outputs.  Prints ``MULTIHOST-CLI-OK`` on
success; the parent test compares process 0's files against a
single-process reference run.

Standalone on purpose: must NOT import tests.conftest (which pins 8
devices in one process).
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    conf = sys.argv[3]
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    expect_written = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the driver's distributed.initialize() picks these up — the cloud-pod
    # autodetection path, exercised via env vars
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    from seabreeze_param_tpu.cli.run import main as run_main

    kw = {"ckpt_dir": ckpt_dir} if ckpt_dir else {}
    tt, thc, ws, wd, written = run_main(conf, progress=None, **kw)

    import jax
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    if pid == 0:
        assert len(written) == expect_written, written   # primary writes
    else:
        assert written == [], written          # secondary wrote nothing
    # the returned global state is identical on every process
    import numpy as np
    assert np.asarray(thc).shape[-2:] == np.asarray(ws).shape[-2:]
    print(f"MULTIHOST-CLI-OK {pid} tt={tt}", flush=True)


if __name__ == "__main__":
    main()
