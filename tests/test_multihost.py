"""Multi-process jax.distributed CPU test (SURVEY §4d prescription).

Two OS processes x 4 virtual CPU devices form a hierarchical (dcn=2,
ici=4) mesh; the full fleet step runs replica-sharded across both
processes and its fleet-statistics reduction crosses the process
boundary (gloo CPU collectives).  This is the standard JAX substitute
for real multi-host hardware, which this rig does not have.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_fleet_step():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    nproc = 2

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU plugin out
    env.pop("XLA_FLAGS", None)             # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), coord],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        kv = dict(tok.split("=", 1) for tok in line.split()[1:])
        results[int(kv["pid"])] = kv
    assert set(results) == {0, 1}

    # Matching ran across the distributed mesh...
    m0, m1 = (float(results[i]["matched"]) for i in (0, 1))
    assert m0 > 0.0
    # ...and both processes hold the SAME reduced fleet statistics — the
    # reduction genuinely crossed the process boundary.
    assert m0 == pytest.approx(m1, abs=1e-3)
    p0 = np.array([float(x) for x in results[0]["pos"].split(",")])
    p1 = np.array([float(x) for x in results[1]["pos"].split(",")])
    np.testing.assert_allclose(p0, p1, atol=1e-5)
    assert float(results[0]["spread"]) >= 0.0


def test_cli_multihost_sweep():
    """The CLI-level multihost path (`sweep --coordinator`): the round-3
    advisor found _setup_compile_cache() initialized all backends before
    jax.distributed.initialize could run, breaking every --coordinator
    invocation.  This drives the actual CLI in 2 processes end-to-end."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    nproc = 2

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env["LEGKILO_CACHE_DIR"] = ""          # keep the cache dir out of it

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "legkilo_tpu", "sweep",
             "--duration", "1.2", "--replicas", "8",
             "--coordinator", coord, "--num_processes", str(nproc),
             "--process_id", str(i)],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"cli multihost failed:\n{err[-3000:]}"
        outs.append(out)

    # Only process 0 prints the report.
    lines = [l for o in outs for l in o.splitlines() if l.startswith("{")]
    assert lines, "no JSON report from the multihost sweep"
    report = json.loads(lines[-1])
    assert report["processes"] == 2
    assert report["devices"] == 8
    assert report["replicas"] == 8
    assert np.isfinite(report["final_spread_m"])
