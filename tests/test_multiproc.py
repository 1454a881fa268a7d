"""Executed multi-process tests: a REAL 2-process jax.distributed cluster
on localhost CPU devices (gloo collectives) running the data-sharded
batched filter step.

This is the execution the reference never has (single-process ROS node,
SURVEY.md §2.2) and that rounds 1-2 only scaffolded: two OS processes
bootstrap through ``multihost.initialize_distributed``, build the
('data','state') pod mesh over 8 global devices, and run sharded compute
whose collectives cross the process boundary.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(pid, num_procs, port, devices, extra=()):
    env = dict(os.environ)
    env.update(
        EKF_VIO_COORDINATOR=f"localhost:{port}",
        EKF_VIO_NUM_PROCESSES=str(num_procs),
        EKF_VIO_PROCESS_ID=str(pid),
        EKF_VIO_PLATFORM="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={devices}",
    )
    # don't inherit the pytest conftest's platform forcing
    env.pop("JAX_PLATFORMS", None)
    script = os.path.join(REPO, "benchmarks", "multihost_scaling.py")
    return subprocess.Popen(
        [sys.executable, script, "--steps", "3", "--no-json", *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        cwd=REPO, text=True)


def _report_from(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("EKFVIO_REPORT "):
            return json.loads(line[len("EKFVIO_REPORT "):])
    raise AssertionError(f"no report line in: {out[-2000:]}")


def test_two_process_cluster_runs_sharded_filter_step():
    """2 processes x 4 CPU devices -> one 8-device cluster; the batched
    filter step runs sharded over `data` with cross-process collectives."""
    port = _free_port()
    p0 = _spawn(0, 2, port, 4)
    p1 = _spawn(1, 2, port, 4)
    out0, err0 = p0.communicate(timeout=540)
    out1, err1 = p1.communicate(timeout=540)
    assert p0.returncode == 0, f"proc0 failed:\n{err0[-3000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{err1[-3000:]}"

    rep = _report_from(out0)
    assert rep["process_count"] == 2
    assert rep["global_devices"] == 8
    assert rep["local_devices"] == 4
    assert rep["mesh"] == {"data": 8, "state": 1}
    assert rep["aggregate_steps_per_s"] > 0


def test_two_process_cluster_with_state_axis():
    """The Σ block partition coexists with multi-process data sharding:
    mesh ('data' across processes) x ('state' within a process)."""
    port = _free_port()
    extra = ("--n-state", "2", "--seqs-per-device", "1")
    p0 = _spawn(0, 2, port, 4, extra)
    p1 = _spawn(1, 2, port, 4, extra)
    out0, err0 = p0.communicate(timeout=540)
    out1, err1 = p1.communicate(timeout=540)
    assert p0.returncode == 0, f"proc0 failed:\n{err0[-3000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{err1[-3000:]}"

    rep = _report_from(out0)
    assert rep["process_count"] == 2
    assert rep["mesh"] == {"data": 4, "state": 2}
    assert rep["aggregate_steps_per_s"] > 0
