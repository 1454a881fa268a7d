"""Multi-host scaffolding: mesh construction / axis-placement logic.

Real multi-host can't run here; these tests pin the DCN×ICI layout rules
on the virtual 8-device mesh (single process) and with synthetic device
lists standing in for multiple hosts."""
import jax
import numpy as np
import pytest

from ekf_vio_tpu.parallel import multihost


def test_initialize_distributed_single_process():
    info = multihost.initialize_distributed()
    assert info["process_count"] == 1
    assert info["process_index"] == 0
    assert info["global_devices"] == len(jax.devices())


def test_make_pod_mesh_single_host():
    mesh = multihost.make_pod_mesh(n_state=2)
    assert mesh.axis_names == ("data", "state")
    assert mesh.shape == {"data": 4, "state": 2}


def test_make_pod_mesh_state_stays_within_host():
    """With 2 synthetic 'hosts' of 4 devices, every state-axis group must
    be a subset of one host's devices (ICI locality)."""
    devices = jax.devices()  # 8 virtual devices; first 4 = 'host 0'
    mesh = multihost.make_pod_mesh(n_state=2, devices=devices, n_hosts=2)
    assert mesh.shape == {"data": 4, "state": 2}
    arr = np.asarray(mesh.devices)
    host_of = {d: (0 if i < 4 else 1) for i, d in enumerate(devices)}
    for row in arr:  # each row is one state group
        hosts = {host_of[d] for d in row}
        assert len(hosts) == 1, "state group crosses the host (DCN) boundary"


def test_make_pod_mesh_data_spans_hosts():
    devices = jax.devices()
    mesh = multihost.make_pod_mesh(n_state=1, devices=devices, n_hosts=2)
    assert mesh.shape == {"data": 8, "state": 1}
    arr = np.asarray(mesh.devices).reshape(-1)
    assert set(arr) == set(devices)


def test_make_pod_mesh_validates_divisibility():
    devices = jax.devices()
    with pytest.raises(ValueError):
        multihost.make_pod_mesh(n_state=3, devices=devices, n_hosts=2)
    with pytest.raises(ValueError):
        multihost.make_pod_mesh(n_state=1, devices=devices, n_hosts=3)


def test_host_local_batch():
    assert multihost.host_local_batch(8) == 8  # single process
