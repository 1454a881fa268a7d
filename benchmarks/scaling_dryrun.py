"""Multi-chip sharding validation on a virtual device mesh.

Real multi-chip hardware is unavailable in this environment (one v5e chip
behind a tunnel), so this validates the BASELINE.json configs 4/5
*functionally*: the batched filter step compiles and executes over a
data x state mesh with the covariance actually partitioned (inspected via
the output shardings), on 8 virtual CPU devices.  Wall-clock numbers on
virtual devices are meaningless and deliberately not reported; the real
scaling bench is `parallel.batched.scaling_efficiency_probe` on a pod
slice.

Run: python benchmarks/scaling_dryrun.py  (forces the CPU backend)
"""
from __future__ import annotations

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from ekf_vio_tpu.config import VIOConfig  # noqa: E402
from ekf_vio_tpu.parallel import batched, mesh as mesh_mod  # noqa: E402


def main():
    report = {"devices": len(jax.devices()), "backend": "cpu (virtual mesh)"}
    for n_data, n_state in ((8, 1), (4, 2), (2, 4), (1, 8)):
        mesh = mesh_mod.make_mesh(n_data, n_state)
        cfg = VIOConfig(max_features=mesh_mod.aligned_capacity(256, n_state))
        state = batched.init_batched_state(cfg, batch=2 * n_data)
        state = jax.device_put(
            state, mesh_mod.filter_state_shardings(mesh, True))
        z = state.feat_mu[:, :, :2] + 0.01
        step = batched.make_batched_filter_step(cfg, mesh)
        out = step(state, z, jnp.float32(0.05))
        jax.block_until_ready(out)
        # the covariance really is partitioned along 'state'
        shards_per_sigma = len(out.Sigma.sharding.device_set)
        nan_free = not bool(jnp.any(jnp.isnan(out.Sigma)))
        report[f"mesh_{n_data}x{n_state}"] = {
            "state_dim": cfg.state_dim,
            "sigma_devices": shards_per_sigma,
            "nan_free": nan_free,
        }
        assert nan_free
        assert shards_per_sigma == n_data * n_state

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scaling_dryrun.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
