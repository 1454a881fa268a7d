"""Batched multi-sequence VIO: many sequences data-parallel across chips.

BASELINE.json config 4 ("all EuRoC MH/V sequences data-parallel across
chips").  The whole per-sequence rollout (image front-end + filter) is a
pure scan, so a batch of sequences is literally ``vmap`` over it, and
distribution is a sharding annotation on the batch axis — the mesh's
``data`` axis.  No reference analog exists (one ROS node = one sequence).
"""
from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ekf_vio_tpu import engine
from ekf_vio_tpu.config import VIOConfig


@partial(jax.jit, static_argnames=("cfg", "cam"))
def run_sequences_batched(images, times, cfg: VIOConfig, cam):
    """images: [B, T, H, W]; times: [B, T].  Returns per-sequence final
    EngineStates and stacked StepOutputs, batch-leading."""
    return jax.vmap(lambda im, t: engine.run_sequence(im, t, cfg, cam))(
        images, times)


def run_sequences_sharded(images, times, cfg: VIOConfig, cam, mesh: Mesh):
    """Same, with the batch axis sharded over the mesh's ``data`` axis —
    each device (group) runs its own sequences; zero collectives on the
    steady-state path."""
    sh = NamedSharding(mesh, P("data"))
    images = jax.device_put(images, NamedSharding(mesh, P("data", None, None, None)))
    times = jax.device_put(times, NamedSharding(mesh, P("data", None)))
    return run_sequences_batched(images, times, cfg, cam)
