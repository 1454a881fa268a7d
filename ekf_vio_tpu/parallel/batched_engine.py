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


# Most-efficient per-chip lane count, measured (benchmarks/
# batch_scaling.json): per-lane step time falls until B=16, then RISES —
# at B=64 XLA's layout assignment starts materializing batch-minor
# transposes of the per-lane pyramids and the tracker's working set spills
# double-buffering.  Larger batches therefore run as sequential
# micro-batches of this size (standard serving practice), which keeps the
# aggregate curve monotone at the B=16 per-lane rate.
MICROBATCH = 16


@partial(jax.jit, static_argnames=("cfg", "cam"))
def _run_microbatch(images, times, cfg: VIOConfig, cam):
    return jax.vmap(lambda im, t: engine.run_sequence(im, t, cfg, cam))(
        images, times)


def run_sequences_batched(images, times, cfg: VIOConfig, cam,
                          microbatch: int = MICROBATCH):
    """images: [B, T, H, W]; times: [B, T].  Returns per-sequence final
    EngineStates and stacked StepOutputs, batch-leading.

    Batches larger than ``microbatch`` are split into sequential chunks
    (each fully device-parallel); the results are concatenated on the
    batch axis.  Chunks are dispatched back-to-back without host syncs in
    between, so the pipeline stays full."""
    b = images.shape[0]
    if b <= microbatch or b % microbatch:
        return _run_microbatch(images, times, cfg, cam)
    outs = [
        _run_microbatch(images[i:i + microbatch], times[i:i + microbatch],
                        cfg, cam)
        for i in range(0, b, microbatch)
    ]
    return jax.tree.map(lambda *xs: jax.numpy.concatenate(xs, 0), *outs)


def run_sequences_sharded(images, times, cfg: VIOConfig, cam, mesh: Mesh):
    """Same, with the batch axis sharded over the mesh's ``data`` axis —
    each device (group) runs its own sequences; zero collectives on the
    steady-state path."""
    sh = NamedSharding(mesh, P("data"))
    images = jax.device_put(images, NamedSharding(mesh, P("data", None, None, None)))
    times = jax.device_put(times, NamedSharding(mesh, P("data", None)))
    return run_sequences_batched(images, times, cfg, cam)
