"""Checkpoint / resume for filter and engine state.

The reference has no persistence of any kind — filter state lives only in
RAM (SURVEY.md §5 "Checkpoint/resume: absent").  Here the whole
``FilterState`` is a pytree, so persistence is flatten → npz and resume is
the inverse; an orbax-backed variant is provided for async checkpointing
of long batched runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ekf_vio_tpu.core.state import FilterState


def save_npz(path: str, state: FilterState) -> None:
    leaves, treedef = jax.tree.flatten(state)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_npz(path: str) -> FilterState:
    with np.load(path) as z:
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(z.files) - 1)]
    # FilterState field order is fixed by its dataclass registration
    return FilterState(*leaves)


def save_orbax(path: str, state) -> None:
    """Async-capable checkpoint of any pytree via orbax (multi-host safe)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_orbax(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
