"""Checkpoint/resume for cross-frame state.

The reference's only persistent state is its CSV side files (chan_est.csv,
radar_log.csv — SURVEY §5 'they *are* the checkpoint format'). Here the
feedback state is an explicit pytree (models/jrc_trx.JRCState), checkpointed
as npz snapshots — same restart semantics, structured format.
"""
from __future__ import annotations

import numpy as np


def save_state(path: str, state) -> None:
    """Save any pytree of arrays (e.g. JRCState) to an npz snapshot."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez_compressed(path, n_leaves=len(leaves), treedef=str(treedef), **arrays)


def load_state(path: str, like):
    """Load a snapshot into the structure of ``like`` (same pytree shape)."""
    import jax
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
