"""Checkpoint / resume for the VO state.

The reference has no checkpointing at all (SURVEY.md §5): a crash loses the
map and the pose; only the append-only trajectory file survives.  Here the
whole :class:`~stereo_semantic_vo_tpu.engine.state.VOState` is a pytree of
arrays, so checkpointing is a flat .npz save/load — resume continues
tracking mid-sequence with the sliding-window map intact.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from stereo_semantic_vo_tpu.engine.state import VOState


def save_state(path: str, state: VOState) -> None:
    flat = {f"f{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(state))}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_state(path: str, template: VOState) -> VOState:
    import jax.numpy as jnp

    with np.load(path) as data:
        leaves = [jnp.asarray(data[f"f{i}"]) for i in range(len(jax.tree.leaves(template)))]
    return jax.tree.unflatten(jax.tree.structure(template), leaves)
