"""Checkpoint / resume for the VO state.

The reference has no checkpointing at all (SURVEY.md §5): a crash loses the
map and the pose; only the append-only trajectory file survives.  Here the
whole :class:`~stereo_semantic_vo_tpu.engine.state.VOState` is a pytree of
arrays, so checkpointing is a flat .npz save/load — resume continues
tracking mid-sequence with the sliding-window map intact.

Entries are keyed by *field name* (plus a schema version), not position, so
adding or reordering VOState fields cannot silently load one field's array
into another; incompatible checkpoints fail with a clear error.
"""

from __future__ import annotations

import os

import numpy as np

from stereo_semantic_vo_tpu.engine.state import VOState

_SCHEMA_KEY = "__schema__"
_SCHEMA_VERSION = 2


def save_state(path: str, state: VOState) -> None:
    flat = {name: np.asarray(x) for name, x in state._asdict().items()}
    flat[_SCHEMA_KEY] = np.asarray(_SCHEMA_VERSION)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_state(path: str, template: VOState) -> VOState:
    import jax.numpy as jnp

    with np.load(path) as data:
        if _SCHEMA_KEY not in data:
            raise ValueError(
                f"{path}: positional (schema-v1) checkpoint from before VOState "
                "gained win_T_cw/win_uv/win_disp — incompatible; re-run and "
                "re-save, or load with the matching older release."
            )
        version = int(data[_SCHEMA_KEY])
        if version != _SCHEMA_VERSION:
            raise ValueError(
                f"{path}: checkpoint schema v{version}, expected v{_SCHEMA_VERSION}"
            )
        fields = template._asdict()
        missing = [k for k in fields if k not in data]
        if missing:
            raise ValueError(f"{path}: checkpoint is missing VOState fields {missing}")
        return VOState(**{k: jnp.asarray(data[k]) for k in fields})
