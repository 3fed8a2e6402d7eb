"""Checkpoint/resume for algorithm and tracker state (SURVEY §5).

The reference can persist only two things: the blob tracker's state
(``trackingMain.cpp:685-758``, ``savestate=``/``loadstate=`` via
CvFileStorage) and MultiLayerBGS's learned model
(``jmo/MultiLayerBGS.cpp:38-47,94-100``). Here *every* algorithm state is an
explicit pytree, so any model — all 37 BGS types, the tracker table, whole
multi-algorithm pipelines — checkpoints uniformly through orbax.

    save_state(path, state)
    state = load_state(path, like=algo.init(h, w, c))

``like`` restores exact shapes/dtypes (orbax needs the abstract tree).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: Any) -> None:
    """Persist a state pytree (any mix of jnp arrays / scalars)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, state, force=True)


def load_state(path: str, like: Optional[Any] = None) -> Any:
    """Restore a state pytree. Pass ``like`` (e.g. ``algo.init(h, w, c)``) to
    pin shapes/dtypes/structure; without it orbax restores as saved."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if like is None:
        return _checkpointer().restore(path)
    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(getattr(a, "shape", ()), a.dtype)
        if hasattr(a, "dtype")
        else a,
        like,
    )
    restored = _checkpointer().restore(
        path, args=ocp.args.PyTreeRestore(abstract)
    )
    # Explicit dtype cast: checkpoints written before a state-dtype change
    # (e.g. FGD's f32→f16 statistics planes) must load into the current
    # state dtype rather than silently mismatching it downstream.
    import jax.numpy as jnp

    def _cast(r, l):
        if hasattr(l, "dtype") and hasattr(r, "dtype") and r.dtype != l.dtype:
            return jnp.asarray(r, l.dtype)
        return r

    return jax.tree_util.tree_map(_cast, restored, like)
