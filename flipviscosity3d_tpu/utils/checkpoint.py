"""Checkpoint / resume.

The reference has no restartable state (exported per-frame particle meshes
drop velocities and grids, /root/reference/src/main.cpp:14-40). Here the
whole simulation is one SimState pytree, so exact resume is a flat
save/restore of its leaves.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.state import SimState

_SEP = "."


def _flatten(state: SimState) -> dict[str, np.ndarray]:
    flat = {}

    def rec(prefix, node):
        if hasattr(node, "_fields"):  # NamedTuple
            for name in node._fields:
                rec(prefix + _SEP + name if prefix else name,
                    getattr(node, name))
        else:
            flat[prefix] = np.asarray(node)

    rec("", state)
    return flat


def save_state(path: str, state: SimState) -> None:
    """Write an exact-resume checkpoint (npz of all pytree leaves)."""
    np.savez_compressed(path, **_flatten(state))


def load_state(path: str) -> SimState:
    """Restore a SimState saved by save_state."""
    from ..core.state import SolidBoundary

    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}

    def build(cls, prefix):
        kwargs = {}
        for name in cls._fields:
            key = prefix + _SEP + name if prefix else name
            if key in flat:
                kwargs[name] = jnp.asarray(flat[key])
            else:
                sub_prefix = key
                kwargs[name] = build(SolidBoundary, sub_prefix)
        return cls(**kwargs)

    return build(SimState, "")
