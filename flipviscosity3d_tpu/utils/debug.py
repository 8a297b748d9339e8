"""Debug and invariant-checking aids.

The reference's FLUIDSIM_ASSERT (fluidsimassert.h:24-40) aborts on invariant
violation and compiles out under NFLUIDSIMDEBUG. Under JAX's functional
model the analogues are NaN trapping, jit bypass for pdb-ability, and
post-step state validation on the host.
"""

from __future__ import annotations

import numpy as np
import jax


def enable_debug(nan_checks: bool = True, disable_jit: bool = False) -> None:
    """Turn on jax-level debugging (the FLUIDSIM_ASSERT build analogue)."""
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def validate_state(state, cfg) -> list[str]:
    """Host-side invariant checks on a SimState; returns violation strings
    (empty list = healthy). Mirrors the reference's runtime domain and index
    range assertions (fluidsimulation.cpp:48-49,67-68,
    particlelevelset.cpp:45,55)."""
    problems = []
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    ext = np.array([cfg.isize, cfg.jsize, cfg.ksize]) * cfg.dx
    if not np.isfinite(pos).all():
        problems.append("non-finite particle positions")
    if not np.isfinite(vel).all():
        problems.append("non-finite particle velocities")
    if (pos < 0).any() or (pos >= ext).any():
        problems.append("particles outside the domain box")
    for name in ("u", "v", "w"):
        g = np.asarray(getattr(state, name))
        if not np.isfinite(g).all():
            problems.append(f"non-finite {name} velocity grid")
    return problems
