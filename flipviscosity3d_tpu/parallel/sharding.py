"""Multi-chip domain decomposition helpers.

The reference is single-process/single-threaded (SURVEY.md §2); scaling past
one chip is a new first-class capability here. Round-1 design: pjit with
NamedSharding domain decomposition — grids split along the first axis whose
extent divides the mesh, particle arrays split by index, everything else
replicated. XLA SPMD partitions the shifted-slice stencils into halo
exchanges and the bucketing sort/scatter into collective-backed equivalents
automatically. (shard_map halo pipelines and owner-based particle migration
are the planned upgrade; see docs/DESIGN.md.)

Validated two ways: tests/test_sharding.py checks the sharded step matches
the single-device step on a forced 8-device CPU mesh, and
__graft_entry__.dryrun_multichip runs one full frame under the sharding.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..core.state import SimState, SolidBoundary


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
        if len(devices) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devices)}"
            )
    return Mesh(np.array(devices), (axis,))


def grid_sharding(mesh: Mesh, shape, axis: str = "x") -> NamedSharding:
    """Shard a 3D grid along the first axis divisible by the mesh; staggered
    +1 extents that don't divide fall back to replication (their halo data
    rides the automatic SPMD exchanges of the cell-aligned arrays)."""
    n = mesh.shape[axis]
    for ax in range(3):
        if shape[ax] % n == 0:
            spec = [None, None, None]
            spec[ax] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, cfg: SimConfig, axis: str = "x") -> SimState:
    """A SimState-shaped pytree of NamedShardings for jit in/out_shardings."""
    rep = NamedSharding(mesh, P())
    parts = NamedSharding(mesh, P(axis, None))

    def g(shape):
        return grid_sharding(mesh, shape, axis)

    return SimState(
        pos=parts,
        vel=parts,
        u=g(cfg.u_shape),
        v=g(cfg.v_shape),
        w=g(cfg.w_shape),
        solid=SolidBoundary(
            phi=rep,
            center_phi=g(cfg.grid_shape),
            weight_u=g(cfg.u_shape),
            weight_v=g(cfg.v_shape),
            weight_w=g(cfg.w_shape),
            solid_u=g(cfg.u_shape),
            solid_v=g(cfg.v_shape),
            solid_w=g(cfg.w_shape),
        ),
        viscosity=rep,
        gravity=rep,
    )


def shard_state(state: SimState, mesh: Mesh, cfg: SimConfig,
                axis: str = "x") -> tuple[SimState, SimState]:
    """device_put the state under the standard decomposition; returns
    (sharded_state, shardings)."""
    sh = state_shardings(mesh, cfg, axis)
    return jax.device_put(state, sh), sh
