"""Multi-chip domain decomposition helpers.

The reference is single-process/single-threaded (SURVEY.md §2); scaling past
one chip is a new first-class capability here. Design: pjit with
NamedSharding domain decomposition — EVERY 3D grid is sharded along the same
axis (i); the staggered +1 extents and the node-shaped grids (solid.phi,
viscosity) REPLICATE on this JAX version (NamedSharding requires divisible
dims — see grid_sharding below; the shard_map slab pipeline owns the fully
sharded uneven layout).
One consistent axis means every stencil's shifted-slice reads partition into
one-cell halo exchanges along i instead of cross-axis reshards; particle
arrays split by index. XLA SPMD inserts the collectives (see
scripts/dump_sharded_hlo.py for the audit of what it actually emits).

shard_map halo pipelines and owner-based particle migration are the explicit
upgrade path; see parallel/halo.py and docs/DESIGN.md.

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


def make_slab_mesh(n_hosts: int, chips_per_host: int,
                   axis: str = "slab") -> Mesh:
    """Multi-host (DCN) mesh for the slab pipeline (docs/DCN.md).

    One named axis spans both interconnects: devices are ordered
    HOST-MAJOR so slabs [h*C, (h+1)*C) land on host h, making every
    nearest-neighbor slab exchange an ICI hop except the n_hosts-1 host
    boundaries, which ride DCN. The slab pipeline's shard_map code needs
    NO changes — collective semantics are identical; only placement
    differs. On a real multi-host pod call jax.distributed.initialize()
    first; jax.devices() is already globally host-major there, and on the
    CPU test backend (xla_force_host_platform_device_count) the flat
    device list stands in for the pod."""
    n = n_hosts * chips_per_host
    devices = jax.devices()
    if len(devices) < n:
        raise RuntimeError(
            f"need {n} devices ({n_hosts} hosts x {chips_per_host}), "
            f"have {len(devices)}")
    grid = np.array(devices[:n]).reshape(n_hosts, chips_per_host)
    return Mesh(grid.reshape(-1), (axis,))


def grid_sharding(mesh: Mesh, shape, axis: str = "x") -> NamedSharding:
    """Every 3D grid shards along the SAME axis (i) so stencils become
    one-cell halo exchanges instead of cross-axis reshards. The staggered/
    node (I+1) extents cannot shard under pjit on this JAX version
    (NamedSharding requires divisible dims — verified: device_put raises for
    (17,16,16) over 8 devices), so those arrays replicate here; the
    shard_map pipeline (parallel/halo.py) owns the fully-sharded uneven
    layout."""
    n = mesh.shape[axis]
    if shape[0] % n == 0:
        return NamedSharding(mesh, P(axis, None, None))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, cfg: SimConfig, axis: str = "x") -> SimState:
    """A SimState-shaped pytree of NamedShardings for jit in/out_shardings.
    One PartitionSpec table: every divisible grid P(x,·,·) on i, particles
    P(x,·), scalars replicated."""
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
            phi=g(cfg.node_shape),
            center_phi=g(cfg.grid_shape),
            weight_u=g(cfg.u_shape),
            weight_v=g(cfg.v_shape),
            weight_w=g(cfg.w_shape),
            solid_u=g(cfg.u_shape),
            solid_v=g(cfg.v_shape),
            solid_w=g(cfg.w_shape),
        ),
        viscosity=g(cfg.node_shape),
        gravity=rep,
    )


def shard_state(state: SimState, mesh: Mesh, cfg: SimConfig,
                axis: str = "x") -> tuple[SimState, SimState]:
    """device_put the state under the standard decomposition; returns
    (sharded_state, shardings)."""
    sh = state_shardings(mesh, cfg, axis)
    return jax.device_put(state, sh), sh
