"""Fixed-layer masked velocity extrapolation.

Replaces the reference's sequential BFS layering
(/root/reference/src/macvelocityfield.cpp:580-694) with `num_layers` Jacobi
sweeps that reproduce its semantics exactly:

- a cell is newly filled in a layer iff it is not on the array border and has
  at least one KNOWN 6-neighbor that is itself *interior* (the reference's
  discovery loop only scans interior source cells, so a candidate adjacent
  only to border KNOWN cells is never discovered);
- the filled value is the average of ALL currently-KNOWN 6-neighbors
  (border KNOWN cells do contribute to the average);
- cells filled in a layer become KNOWN only for subsequent layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grids import interior_mask, shifted_read

_NEIGHBOR_OFFSETS = (
    (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)
)


def extrapolate_grid(grid, valid, num_layers: int, interior=None,
                     exchange=None):
    """Extrapolate `grid` values from `valid` cells outward `num_layers`
    times. Returns (grid, valid) after extrapolation.

    `interior` overrides the not-on-array-border mask (the shard_map
    pipeline passes GLOBAL-domain interiority of its local slab rows);
    `exchange(g, v) -> (g, v)` runs before each layer (slab halo refresh)."""
    shape = grid.shape
    if interior is None:
        interior = interior_mask(shape)

    def layer(_, carry):
        g, v = carry
        if exchange is not None:
            g, v = exchange(g, v)
        vf = v.astype(g.dtype)
        v_int = (v & interior).astype(g.dtype)
        cnt_all = jnp.zeros_like(g)
        cnt_int = jnp.zeros_like(g)
        s = jnp.zeros_like(g)
        for o in _NEIGHBOR_OFFSETS:
            cnt_all = cnt_all + shifted_read(vf, o, shape)
            cnt_int = cnt_int + shifted_read(v_int, o, shape)
            s = s + shifted_read(g * vf, o, shape)
        newval = s / jnp.maximum(cnt_all, 1.0)
        update = (~v) & (cnt_int > 0) & interior
        g = jnp.where(update, newval, g)
        v = v | update
        return g, v

    return jax.lax.fori_loop(0, num_layers, layer, (grid, valid))


def extrapolate_velocity_field(u, v, w, valid_u, valid_v, valid_w,
                               num_layers: int):
    """extrapolateVelocityField over the three MAC components
    (macvelocityfield.cpp:689-694)."""
    u, valid_u = extrapolate_grid(u, valid_u, num_layers)
    v, valid_v = extrapolate_grid(v, valid_v, num_layers)
    w, valid_w = extrapolate_grid(w, valid_w, num_layers)
    return u, v, w, valid_u, valid_v, valid_w
