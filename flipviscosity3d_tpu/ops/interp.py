"""Grid interpolation with the reference's exact conventions.

Conventions reproduced (see /root/reference/src/interpolation.cpp:32-184,
grid3d.h:37-113, macvelocityfield.cpp:353-578, particlelevelset.cpp:88-92):

- grid index of a position: floor(pos / dx) per axis
- node (i,j,k) sits at position (i*dx, j*dx, k*dx); cell centers at +dx/2
- trilinear sampling gathers the 8 surrounding nodes; out-of-range corners
  contribute the value 0 (no clamping)
- cell-centered fields (liquid phi) are sampled at pos - dx/2
- MAC velocity components are sampled with the half-dx offsets applied to the
  two transverse axes, and evaluate to exactly 0 for positions outside the
  domain box [0, I*dx) x [0, J*dx) x [0, K*dx)

These are gather-based implementations used at scene setup and in tests; the
hot simulation path uses the bucketed dense formulations in particle_grid.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_grid(grid, idx):
    """grid[idx] with out-of-range indices yielding 0.

    idx: (..., 3) int32. Returns (...,) values.
    """
    shp = jnp.asarray(grid.shape, dtype=idx.dtype)
    ok = jnp.all((idx >= 0) & (idx < shp), axis=-1)
    idx_c = jnp.clip(idx, 0, shp - 1)
    vals = grid[idx_c[..., 0], idx_c[..., 1], idx_c[..., 2]]
    return jnp.where(ok, vals, 0.0)


def _corner_weights(t):
    """Per-axis (1-t, t) weights for the 8 trilinear corners.

    Returns list of (offset_tuple, weight) pairs; t is (..., 3).
    """
    out = []
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                w = (
                    jnp.where(di, t[..., 0], 1.0 - t[..., 0])
                    * jnp.where(dj, t[..., 1], 1.0 - t[..., 1])
                    * jnp.where(dk, t[..., 2], 1.0 - t[..., 2])
                )
                out.append(((di, dj, dk), w))
    return out


def trilinear(grid, pos, dx):
    """Trilinear sample of a node-indexed grid at world positions.

    Matches Interpolation::trilinearInterpolate(vec3, dx, grid)
    (interpolation.cpp:68-108): base = floor(pos/dx), out-of-range corners = 0.
    pos: (..., 3).
    """
    f = pos / dx
    base = jnp.floor(f).astype(jnp.int32)
    t = f - base
    total = 0.0
    for (di, dj, dk), w in _corner_weights(t):
        idx = base + jnp.array([di, dj, dk], dtype=base.dtype)
        total = total + w * gather_grid(grid, idx)
    return total


def trilinear_gradient(grid, pos, dx):
    """Trilinear-interpolated gradient (interpolation.cpp:122-184).

    Corner differences along each axis, bilinearly interpolated in the two
    transverse fractional coordinates. Returns (..., 3).
    """
    f = pos / dx
    base = jnp.floor(f).astype(jnp.int32)
    t = f - base

    v = {}
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                idx = base + jnp.array([di, dj, dk], dtype=base.dtype)
                v[(di, dj, dk)] = gather_grid(grid, idx)

    def bilerp(v00, v10, v01, v11, ix, iy):
        return (1 - iy) * ((1 - ix) * v00 + ix * v10) + iy * ((1 - ix) * v01 + ix * v11)

    ddx = [v[(1, a, b)] - v[(0, a, b)] for a in (0, 1) for b in (0, 1)]
    # order produced: (a,b) = (0,0),(0,1),(1,0),(1,1); reference wants
    # ddx00=(j0,k0), ddx10=(j1,k0), ddx01=(j0,k1), ddx11=(j1,k1)
    gx = bilerp(ddx[0], ddx[2], ddx[1], ddx[3], t[..., 1], t[..., 2])

    ddy = [v[(a, 1, b)] - v[(a, 0, b)] for a in (0, 1) for b in (0, 1)]
    gy = bilerp(ddy[0], ddy[2], ddy[1], ddy[3], t[..., 0], t[..., 2])

    ddz = [v[(a, b, 1)] - v[(a, b, 0)] for a in (0, 1) for b in (0, 1)]
    gz = bilerp(ddz[0], ddz[2], ddz[1], ddz[3], t[..., 0], t[..., 1])

    return jnp.stack([gx, gy, gz], axis=-1)


def sample_liquid_phi(phi_cell, pos, dx):
    """Cell-centered liquid SDF sample (particlelevelset.cpp:88-92):
    trilinear at pos - dx/2."""
    return trilinear(phi_cell, pos - 0.5 * dx, dx)


def sample_solid_phi(phi_node, pos, dx):
    """Node-sampled solid SDF sample (meshlevelset.cpp:82-84)."""
    return trilinear(phi_node, pos, dx)


def sample_solid_phi_gradient(phi_node, pos, dx):
    """Gradient of the node-sampled solid SDF (meshlevelset.cpp:86-90)."""
    return trilinear_gradient(phi_node, pos, dx)


def in_grid(pos, dx, grid_shape):
    """Grid3d::isPositionInGrid (grid3d.h:139-152): pos in [0, size*dx) per axis."""
    ext = jnp.array(
        [grid_shape[0] * dx, grid_shape[1] * dx, grid_shape[2] * dx],
        dtype=pos.dtype,
    )
    return jnp.all((pos >= 0) & (pos < ext), axis=-1)


_MAC_OFFSETS = {
    "u": (0.0, 0.5, 0.5),
    "v": (0.5, 0.0, 0.5),
    "w": (0.5, 0.5, 0.0),
}


def sample_mac_component(grid, pos, dx, grid_shape, component):
    """One MAC component, linear (macvelocityfield.cpp:455-546).

    The transverse axes are shifted by -dx/2 before the floor; positions
    outside the domain evaluate to 0.
    """
    off = jnp.array(_MAC_OFFSETS[component], dtype=pos.dtype) * dx
    val = trilinear(grid, pos - off, dx)
    return jnp.where(in_grid(pos, dx, grid_shape), val, 0.0)


def sample_mac_linear(u, v, w, pos, dx, grid_shape):
    """Full MAC velocity at positions, trilinear
    (MACVelocityField::evaluateVelocityAtPositionLinear,
    macvelocityfield.cpp:564-578). Returns (..., 3)."""
    return jnp.stack(
        [
            sample_mac_component(u, pos, dx, grid_shape, "u"),
            sample_mac_component(v, pos, dx, grid_shape, "v"),
            sample_mac_component(w, pos, dx, grid_shape, "w"),
        ],
        axis=-1,
    )


def _cubic(p0, p1, p2, p3, x):
    """Catmull-Rom style cubic (interpolation.cpp:50-52)."""
    return p1 + 0.5 * x * (
        p2 - p0 + x * (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3 + x * (3.0 * (p1 - p2) + p3 - p0))
    )


def tricubic(grid, pos, dx):
    """Tricubic sample over a 4^3 neighborhood (interpolation.cpp:32-48 via
    macvelocityfield.cpp:353-385 conventions: ref corner = floor(pos/dx) - 1,
    out-of-range points read as the grid's out-of-range default 0)."""
    f = pos / dx
    base = jnp.floor(f).astype(jnp.int32)
    t = f - base

    zs = []
    for pk in range(4):
        ys = []
        for pj in range(4):
            xs = []
            for pi in range(4):
                idx = base + jnp.array([pi - 1, pj - 1, pk - 1], dtype=base.dtype)
                xs.append(gather_grid(grid, idx))
            ys.append(_cubic(xs[0], xs[1], xs[2], xs[3], t[..., 0]))
        zs.append(_cubic(ys[0], ys[1], ys[2], ys[3], t[..., 1]))
    return _cubic(zs[0], zs[1], zs[2], zs[3], t[..., 2])


def sample_mac_cubic(u, v, w, pos, dx, grid_shape):
    """Full MAC velocity, tricubic (evaluateVelocityAtPosition,
    macvelocityfield.cpp:548-562)."""
    inside = in_grid(pos, dx, grid_shape)
    comps = []
    for grid, component in ((u, "u"), (v, "v"), (w, "w")):
        off = jnp.array(_MAC_OFFSETS[component], dtype=pos.dtype) * dx
        comps.append(jnp.where(inside, tricubic(grid, pos - off, dx), 0.0))
    return jnp.stack(comps, axis=-1)
