"""Static shifted-slice primitives for stencil and staggered-grid transfers.

Everything in the hot path is expressed through these two adjoint operations
with *static* integer offsets, which XLA lowers to fused slice/pad — no
gathers, no scatters, no rolls across device-sharded axes (under pjit these
become efficient halo exchanges).
"""

from __future__ import annotations

import jax.numpy as jnp


def _ranges(offset, out_shape, src_shape):
    """Index ranges such that out[lo_out:hi_out] = src[lo_out+o : hi_out+o]."""
    slices_src = []
    pads = []
    for ax in range(3):
        o = int(offset[ax])
        n_out = out_shape[ax]
        n_src = src_shape[ax]
        lo_out = max(0, -o)
        hi_out = min(n_out, n_src - o)
        hi_out = max(hi_out, lo_out)  # empty overlap
        slices_src.append(slice(lo_out + o, hi_out + o))
        pads.append((lo_out, n_out - hi_out))
    return tuple(slices_src), pads


def shifted_read(src, offset, out_shape, fill=0.0):
    """out[c] = src[c + offset], with `fill` where c + offset is out of range.

    `offset` is a static (oi, oj, ok) tuple. This is the dense, vectorized
    form of every "grid(i+oi, j+oj, k+ok) with out-of-range default" access
    in the reference (Array3d out-of-range values, interpolation corner
    zeroing, stencil neighbor reads).
    """
    slices_src, pads = _ranges(offset, out_shape, src.shape)
    block = src[slices_src]
    if any(p != (0, 0) for p in pads):
        block = jnp.pad(block, pads, constant_values=fill)
    return block


def shifted_add(target, values, offset):
    """target[c + offset] += values[c] for in-range c + offset (adjoint of
    shifted_read). `values` has any shape; `target` receives the overlap."""
    out_shape = target.shape
    # target[c'] += values[c' - offset]: a shifted_read of values by -offset
    neg = tuple(-int(o) for o in offset)
    slices_vals, _ = _ranges(neg, out_shape, values.shape)
    slices_tgt, pads = _ranges(neg, out_shape, values.shape)
    # region of target covered: where pads are zero
    tgt_slices = []
    for ax in range(3):
        lo, hi = pads[ax]
        tgt_slices.append(slice(lo, out_shape[ax] - hi))
    return target.at[tuple(tgt_slices)].add(values[slices_vals])


def interior_mask(shape, dtype=bool):
    """Mask that is True strictly inside the array (False on all border
    planes) — the reference's isGridIndexOnBorder complement."""
    m = jnp.zeros(shape, dtype)
    return m.at[1:-1, 1:-1, 1:-1].set(True)


def range_mask(shape, lo, hi):
    """Mask True where lo[ax] <= index < hi[ax] on every axis (static)."""
    m = jnp.zeros(shape, bool)
    return m.at[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]].set(True)


def face_borders_fluid_u(fluid):
    """ValidU-style mask: U face (i,j,k) borders a fluid cell
    (Grid3d::isFaceBorderingValueU, grid3d.h:497-501). fluid: (I,J,K) bool.
    Returns (I+1,J,K)."""
    pad = jnp.zeros((1,) + fluid.shape[1:], bool)
    left = jnp.concatenate([pad, fluid], axis=0)
    right = jnp.concatenate([fluid, pad], axis=0)
    return left | right


def face_borders_fluid_v(fluid):
    pad = jnp.zeros((fluid.shape[0], 1, fluid.shape[2]), bool)
    lo = jnp.concatenate([pad, fluid], axis=1)
    hi = jnp.concatenate([fluid, pad], axis=1)
    return lo | hi


def face_borders_fluid_w(fluid):
    pad = jnp.zeros(fluid.shape[:2] + (1,), bool)
    lo = jnp.concatenate([pad, fluid], axis=2)
    hi = jnp.concatenate([fluid, pad], axis=2)
    return lo | hi
