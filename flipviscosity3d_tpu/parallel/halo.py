"""Explicit halo-exchange primitives for the shard_map pipeline.

The pjit path (parallel/sharding.py) leaves collective placement to GSPMD.
This module is the explicit alternative for the i-axis block-row
decomposition: every shard holds a (B + 2*halo, J, K) slab of each global
(I, J, K) grid (B = I // n_shards), and stencil/transfer ops run purely
shard-locally between exchanges. Two collectives cover everything:

- halo_exchange: refresh the halo columns from the face-adjacent neighbors
  (lax.ppermute both directions) — what a stencil apply needs before reading
  shifted values.
- halo_reduce_sum / _min: fold contributions that a shard accumulated into
  its NEIGHBOR-owned halo columns back onto the owner and zero/reset the
  halo — what scatter-shaped ops (P2G, particle-SDF min) need after local
  accumulation.

The reference has no analog (single-threaded loops; SURVEY.md §2 states the
parallelism inventory is blueprint-defined); the ML-framework analog is halo
exchange in spatial/sequence parallelism, expressed here with XLA
collectives over ICI as jax.shard_map + lax.ppermute.

Boundary shards keep their out-of-domain halo columns at a caller-supplied
fill value, reproducing the out-of-range-default read semantics of
ops/grids.shifted_read (array3d.h:349-362) at the global domain border.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _ring(axis_name: str, shift: int):
    """Non-wrapping neighbor permutation along the named axis."""
    n = lax.axis_size(axis_name)
    return [(s, s + shift) for s in range(n) if 0 <= s + shift < n]


def axis_index(axis_name: str):
    return lax.axis_index(axis_name)


def halo_exchange(x, axis_name: str, halo: int, fill=0.0):
    """Refresh the leading-axis halo columns of a local slab.

    x: (B + 2*halo, ...) local block; rows [halo, B+halo) are owned.
    Returns x with rows [0, halo) holding the left neighbor's last owned
    rows and rows [B+halo, B+2*halo) the right neighbor's first owned rows;
    domain-boundary shards get `fill` instead.
    """
    if halo == 0:
        return x
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    own_lo = x[halo : 2 * halo]              # first owned rows -> left nbr
    own_hi = x[-2 * halo : -halo]            # last owned rows  -> right nbr
    from_left = lax.ppermute(own_hi, axis_name, _ring(axis_name, +1))
    from_right = lax.ppermute(own_lo, axis_name, _ring(axis_name, -1))
    fill_arr = jnp.full_like(own_lo, fill)
    left = jnp.where(idx == 0, fill_arr, from_left)
    right = jnp.where(idx == n - 1, fill_arr, from_right)
    return jnp.concatenate([left, x[halo:-halo], right], axis=0)


def halo_reduce(x, axis_name: str, halo: int, op: str = "sum",
                reset=0.0):
    """Fold halo-accumulated contributions onto the owning neighbor.

    After a local scatter/segment accumulation, rows [0, halo) hold
    contributions to the LEFT neighbor's cells and rows [B+halo, B+2*halo)
    to the RIGHT neighbor's. Sends both to their owners, combines into the
    owned rows (sum or min), and resets the halo rows to `reset`.
    """
    if halo == 0:
        return x
    rows = x.shape[0]
    to_left = x[:halo]
    to_right = x[-halo:]
    from_right = lax.ppermute(to_left, axis_name, _ring(axis_name, -1))
    from_left = lax.ppermute(to_right, axis_name, _ring(axis_name, +1))
    # boundary shards receive the ppermute default (zeros); harmless for sum,
    # min uses an explicit neutral
    if op == "min":
        n = lax.axis_size(axis_name)
        idx = lax.axis_index(axis_name)
        neutral = jnp.full_like(from_left, reset)
        from_left = jnp.where(idx == 0, neutral, from_left)
        from_right = jnp.where(idx == n - 1, neutral, from_right)
    elif op != "sum":
        raise ValueError(op)
    # .at-updates rather than a concat sandwich: the incoming windows
    # [halo, 2*halo) and [rows-2*halo, rows-halo) legitimately overlap when
    # the owned width B < 2*halo, and both must combine into the same rows
    out = x.at[:halo].set(reset)
    out = out.at[-halo:].set(reset)
    if op == "sum":
        out = out.at[halo : 2 * halo].add(from_left)
        out = out.at[rows - 2 * halo : rows - halo].add(from_right)
    else:
        out = out.at[halo : 2 * halo].min(from_left)
        out = out.at[rows - 2 * halo : rows - halo].min(from_right)
    return out


def slab(x_global, axis_name: str, n: int, halo: int, fill=0.0,
         owned: int | None = None):
    """Cut the local (B + 2*halo) slab out of a replicated global array.

    Setup-time helper (solid SDF, initial grids): B = x.shape[0] // n unless
    `owned` overrides it; out-of-domain halo rows take `fill`.
    """
    B = owned if owned is not None else x_global.shape[0] // n
    idx = lax.axis_index(axis_name)
    start = idx * B
    pad = jnp.full((halo,) + x_global.shape[1:], fill, x_global.dtype)
    padded = jnp.concatenate([pad, x_global, pad], axis=0)
    return lax.dynamic_slice_in_dim(padded, start, B + 2 * halo, axis=0)


def unslab(x_local, axis_name: str, halo: int):
    """Owned rows of a local slab (inverse of `slab` up to all_gather)."""
    return x_local[halo : x_local.shape[0] - halo] if halo else x_local


def owned_mask_rows(shape0: int, halo: int, dtype=jnp.float32):
    """(shape0,) mask: 1.0 on owned rows, 0 on halo rows — for reductions
    that must not double-count (CG dots over slabs with redundant faces)."""
    m = jnp.zeros((shape0,), dtype)
    return m.at[halo : shape0 - halo].set(1.0)
