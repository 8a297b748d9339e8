"""Tile-block Pallas particle engine: one-hot MXU transfers over sorted tiles.

The TPU-native replacement for the reference's per-particle scatter/gather
loops (/root/reference/src/fluidsimulation.cpp:364-438, :535-541,
particlelevelset.cpp:98-125) at multi-million particle counts, where XLA's
irregular ops cost ~7-25 ns per element/row (docs/DESIGN.md).

Design:
- Particles are sorted by a TILE-MAJOR cell key: cells grouped into (8,8,8)
  tiles, key = tile_id * 512 + local_id. A sorted chunk of C=512 particles
  then spans a short contiguous run of tiles.
- All particle<->grid transfers become ONE-HOT MXU matmuls between particle
  chunks and the 512 cells of a tile:
    scatter:  per-cell sums  out[cell, col] += sum_p onehot[cell,p]*val[col,p]
    expand :  bucket table   out[cell, r*4+f] via (rank==r) one-hot factors
    gather :  per-particle   rows[p, col] = sum_cell onehot[cell,p]*cols[cell,col]
  The one-hot factor is exactly 0/1, so under precision=HIGHEST every
  bf16-pass product is exact and the matmuls reproduce f32 arithmetic.
- Per-tile particle ranges ride in as scalar-prefetch prefix tables; chunk
  DMAs walk the (8, N) payload with 128-aligned starts (a Mosaic layout
  rule: partial slices must be 128-aligned on the lane dim), the one-hot
  mask absorbing overlap rows.

Unlike the XLA bucket-table engine (ops/buckets.py), the P2G sums here
include EVERY particle (no capacity drop); only the liquid-SDF bucket table
keeps a capacity, matching the table engine's SDF semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = (8, 8, 8)
W = TILE[0] * TILE[1] * TILE[2]   # cells per tile
C = 512                            # particles per chunk
ALIGN = 128                        # lane alignment for dynamic DMA offsets
N_P2G = 108                        # 54 weight cols + 54 weight*velocity cols
FAR = 1.0e8                        # empty-slot position sentinel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def check_grid(grid_shape) -> None:
    if any(s % t for s, t in zip(grid_shape, TILE)):
        raise ValueError(
            f"particle_engine='pallas' needs grid dims divisible by {TILE}; "
            f"got {grid_shape} (use the table engine for odd sizes)"
        )


def tile_counts(grid_shape):
    return tuple(s // t for s, t in zip(grid_shape, TILE))


def tile_major_key(idx, grid_shape):
    """Clamped (..., 3) int32 cell coords -> tile-major flat key."""
    nt = tile_counts(grid_shape)
    ti, tj, tk = (idx[..., a] // TILE[a] for a in range(3))
    li, lj, lk = (idx[..., a] % TILE[a] for a in range(3))
    tile = (ti * nt[1] + tj) * nt[2] + tk
    local = (li * TILE[1] + lj) * TILE[2] + lk
    return tile * W + local


def key_of_position(pos, dx, grid_shape):
    """Tile-major home-cell key with the same clamp semantics as
    ops/buckets.cell_of_position (grid3d.h:37-43 floor + clamp)."""
    idx = jnp.floor(pos / dx).astype(jnp.int32)
    dims = jnp.array(grid_shape, jnp.int32)
    idx = jnp.clip(idx, 0, dims - 1)
    return tile_major_key(idx, grid_shape)


def decode_key(keys, grid_shape):
    """Tile-major key -> (i, j, k) int32 cell coords."""
    nt = tile_counts(grid_shape)
    tile = keys // W
    local = keys % W
    ti = tile // (nt[1] * nt[2])
    tj = (tile // nt[2]) % nt[1]
    tk = tile % nt[2]
    li = local // (TILE[1] * TILE[2])
    lj = (local // TILE[2]) % TILE[1]
    lk = local % TILE[2]
    return ti * TILE[0] + li, tj * TILE[1] + lj, tk * TILE[2] + lk


def chunk_spans(key_s, n_chunks):
    """(n_chunks, 2) int32 [first_tile, last_tile] each sorted chunk spans."""
    n = key_s.shape[0]
    first = key_s[jnp.minimum(jnp.arange(n_chunks) * C, n - 1)] // W
    last = key_s[
        jnp.minimum((jnp.arange(n_chunks) + 1) * C - 1, n - 1)] // W
    return jnp.stack([first, last], axis=1).astype(jnp.int32)


def _pad_lanes(rows, n_fields):
    """Pad (n_fields, N) payload to (n_fields, N + 2C); key row gets -1 so
    padding lanes never match a one-hot and never join a tile span."""
    parts = []
    for f in range(n_fields):
        fill = -1.0 if f == n_fields - 2 else 0.0  # key row by convention
        parts.append(jnp.full((1, 2 * C), fill, jnp.float32))
    return jnp.concatenate([rows, jnp.concatenate(parts, axis=0)], axis=1)


class TiledStream(NamedTuple):
    """Pass-A particle stream, sorted by tile-major home-cell key.

    payload: (8, N + 2C) f32 rows [px,py,pz,vx,vy,vz,key,rank].
    key: (N,) int32 sorted keys; rank: (N,) int32 rank within cell.
    starts: (n_tiles + 1,) int32 first sorted index per tile.
    spans: (n_chunks, 2) int32 tile range per C-particle chunk.
    sorted: tuple of (N,) sorted field arrays (px,py,pz,vx,vy,vz).
    """

    payload: jnp.ndarray
    key: jnp.ndarray
    rank: jnp.ndarray
    starts: jnp.ndarray
    spans: jnp.ndarray
    sorted: tuple

    @property
    def n(self) -> int:
        return self.key.shape[0]


def tiled_sort(pos, vel, dx, grid_shape) -> TiledStream:
    """ONE lax.sort per substep + rank scan + tile prefix/spans."""
    key = key_of_position(pos, dx, grid_shape)
    n = pos.shape[0]
    ops = lax.sort(
        (key, pos[:, 0], pos[:, 1], pos[:, 2],
         vel[:, 0], vel[:, 1], vel[:, 2]),
        num_keys=1, is_stable=True,
    )
    key_s = ops[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    run_start = lax.associative_scan(
        jnp.maximum, jnp.where(new_run, idx, 0))
    rank = idx - run_start

    payload = jnp.stack(
        [ops[1], ops[2], ops[3], ops[4], ops[5], ops[6],
         key_s.astype(jnp.float32), rank.astype(jnp.float32)], axis=0)
    payload = _pad_lanes(payload, 8)

    n_tiles = (grid_shape[0] * grid_shape[1] * grid_shape[2]) // W
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * W
    starts = jnp.searchsorted(key_s, bounds).astype(jnp.int32)
    spans = chunk_spans(key_s, _n_chunks(n))
    return TiledStream(payload, key_s, rank, starts, spans, tuple(ops[1:]))


def _n_chunks(n: int) -> int:
    return (n + C - 1) // C


# ---------------------------------------------------------------------------
# layout conversion: (I, J, K, F) <-> tile-major (n_tiles, W, F)
# ---------------------------------------------------------------------------

def to_tile_major(x):
    """(I, J, K, F) -> (n_tiles, W, F)."""
    i, j, k, f = x.shape
    nt = (i // TILE[0], j // TILE[1], k // TILE[2])
    x = x.reshape(nt[0], TILE[0], nt[1], TILE[1], nt[2], TILE[2], f)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)
    return x.reshape(nt[0] * nt[1] * nt[2], W, f)


def from_tile_major(y, grid_shape):
    """(n_tiles, W, F) -> (I, J, K, F)."""
    f = y.shape[-1]
    nt = tile_counts(grid_shape)
    y = y.reshape(nt[0], nt[1], nt[2], TILE[0], TILE[1], TILE[2], f)
    y = y.transpose(0, 3, 1, 4, 2, 5, 6)
    return y.reshape(grid_shape[0], grid_shape[1], grid_shape[2], f)


# ---------------------------------------------------------------------------
# P2G offset lane layout (shared by the scatter kernel and the XLA combine)
# ---------------------------------------------------------------------------
# lane l in [0, 54): comp = l // 18, oidx = l % 18,
#   ox = oidx // 9 in {0,1} (component axis), oy = (oidx//3)%3 - 1,
#   oz = oidx%3 - 1 (transverse axes). Absolute (x,y,z) offsets:
#   u: (ox, oy, oz);  v: (oy, ox, oz);  w: (oy, oz, ox).

def p2g_abs_offset(comp: int, oidx: int):
    ox, oy, oz = oidx // 9, (oidx // 3) % 3 - 1, oidx % 3 - 1
    if comp == 0:
        return (ox, oy, oz)
    if comp == 1:
        return (oy, ox, oz)
    return (oy, oz, ox)


# ---------------------------------------------------------------------------
# scatter kernel: P2G sums + SDF bucket-table expansion
# ---------------------------------------------------------------------------

def _scatter_chunk_values(data, base_key, origin, dx, cap):
    """data: (8, C) payload slice -> (m1 (W, C), vals (N_P2G + cap*4, C))."""
    px, py, pz = data[0:1], data[1:2], data[2:3]
    vx, vy, vz = data[3:4], data[4:5], data[5:6]
    key, rank = data[6:7], data[7:8]
    local = key - base_key  # f32, exact below 2^24

    sub_w = jax.lax.broadcasted_iota(
        jnp.int32, (W, C), 0).astype(jnp.float32)
    m1 = jnp.where(local == sub_w, 1.0, 0.0)

    gi = jnp.floor(local / (TILE[1] * TILE[2])) + origin[0]
    rem = local - (gi - origin[0]) * (TILE[1] * TILE[2])
    gj = jnp.floor(rem / TILE[2]) + origin[1]
    gk = rem - (gj - origin[1]) * TILE[2] + origin[2]

    lane = jax.lax.broadcasted_iota(jnp.int32, (54, C), 0)
    comp = lane // 18
    oidx = lane % 18
    ox = (oidx // 9).astype(jnp.float32)
    oy = ((oidx // 3) % 3 - 1).astype(jnp.float32)
    oz = (oidx % 3 - 1).astype(jnp.float32)
    is_u = (comp == 0).astype(jnp.float32)
    is_v = (comp == 1).astype(jnp.float32)
    is_w = (comp == 2).astype(jnp.float32)
    ax_ = is_u * ox + is_v * oy + is_w * oy
    ay_ = is_u * oy + is_v * ox + is_w * oz
    az_ = is_u * oz + is_v * oz + is_w * ox
    sx = 0.5 * (1.0 - is_u)
    sy = 0.5 * (1.0 - is_v)
    sz = 0.5 * (1.0 - is_w)
    fx = (gi + ax_) * dx - (px - sx * dx)
    fy = (gj + ay_) * dx - (py - sy * dx)
    fz = (gk + az_) * dx - (pz - sz * dx)
    d2 = fx * fx + fy * fy + fz * fz
    # Wyvill kernel (fluidsimulation.cpp:385-413), zero at/beyond r=dx
    r2 = jnp.float32(dx * dx)
    c1 = jnp.float32((4.0 / 9.0) / dx**6)
    c2 = jnp.float32((17.0 / 9.0) / dx**4)
    c3 = jnp.float32((22.0 / 9.0) / dx**2)
    wgt = 1.0 - c1 * d2 * d2 * d2 + c2 * d2 * d2 - c3 * d2
    wgt = jnp.where(d2 < r2, wgt, 0.0)
    vsel = is_u * vx + is_v * vy + is_w * vz
    wv = wgt * vsel

    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cap * 4, C), 0)
    r_ = (lane_t // 4).astype(jnp.float32)
    f_ = lane_t % 4
    rv = jnp.where(
        rank == r_,
        jnp.where(f_ == 0, px,
                  jnp.where(f_ == 1, py, jnp.where(f_ == 2, pz, 1.0))),
        0.0,
    )
    return m1, jnp.concatenate([wgt, wv, rv], axis=0)


@functools.partial(
    jax.jit, static_argnames=("grid_shape", "dx", "cap"))
def scatter_p2g_table(starts, payload, grid_shape, dx, cap):
    """-> (n_tiles, W, N_P2G + cap*4) per-cell sums + expanded table."""
    nt = tile_counts(grid_shape)
    n_tiles = nt[0] * nt[1] * nt[2]
    n_cols = N_P2G + cap * 4
    dxf = float(dx)

    def kernel(starts_ref, payload_hbm, out_ref, acc, chunk, sem):
        b = pl.program_id(0)
        s0 = starts_ref[b]
        s1 = starts_ref[b + 1]
        base_key = (b * W).astype(jnp.float32)
        ti = b // (nt[1] * nt[2])
        tj = (b // nt[2]) % nt[1]
        tk = b % nt[2]
        origin = ((ti * TILE[0]).astype(jnp.float32),
                  (tj * TILE[1]).astype(jnp.float32),
                  (tk * TILE[2]).astype(jnp.float32))
        a0 = (s0 // ALIGN) * ALIGN
        n_chunks = lax.div(s1 - a0 + C - 1, C)

        acc[:] = jnp.zeros_like(acc)

        def body(ci, _):
            dma = pltpu.make_async_copy(
                payload_hbm.at[:, pl.ds(a0 + ci * C, C)], chunk, sem)
            dma.start()
            dma.wait()
            m1, vals = _scatter_chunk_values(
                chunk[:], base_key, origin, dxf, cap)
            acc[:] += jax.lax.dot_general(
                m1, vals, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return 0

        lax.fori_loop(0, n_chunks, body, 0)
        out_ref[0] = acc[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, W, n_cols), lambda b, starts: (b, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, n_cols), jnp.float32),
            pltpu.VMEM((8, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, W, n_cols), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, payload)


def split_scatter_output(out, grid_shape, cap):
    """(n_tiles, W, N_P2G+cap*4) -> (sums (I,J,K,108),
    table fields [(cap, n_cells) px,py,pz] with FAR empties)."""
    std = from_tile_major(out, grid_shape)  # (I, J, K, n_cols)
    sums = std[..., :N_P2G]
    n_cells = grid_shape[0] * grid_shape[1] * grid_shape[2]
    tbl = std[..., N_P2G:].reshape(*grid_shape, cap, 4)
    tbl = jnp.moveaxis(tbl, 3, 0).reshape(cap, n_cells, 4)
    occ = tbl[..., 3] > 0.5
    fields = tuple(
        jnp.where(occ, tbl[..., f], FAR) for f in range(3))
    return sums, fields


def p2g_combine(sums, grid_shape, face_shapes):
    """Per-cell (I,J,K,108) sums -> [(val_sum, w_sum)] per component, by
    static shifted accumulation (face f = cell + offset receives the cell's
    sums), exactly like ops/stream_transfers.p2g_sdf_stream's second half."""
    from .grids import shifted_read

    acc = []
    for comp in range(3):
        fs = face_shapes[comp]
        vs = jnp.zeros(fs, jnp.float32)
        ws = jnp.zeros(fs, jnp.float32)
        for oidx in range(18):
            o = p2g_abs_offset(comp, oidx)
            neg = tuple(-v for v in o)
            lane = comp * 18 + oidx
            ws = ws + shifted_read(sums[..., lane], neg, fs)
            vs = vs + shifted_read(sums[..., 54 + lane], neg, fs)
        acc.append((vs, ws))
    return acc


def liquid_sdf_from_fields(fields, grid_shape, dx, radius, solid_center_phi):
    """27-offset dense min sweep over the expanded position table
    (particlelevelset.cpp:77-139), reusing the table engine's sweep."""
    from .buckets import BucketTable
    from .particle_grid import liquid_sdf_from_particles

    stub = BucketTable(fields, (), None, None, jnp.int32(0))
    return liquid_sdf_from_particles(
        stub, grid_shape, dx, radius, solid_center_phi)


# ---------------------------------------------------------------------------
# gather kernel: per-particle rows of per-cell stacked columns
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n",))
def gather_rows(spans, keys_f32, cols_tm, n):
    """Per-particle rows cols[key] for tile-sorted keys.

    spans: (n_chunks, 2) tile range per chunk; keys_f32: (1, N + 2C) f32
    sorted keys (pad -1); cols_tm: (n_tiles, W, F) tile-major columns.
    Returns (N, F) f32 rows.
    """
    n_chunks = _n_chunks(n)
    n_tiles, _, n_cols_logical = cols_tm.shape
    # Mosaic rejects manual DMAs whose lane extent isn't a multiple of 128
    # ("Slice shape along dimension 2 must be aligned to tiling (128)"), so
    # pad the column dim; the pad lanes are zero and sliced off at the end.
    n_cols = -(-n_cols_logical // ALIGN) * ALIGN
    if n_cols != n_cols_logical:
        cols_tm = jnp.pad(
            cols_tm, ((0, 0), (0, 0), (0, n_cols - n_cols_logical)))
    # 2-D SMEM prefetch arrays are lane-padded to 128 columns ((n_chunks, 2)
    # i32 -> n_chunks * 512 B, past the 1 MB SMEM budget at 4M particles);
    # flatten to 1-D, which stays byte-packed.
    spans_flat = spans.reshape(-1)

    def kernel(spans_ref, keys_ref, cols_hbm, out_ref, colbuf, acc, sem):
        ci = pl.program_id(0)
        t0 = spans_ref[2 * ci]
        t1 = spans_ref[2 * ci + 1]
        key = keys_ref[:]  # (1, C)

        acc[:] = jnp.zeros_like(acc)

        def body(ti, _):
            t = t0 + ti
            dma = pltpu.make_async_copy(cols_hbm.at[t], colbuf, sem)
            dma.start()
            dma.wait()
            local = key - (t * W).astype(jnp.float32)
            sub_w = jax.lax.broadcasted_iota(
                jnp.int32, (W, C), 0).astype(jnp.float32)
            m1 = jnp.where(local == sub_w, 1.0, 0.0)
            acc[:] += jax.lax.dot_general(
                m1, colbuf[:], (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return 0

        lax.fori_loop(0, t1 - t0 + 1, body, 0)
        out_ref[:] = acc[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, C), lambda ci, spans: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((C, n_cols), lambda ci, spans: (ci, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, n_cols), jnp.float32),
            pltpu.VMEM((C, n_cols), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    rows = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks * C, n_cols), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(spans_flat, keys_f32[:, : n_chunks * C], cols_tm)
    return rows[:n, :n_cols_logical]


# ---------------------------------------------------------------------------
# MAC sampling via gathered columns (G2P, RK2 stage 2)
# ---------------------------------------------------------------------------

def build_mac_columns(grids_u, grids_v, grids_w, grid_shape):
    """(I,J,K,F) stacked per-cell columns: for each comp, each grid of that
    comp, the 18 window offsets (p2g_abs_offset layout). Matches
    ops/stream_transfers.sample_mac_at's column set."""
    from .grids import shifted_read

    comp_grids = (grids_u, grids_v, grids_w)
    cols = []
    for comp in range(3):
        for g in comp_grids[comp]:
            for oidx in range(18):
                o = p2g_abs_offset(comp, oidx)
                cols.append(shifted_read(g, o, grid_shape))
    return jnp.stack(cols, axis=-1)


def combine_mac_samples(rows, px, py, pz, keys, dx, grid_shape, n_grids,
                        valid=None):
    """Trilinear combine of gathered (N, 54*n_grids) rows.

    Returns ([u samples], [v samples], [w samples]) lists of (N,) arrays,
    one per grid. Reproduces ops/stream_transfers.sample_mac_at's math
    (macvelocityfield.cpp:455-578 trilinear MAC sampling)."""
    hi, hj, hk = decode_key(keys, grid_shape)
    home = (hi, hj, hk)
    ps = (px, py, pz)
    offs = ((0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0))

    outs = ([], [], [])
    for comp in range(3):
        off = offs[comp]
        fs, deltas = [], []
        for ax in range(3):
            f = ps[ax] / dx - off[ax]
            b = jnp.floor(f)
            fs.append(f - b)
            deltas.append(b.astype(jnp.int32) - home[ax])
        for g in range(n_grids):
            out = jnp.zeros_like(px)
            for oidx in range(18):
                o = p2g_abs_offset(comp, oidx)
                w = jnp.ones_like(px)
                for ax in range(3):
                    corner = o[ax] - deltas[ax]
                    w = w * jnp.where(
                        corner == 0, 1.0 - fs[ax],
                        jnp.where(corner == 1, fs[ax], 0.0))
                lane = (comp * n_grids + g) * 18 + oidx
                out = out + w * rows[:, lane]
            if valid is not None:
                out = jnp.where(valid, out, 0.0)
            outs[comp].append(out)
    return outs


def sort_by_key(key, fields):
    """Plain tile-key sort for pass B: returns (key_s, sorted fields,
    spans, keys_f32 (1, padded))."""
    n = key.shape[0]
    ops = lax.sort((key,) + tuple(fields), num_keys=1, is_stable=True)
    key_s = ops[0]
    spans = chunk_spans(key_s, _n_chunks(n))
    keys_f32 = _pad_keys(key_s)
    return key_s, tuple(ops[1:]), spans, keys_f32


def _pad_keys(key_s):
    kf = key_s.astype(jnp.float32)[None, :]
    return jnp.concatenate(
        [kf, jnp.full((1, 2 * C), -1.0, jnp.float32)], axis=1)
