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
- The kernels iterate a FLATTENED VISIT LIST: one grid step per
  (chunk, tile) incidence of the sorted stream, in chunk-major order (both
  coordinates are nondecreasing on a sorted stream, so revisited blocks stay
  resident). ALL data movement happens through BlockSpec index maps driven
  by scalar-prefetch visit tables; accumulation across a block's visits uses
  first-visit zeroing (pl.when) + `out_ref +=`.

  This shape is dictated by hardware measurements (scripts/
  gather_perf_probe*.py): walking the span with an in-kernel fori_loop +
  manual make_async_copy DMAs — the v1 design — costs ~15-30 ms PER
  ITERATION on this chip (pathological Mosaic lowering), while the
  BlockSpec-driven revisit pattern runs at pipeline speed (~us per step).
  It also keeps every scalar-prefetch table at O(visits) ints, inside the
  1 MB SMEM budget that the v1 per-chunk span tables blew at 4M particles.

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
ALIGN = 128                        # lane alignment for tile-major columns
N_P2G = 108                        # 54 weight cols + 54 weight*velocity cols
NPAY = 10                          # payload rows: px,py,pz,vx,vy,vz,rank,gi,gj,gk
FAR = 1.0e8                        # empty-slot position sentinel

def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _split3(x, terms=3):
    """f32 -> `terms` bf16 terms whose sum reproduces x to ~2^-(8*terms+a
    few) relative (8 mantissa bits per term — 3 terms is the same
    decomposition XLA's HIGHEST uses; 2 terms ~2^-15, f32-single-pass
    class; 1 is a plain bf16 cast — exact ONLY for 0/1 one-hots and
    integers < 256, used by the in-kernel rank's one-hot x one-hot
    dots)."""
    x1 = x.astype(jnp.bfloat16)
    if terms == 1:
        return (x1,)
    r = x - x1.astype(jnp.float32)
    x2 = r.astype(jnp.bfloat16)
    if terms == 2:
        return x1, x2
    x3 = (r - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return x1, x2, x3


def onehot_dot_split3(onehot, vals, dims, onehot_left=True, terms=3):
    """The hardware multi-pass body of onehot_dot, callable on any backend
    (plain JAX): vals splits into `terms` bf16 terms (_split3), each
    contracted against the bf16-cast one-hot with f32 accumulation."""
    oh = onehot.astype(jnp.bfloat16)
    out = None
    for term in _split3(vals, terms):
        a, b = (oh, term) if onehot_left else (term, oh)
        d = jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


def onehot_dot(onehot, vals, dims, onehot_left=True, terms=3):
    """dot_general where one operand is an exact 0/1 one-hot matrix.

    NOTE `dims` is interpreted against the POST-SWAP operand order: with
    the default onehot_left=True it refers to (onehot, vals); with
    onehot_left=False it refers to (vals, onehot) — author dims for the
    order the operands actually take in the dot.

    The mixed-precision intent — a single bf16 pass on the 0/1 operand,
    full f32 fidelity on the values — cannot be expressed as a per-operand
    precision tuple: Mosaic rejects those on hardware
    (NotImplementedError: Per-operand dot precision unsupported). Built
    manually instead (onehot_dot_split3): `terms` native MXU passes
    (3 reproduces f32 products to ~2^-22; 2 to ~2^-15) vs
    HIGHEST/HIGHEST's 6-9. Interpret mode (CPU tests) runs one exact f32
    dot instead — EXCEPT at terms=2, where it runs the split (the
    approximation must be testable on CPU)."""
    if _interpret() and terms >= 3:
        a, b = (onehot, vals) if onehot_left else (vals, onehot)
        return jax.lax.dot_general(
            a, b, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    return onehot_dot_split3(onehot, vals, dims, onehot_left, terms)


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


def _n_chunks(n: int) -> int:
    return (n + C - 1) // C


def n_visits(n: int, grid_shape) -> int:
    """Static bound on the (chunk, tile) incidence count: on a sorted stream
    the per-chunk tile spans telescope, so
    sum(span lengths) <= n_chunks + n_tiles - 1."""
    n_tiles = (grid_shape[0] * grid_shape[1] * grid_shape[2]) // W
    return _n_chunks(n) + n_tiles


class VisitPlan(NamedTuple):
    """Flattened (chunk, tile) incidence list of a tile-sorted stream.

    tabs: (2*NV,) int32 scalar-prefetch table [packed | cv]: visit v reads
        particle chunk cv[v] against tile tv[v] = packed[v] & TV_MASK;
        packed bits 30/29 flag the first visit of each output tile / chunk
        block in visit order (packing keeps the whole table inside the
        ~1 MB SMEM budget at 256^3+, where 4 unpacked words per visit
        overflow it). Padding visits (beyond the real incidence count)
        repeat the last (tile, chunk) with both flags 0 and masked keys.
    lockeys: (1, NV*C) f32 per-visit TILE-LOCAL particle keys
        (key - tile*512); -1 for pad particles/visits so they match no
        one-hot row. Pre-localized on the XLA side because SMEM-scalar ->
        vector arithmetic inside the kernel is a measured Mosaic hazard.
        Stored flat with a leading 1 because Mosaic only accepts (1, C)
        blocks when the sublane dim equals the whole array's.
    """

    tabs: jnp.ndarray
    lockeys: jnp.ndarray


TV_BITS = 29
TV_MASK = (1 << TV_BITS) - 1   # tile ids: 512^3/512 = 2^18 tiles max
FLAG_TILE = 1 << 30            # first visit of this output TILE block
FLAG_CHUNK = 1 << 29           # first visit of this output CHUNK block


def pack_tabs(tv, cv, first_t, first_c):
    packed = (tv
              | first_t.astype(jnp.int32) * FLAG_TILE
              | first_c.astype(jnp.int32) * FLAG_CHUNK)
    return jnp.concatenate([packed, cv])


def plan_visits(key_s, n: int, grid_shape) -> VisitPlan:
    """Build the visit tables from sorted tile-major keys (all dense XLA:
    a cumsum, a searchsorted over ~NV elements, one (NV, C) row gather).

    Tiles not covered by any chunk span get one trailing visit each (with
    first_tile=1 and all-masked keys) so the scatter kernel zero-initializes
    EVERY output block — no tile-occupancy mask pass afterwards. Trailing
    pad visits repeat the last written block, never an earlier one, so a
    flushed accumulator is never revisited."""
    n_chunks = _n_chunks(n)
    n_tiles = (grid_shape[0] * grid_shape[1] * grid_shape[2]) // W
    nv = n_visits(n, grid_shape)
    spans = chunk_spans(key_s, n_chunks)
    t0, t1 = spans[:, 0], spans[:, 1]
    ln = t1 - t0 + 1
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(ln, dtype=jnp.int32)])
    total = off[n_chunks]

    vidx = jnp.arange(nv, dtype=jnp.int32)
    cv = jnp.clip(
        jnp.searchsorted(off, vidx, side="right").astype(jnp.int32) - 1,
        0, n_chunks - 1)
    tv = t0[cv] + (vidx - off[cv])
    valid = vidx < total
    tv = jnp.where(valid, tv, t1[n_chunks - 1])

    first_t = valid & jnp.concatenate(
        [jnp.ones((1,), bool), tv[1:] != tv[:-1]])
    first_c = valid & jnp.concatenate(
        [jnp.ones((1,), bool), cv[1:] != cv[:-1]])

    # ---- empty-tile visits: one per tile outside every chunk span ----
    delta = jnp.zeros((n_tiles + 1,), jnp.int32)
    delta = delta.at[t0].add(1).at[t1 + 1].add(-1)
    covered = jnp.cumsum(delta[:-1]) > 0
    uncov = ~covered
    n_uncov = jnp.sum(uncov.astype(jnp.int32))
    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    pos = jnp.where(
        uncov, total + jnp.cumsum(uncov.astype(jnp.int32)) - 1, nv)
    tv = tv.at[pos].set(tiles, mode="drop")
    first_t = first_t.at[pos].set(True, mode="drop")
    # pad visits (v >= total + n_uncov) repeat the LAST visited tile
    last_uncov = jnp.max(jnp.where(uncov, tiles, -1))
    pad_fill = jnp.where(n_uncov > 0, last_uncov, t1[n_chunks - 1])
    tv = jnp.where(vidx >= total + n_uncov, pad_fill, tv)

    pad = n_chunks * C - key_s.shape[0]
    kf = key_s.astype(jnp.float32)
    if pad:
        kf = jnp.concatenate([kf, jnp.full((pad,), -1.0, jnp.float32)])
    kc = kf.reshape(n_chunks, C)
    lk = jnp.take(kc, cv, axis=0) - (tv[:, None] * W).astype(jnp.float32)
    lk = jnp.where(valid[:, None], lk, -1.0)

    tabs = pack_tabs(tv, cv, first_t, first_c)
    return VisitPlan(tabs, lk.reshape(1, -1))


class TiledStream(NamedTuple):
    """Pass-A particle stream, sorted by tile-major home-cell key.

    payload: (NPAY, n_chunks*C) f32 rows [px,py,pz,vx,vy,vz,rank,gi,gj,gk]
        (absolute cell coords ride as rows so the kernels never derive
        vector values from SMEM scalars).
    key: (N,) int32 sorted keys; rank: (N,) int32 rank within cell.
    plan: VisitPlan for this ordering.
    sorted: tuple of (N,) sorted field arrays (px,py,pz,vx,vy,vz).
    """

    payload: jnp.ndarray
    key: jnp.ndarray
    rank: jnp.ndarray
    plan: VisitPlan
    sorted: tuple

    @property
    def n(self) -> int:
        return self.key.shape[0]


def stale_payload(pos, vel, key, grid_shape):
    """(NPAY, n_chunks*C) scatter payload from CURRENT-ordered (unsorted)
    arrays for the stale pass A: rank row is zero (the scatter computes
    ranks in-kernel); gi/gj/gk decode the current keys."""
    n = pos.shape[0]
    gi, gj, gk = decode_key(key, grid_shape)
    rows = [pos[:, 0], pos[:, 1], pos[:, 2],
            vel[:, 0], vel[:, 1], vel[:, 2],
            jnp.zeros((n,), jnp.float32), gi.astype(jnp.float32),
            gj.astype(jnp.float32), gk.astype(jnp.float32)]
    payload = jnp.stack(rows, axis=0)
    pad = _n_chunks(n) * C - n
    if pad:
        payload = jnp.pad(payload, ((0, 0), (0, pad)))
    return payload


def tiled_sort(pos, vel, dx, grid_shape) -> TiledStream:
    """ONE lax.sort per substep + rank scan + visit plan."""
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
    # cummax, not associative_scan: the generic scan hangs this round's XLA
    # compile at 4M elements (see ops/buckets.py note).
    run_start = lax.cummax(jnp.where(new_run, idx, 0))
    rank = idx - run_start

    gi, gj, gk = decode_key(key_s, grid_shape)
    rows = [ops[1], ops[2], ops[3], ops[4], ops[5], ops[6],
            rank.astype(jnp.float32), gi.astype(jnp.float32),
            gj.astype(jnp.float32), gk.astype(jnp.float32)]
    pad = _n_chunks(n) * C - n
    payload = jnp.stack(rows, axis=0)
    if pad:
        payload = jnp.pad(payload, ((0, 0), (0, pad)))

    plan = plan_visits(key_s, n, grid_shape)
    return TiledStream(payload, key_s, rank, plan, tuple(ops[1:]))


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


def stack_tile_major(cols, grid_shape):
    """F (I, J, K) column grids -> (n_tiles, W, F) tile-major image.

    Stacks on a LEADING axis and relayouts with ONE 7D transpose. Never
    stack grid-sized columns on a trailing axis: XLA materializes each
    (I, J, K, 1) operand tile-padded 128x on this chip — the 108-column
    trailing stack at 128^3 compiled to 109 GB of HLO temps and OOM'd the
    16 GB HBM (hardware, round 4).

    The optimization_barrier after the stack is load-bearing on the same
    grounds: without it XLA sinks the downstream f-minor layout INTO the
    concatenate, so every operand materializes as f32[1, nt,8, nt,8, nt,8]
    with the size-1 f axis on the 128-lane dim — 128x padding again
    (108 x 1 GB of HLO temps at 128^3, hardware, round 4). The barrier pins
    the stacked (F, I, J, K) array to its natural K-minor layout; only the
    single transpose after it pays the f-minor padding (f -> 128, <1.2x at
    f=108)."""
    f = len(cols)
    nt = tile_counts(grid_shape)
    x = jnp.stack(cols, axis=0)  # (F, I, J, K): no trailing-1 padding
    x = lax.optimization_barrier(x)
    x = x.reshape(f, nt[0], TILE[0], nt[1], TILE[1], nt[2], TILE[2])
    x = x.transpose(1, 3, 5, 2, 4, 6, 0)
    return x.reshape(nt[0] * nt[1] * nt[2], W, f)


def stack_tile_major_fw(cols, grid_shape, i_slabs=None, dtype=jnp.float32):
    """F (I, J, K) column grids -> (n_tiles, F, W) F-MAJOR tile image.

    dtype=bf16 stores the image (and runs the whole relayout) at half
    width: the gather kernels then contract it in ONE native MXU pass
    (the bf16 values ARE the operand — no _split3 terms), halving both
    the column DMA and the relayout traffic. Sample values round to
    bf16 (~2^-9 relative); see config.pallas_gather_dtype for the
    measured accuracy story.

    The gather kernels' column layout. vs the (n_tiles, W, F) form: the
    minor dim is W=512 (full lanes), so F pads only to a sublane multiple
    of 8 — 1.04x at F=108 — where the W-major form pads F to 128 lanes
    (1.19x at 108, 4x at cap*4=32, and a fatal 8 GB at 256^3). Same
    optimization_barrier rule as stack_tile_major.

    F pads to a sublane multiple of 8 by APPENDING ZERO GRIDS to the
    stack, not jnp.pad after it: at 256^3 XLA materialized the pad (and
    its operand copy) in an F-minor layout — 54 lanes tile-pad to 128,
    two 8 GB HLO temps for a 3.4 GB image (hardware OOM, round 5).

    i_slabs > 1 bounds the relayout the same way p2g_combine's does: the
    7D transpose runs per I-slab on an iteration-dependent dynamic slice
    inside lax.fori_loop, so XLA cannot hoist/CSE the slab transposes
    into one whole-array F-minor copy (see p2g_combine's docstring for
    why the loop is essential, not style). None: auto — 8 slabs at
    >= 2^24 cells, else 1 (the fused path, unchanged at bench scale)."""
    f = len(cols)
    nt = tile_counts(grid_shape)
    f_pad = -(-f // 8) * 8
    cols = [c.astype(dtype) for c in cols]
    if f_pad != f:
        cols = cols + [jnp.zeros(grid_shape, dtype)] * (f_pad - f)
    x = jnp.stack(cols, axis=0)  # (f_pad, I, J, K): no trailing-1 padding
    x = lax.optimization_barrier(x)
    if i_slabs is None:
        big = grid_shape[0] * grid_shape[1] * grid_shape[2] >= (1 << 24)
        i_slabs = 8 if (big and nt[0] % 8 == 0) else 1

    def relayout(xs, nti):
        xs = xs.reshape(f_pad, nti, TILE[0], nt[1], TILE[1], nt[2], TILE[2])
        xs = xs.transpose(1, 3, 5, 0, 2, 4, 6)
        return xs.reshape(nti * nt[1] * nt[2], f_pad, W)

    if i_slabs == 1:
        return relayout(x, nt[0])

    per_t = nt[0] // i_slabs           # tile-rows per slab
    tiles_per = per_t * nt[1] * nt[2]

    def body(s, out):
        slab = lax.dynamic_slice_in_dim(
            x, s * per_t * TILE[0], per_t * TILE[0], axis=1)
        return lax.dynamic_update_slice_in_dim(
            out, relayout(slab, per_t), s * tiles_per, 0)

    return lax.fori_loop(
        0, i_slabs, body,
        jnp.zeros((nt[0] * nt[1] * nt[2], f_pad, W), dtype))


def from_tile_major(y, grid_shape):
    """(n_tiles, W, F) -> (I, J, K, F) (XLA transpose; see detile)."""
    f = y.shape[-1]
    nt = tile_counts(grid_shape)
    y = y.reshape(nt[0], nt[1], nt[2], TILE[0], TILE[1], TILE[2], f)
    y = y.transpose(0, 3, 1, 4, 2, 5, 6)
    return y.reshape(grid_shape[0], grid_shape[1], grid_shape[2], f)


def detile(y, grid_shape):
    """(n_tiles, W, F) -> (I, J, K, F) as a Pallas copy kernel.

    XLA lowers from_tile_major's 7D transpose at ~18 ns per CELL on this
    chip — 38 ms at 128^3, identical for 64 and 172 lanes (hardware,
    round 4) — while the actual traffic is worth ~1-3 ms. Here each tile
    is one grid step: the input block is the tile's (W, F) rows, the
    output block the (8, 8, 8, F) cube, and the (W, F) -> (8, 8, 8, F)
    reshape is metadata-only (identical linearization), so the kernel is
    a pure block copy at DMA speed."""
    f = y.shape[-1]
    nt = tile_counts(grid_shape)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[0].reshape(TILE[0], TILE[1], TILE[2], f)

    return pl.pallas_call(
        kernel,
        grid=(nt[0], nt[1], nt[2]),
        in_specs=[pl.BlockSpec(
            (1, W, f),
            lambda i, j, k: ((i * nt[1] + j) * nt[2] + k, 0, 0))],
        out_specs=pl.BlockSpec(
            (TILE[0], TILE[1], TILE[2], f), lambda i, j, k: (i, j, k, 0)),
        out_shape=jax.ShapeDtypeStruct(
            tuple(grid_shape) + (f,), y.dtype),
        interpret=_interpret(),
    )(y)


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

def _p2g_chunk_values(data, local, dx):
    """data: (NPAY, C) payload block, local: (1, C) tile-local keys
    -> (m1 (W, C) cell one-hot, vals (N_P2G, C) Wyvill weight/momentum
    lanes)."""
    px, py, pz = data[0:1], data[1:2], data[2:3]
    vx, vy, vz = data[3:4], data[4:5], data[5:6]
    gi, gj, gk = data[7:8], data[8:9], data[9:10]

    sub_w = jax.lax.broadcasted_iota(
        jnp.int32, (W, C), 0).astype(jnp.float32)
    m1 = jnp.where(local == sub_w, 1.0, 0.0)

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
    return m1, jnp.concatenate([wgt, wgt * vsel], axis=0)


SUML = 112  # folded sums lanes per cell: N_P2G=108 padded to a multiple
            # of 16 so the (8, 8, 8*SUML) block's 896-lane minor dim stays
            # 128-aligned. NOT 128: the extra 16 lanes/cell are 1.07 GB of
            # pure pad at 256^3 — the margin the config-4 step OOM'd by
            # (15.88 of 15.75 G, round 5) — and 12.5% extra MACs in the
            # folded scatter dot.


def _p2g_chunk_values_folded(data, local, dx):
    """K-folded variant of _p2g_chunk_values, shaped for a direct
    (8, 8, 8*SUML) sums block (the >= 2^24-cell memory shape).

    Same Mosaic constraint as _table_chunk_values: the (W, N_P2G) dot
    result cannot shape-cast to a K-folded block in-kernel, so the cell
    one-hot splits into the (li, lj) sublane pair (a64, 64 x C) and the
    lk factor folds into the value operand: lane t = lk*SUML + f carries
    lane f's Wyvill factor gated on lk_p == lk (zero for f >= 108). The
    dot yields (64, 8*SUML) — a pure sublane-split reshape from the
    block. MACs grow 64*1024/512/108 = 1.19x over the unfolded dot;
    only grids >= 2^24 cells pay it."""
    px, py, pz = data[0:1], data[1:2], data[2:3]
    vx, vy, vz = data[3:4], data[4:5], data[5:6]
    gi, gj, gk = data[7:8], data[8:9], data[9:10]

    sub64 = jax.lax.broadcasted_iota(
        jnp.int32, (TILE[0] * TILE[1], C), 0).astype(jnp.float32)
    row64 = jnp.floor(local * (1.0 / TILE[2]))
    a64 = jnp.where(row64 == sub64, 1.0, 0.0)
    lk_p = local - row64 * TILE[2]                    # (1, C)

    lane_t = jax.lax.broadcasted_iota(
        jnp.int32, (TILE[2] * SUML, C), 0)
    lkk = (lane_t // SUML).astype(jnp.float32)
    f = lane_t % SUML
    f54 = f % 54
    comp = f54 // 18
    oidx = f54 % 18
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
    r2 = jnp.float32(dx * dx)
    c1 = jnp.float32((4.0 / 9.0) / dx**6)
    c2 = jnp.float32((17.0 / 9.0) / dx**4)
    c3 = jnp.float32((22.0 / 9.0) / dx**2)
    wgt = 1.0 - c1 * d2 * d2 * d2 + c2 * d2 * d2 - c3 * d2
    wgt = jnp.where(d2 < r2, wgt, 0.0)
    vsel = is_u * vx + is_v * vy + is_w * vz
    val = jnp.where(f < 54, wgt, wgt * vsel)
    rv = jnp.where((f < 2 * 54) & (lk_p == lkk), val, 0.0)
    return a64, rv


def _table_chunk_values(data, local, rank, cap, with_counts, capl=None):
    """SDF table factors, shaped for a direct (8, 8, 8*capl) block.

    The obvious (W, cap4) dot result cannot reshape to the K-folded
    (8, 8, 8*cap4) output block in-kernel (the minor dim changes, a
    Mosaic relayout: "infer-vector-layout: unsupported shape cast" on
    hardware). Split the cell one-hot instead: a (64, C) one-hot over the
    (li, lj) sublane pair on the left, and the lk factor folded into the
    slot-value operand, so the dot yields (64, 8*capl) — a pure
    sublane-split reshape away from the block. Same MACs.

    with_counts appends a count lane at cap*4 (counts EVERY particle
    homed in the cell regardless of rank — the in-kernel rank's
    cross-visit base and the rank-overflow diagnostic). capl may be
    padded past cap*4 (+count): Mosaic requires the (8, 8, 8*capl) out
    block's minor dim divisible by 128, i.e. capl % 16 == 0; the pad
    lanes stay zero. Returns (a64 (64, C), rv (8*capl, C))."""
    px, py, pz = data[0:1], data[1:2], data[2:3]
    if capl is None:
        capl = cap * 4 + (8 if with_counts else 0)
    sub64 = jax.lax.broadcasted_iota(
        jnp.int32, (TILE[0] * TILE[1], C), 0).astype(jnp.float32)
    row64 = jnp.floor(local * (1.0 / TILE[2]))
    a64 = jnp.where(row64 == sub64, 1.0, 0.0)
    lk_p = local - row64 * TILE[2]                    # (1, C)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (TILE[2] * capl, C), 0)
    lkk = (lane_t // capl).astype(jnp.float32)
    ll = lane_t % capl
    r_ = (ll // 4).astype(jnp.float32)
    f_ = ll % 4
    val = jnp.where(
        f_ == 0, px,
        jnp.where(f_ == 1, py, jnp.where(f_ == 2, pz, 1.0)))
    hit = (ll < cap * 4) & (rank == r_)
    if with_counts:
        val = jnp.where(ll == cap * 4, 1.0, val)
        hit = hit | (ll == cap * 4)
    rv = jnp.where(hit & (lk_p == lkk), val, 0.0)
    return a64, rv


def _rank_from_accumulator(a64, local, tbl2d, cap, capl=None):
    """Per-particle within-cell rank for the stale-ordering scatter:
    cross-visit base read from the accumulator's count lanes (one-hot MXU
    contractions) + a within-chunk strict prefix computed as a VPU
    broadcast-compare over the chunk's keys in BOTH layouts — a (C, 1)
    key column from one in-kernel XLU transpose vs the (1, C) stream.

    The prefix is the whole cost story: the round-5 first cut contracted
    a (W, C) cell one-hot against strict-lower matrices (~36M MAC/visit),
    which measured 147 ms/substep at 128^3/4.1M vs the sorted scatter's
    41.6 and made the stale pass A a net LOSS (bench 2.106 vs 2.803).
    The compare form is ~0.5M VPU ops/visit: rank_j = #{i<j :
    key_i == key_j} needs no W contraction at all once the keys exist
    along sublanes. Two dead ends recorded: shipping the column from
    XLA as an (nv*C, 1) operand tile-pads 128x in HBM (7.4 GB — the
    round-4 minor-dim trap), and an MXU identity-transpose costs a full
    128-lane pass (C*C*128 MAC, as bad as the contraction it replaces);
    the XLU `lax.transpose` of the 128-sublane broadcast moves 256 KB of
    VMEM per visit and is Mosaic-native (tpu.transpose).

    a64 (64, C) sublane-pair one-hot, local (1, C) tile-local keys,
    tbl2d (64, 8*capl) the accumulated table block. Count-lane dots are
    terms=2 (exact to 2^16 counts). Pad/foreign rows carry out-of-tile
    keys, so they never equal a valid key and add nothing to valid
    prefixes."""
    if capl is None:
        capl = cap * 4 + 8
    # ---- cross-visit base: count lane per cell, factored (sub64, lk) ----
    li = jax.lax.broadcasted_iota(jnp.int32, (TILE[2] * capl, 8), 0)
    ki = jax.lax.broadcasted_iota(jnp.int32, (TILE[2] * capl, 8), 1)
    e = jnp.where(li == ki * capl + cap * 4, 1.0, 0.0)
    cnt64 = onehot_dot(                              # (64, 8)
        e, tbl2d, (((1,), (0,)), ((), ())), onehot_left=False, terms=2)
    row64 = jnp.floor(local * (1.0 / TILE[2]))
    lk_p = local - row64 * TILE[2]
    k8 = jax.lax.broadcasted_iota(
        jnp.int32, (TILE[2], C), 0).astype(jnp.float32)
    lk1 = jnp.where(lk_p == k8, 1.0, 0.0)            # (8, C)
    t1 = onehot_dot(                                 # (64, C)
        lk1, cnt64, (((1,), (0,)), ((), ())), onehot_left=False, terms=2)
    base_p = jnp.sum(a64 * t1, axis=0, keepdims=True)   # (1, C)

    # ---- within-chunk strict prefix: (C, C) broadcast-compare ----
    localT = jax.lax.transpose(
        jnp.broadcast_to(local, (128, C)), (1, 0))[:, 0:1]   # (C, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    eq = jnp.where((localT == local) & (ii < jj), 1.0, 0.0)
    pref = jnp.sum(eq, axis=0, keepdims=True)           # (1, C)
    return base_p + pref


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_shape", "dx", "cap", "terms", "inkernel_rank", "fold_sums"))
def scatter_p2g_table(tabs, lockeys, payload, grid_shape, dx, cap,
                      terms=3, inkernel_rank=False, fold_sums=None):
    """-> (sums, table (I, J, K*capl)).

    sums is (I, J, K, N_P2G) standard 4D, or — when fold_sums (auto: at
    >= 2^24 cells) — K-folded (I, J, K*SUML) with SUML=128 pad lanes.

    One grid step per (chunk, tile) visit: the chunk payload and the tile
    accumulator are both selected by prefetched index maps; the one-hot
    matmul adds the chunk's contribution. Particle-free tiles are zeroed by
    the plan's empty-tile visits, so no occupancy-mask pass runs after.

    BOTH outputs are written in STANDARD layout straight from the kernel:
    the (W, F) accumulator value reshapes to (8, 8, 8, F) / (64, 8*capl)
    to (8, 8, 8*capl) without data movement (identical linearization), and
    the out BlockSpecs decode the visit's tile id in their index maps.
    This deletes the old from_tile_major relayouts entirely (37.4 ms
    measured for 172 lanes at 128^3, ~11x its traffic floor — hardware,
    round 4). The SDF table's capl lanes FOLD INTO the K axis
    ((I, J, K*capl), minor dim always a lane multiple) rather than sit on
    their own trailing axis: a trailing axis of 32 lanes pads 4x to 128
    on this chip, which at 256^3 was a fatal 8 GB for a 2 GB table plus
    another 8 GB for its detile (hardware OOM, round 5); the folded form
    is unpadded and needs no detile kernel at all. capl rounds up to a
    16-multiple (Mosaic: the folded out block's minor dim 8*capl must be
    divisible by 128 — without the pad, inkernel_rank's cap*4+8 raw capl
    is lowering-rejected at any cap not on the 16 grid).

    fold_sums applies the same K-fold to the sums output, padded to
    SUML=128 lanes/cell. The point is not the padding (8 GB either way
    at 256^3) but LAYOUT CONTAINMENT: against the 4D form, XLA's layout
    assignment propagates the combine's lane-major preference through
    p2g_combine's slices onto the whole array — one 6.75 GB transposed
    copy live next to this kernel's 8 GB output (the round-5 256^3 OOM
    that survived both slab-chunking and optimization_barrier). A 3D
    K-folded source has no lane axis to re-lay, so the transpose can
    only materialize per combine slab. Off (the default under 2^24
    cells), the bench-scale path is byte-identical to round 4.

    inkernel_rank=True is the stale-ordering pass-A mode (tabs/lockeys
    from plan_pass_a's ScatterPlan, payload rank row ignored): within-cell
    ranks are computed per visit from the accumulator's count lanes plus a
    VPU broadcast-compare prefix over the chunk keys in both layouts
    (_rank_from_accumulator; the key column comes from one in-kernel XLU
    transpose), so the input needs NO sorted stream at all. capl grows from cap*4 to cap*4+8 (the
    count lanes; table_fields skips them, table_rank_overflow reads
    them)."""
    nv = lockeys.shape[1] // C
    nt = tile_counts(grid_shape)
    dxf = float(dx)
    capl = -(-(cap * 4 + (8 if inkernel_rank else 0)) // 16) * 16
    if fold_sums is None:
        fold_sums = (
            grid_shape[0] * grid_shape[1] * grid_shape[2]) >= (1 << 24)

    def kernel(tabs_ref, lk_ref, pay_ref, sums_ref, tbl_ref):
        v = pl.program_id(0)

        @pl.when((tabs_ref[v] & FLAG_TILE) != 0)
        def _zero():
            sums_ref[:] = jnp.zeros_like(sums_ref)
            tbl_ref[:] = jnp.zeros_like(tbl_ref)

        local = lk_ref[:]
        dims = (((1,), (1,)), ((), ()))
        if fold_sums:
            a64s, rvs = _p2g_chunk_values_folded(pay_ref[:], local, dxf)
            sums_ref[...] += onehot_dot(
                a64s, rvs, dims, terms=terms).reshape(
                    TILE[0], TILE[1], TILE[2] * SUML)
        else:
            m1, wv = _p2g_chunk_values(pay_ref[:], local, dxf)
            sums_ref[...] += onehot_dot(m1, wv, dims, terms=terms).reshape(
                TILE[0], TILE[1], TILE[2], N_P2G)
        if inkernel_rank:
            tbl2d = tbl_ref[...].reshape(TILE[0] * TILE[1], TILE[2] * capl)
            sub64 = jax.lax.broadcasted_iota(
                jnp.int32, (TILE[0] * TILE[1], C), 0).astype(jnp.float32)
            a64 = jnp.where(
                jnp.floor(local * (1.0 / TILE[2])) == sub64, 1.0, 0.0)
            rank = _rank_from_accumulator(a64, local, tbl2d, cap, capl)
        else:
            rank = pay_ref[6:7]
        a64, rv = _table_chunk_values(
            pay_ref[:], local, rank, cap, inkernel_rank, capl)
        tbl_ref[...] += onehot_dot(a64, rv, dims, terms=terms).reshape(
            TILE[0], TILE[1], TILE[2] * capl)

    def tbl_idx(v, t):
        tile = t[v] & TV_MASK
        return (tile // (nt[1] * nt[2]), (tile // nt[2]) % nt[1],
                tile % nt[2])

    if fold_sums:
        sums_spec = pl.BlockSpec((TILE[0], TILE[1], TILE[2] * SUML), tbl_idx)
        sums_shape = jax.ShapeDtypeStruct(
            (grid_shape[0], grid_shape[1], grid_shape[2] * SUML),
            jnp.float32)
    else:
        def sums_idx(v, t):
            tile = t[v] & TV_MASK
            return (tile // (nt[1] * nt[2]), (tile // nt[2]) % nt[1],
                    tile % nt[2], 0)

        sums_spec = pl.BlockSpec(
            (TILE[0], TILE[1], TILE[2], N_P2G), sums_idx)
        sums_shape = jax.ShapeDtypeStruct(
            tuple(grid_shape) + (N_P2G,), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((1, C), lambda v, t: (0, v)),
            pl.BlockSpec((NPAY, C), lambda v, t: (0, t[nv + v])),
        ],
        out_specs=[
            sums_spec,
            pl.BlockSpec((TILE[0], TILE[1], TILE[2] * capl), tbl_idx),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            sums_shape,
            jax.ShapeDtypeStruct(
                (grid_shape[0], grid_shape[1], grid_shape[2] * capl),
                jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tabs, lockeys, payload)


def table_fields(tbl_std, grid_shape, cap):
    """(I, J, K*capl) expanded table -> [(cap, n_cells) px,py,pz]
    with FAR empties (the liquid-SDF sweep's slot-major layout). capl is
    inferred from the shape: cap*4, or cap*4+8 when the scatter ran with
    inkernel_rank (the count lanes are skipped here)."""
    n_cells = grid_shape[0] * grid_shape[1] * grid_shape[2]
    slots = tbl_std.shape[2] // grid_shape[2] // 4
    tbl = tbl_std.reshape(*grid_shape, slots, 4)
    tbl = jnp.moveaxis(tbl, 3, 0).reshape(slots, n_cells, 4)[:cap]
    occ = tbl[..., 3] > 0.5
    return tuple(
        jnp.where(occ, tbl[..., f], FAR) for f in range(3))


def table_rank_overflow(tbl_std, grid_shape, cap):
    """Particles beyond `cap` in one cell (dropped from the SDF table), from
    the inkernel_rank count lanes: sum over cells of max(count - cap, 0)."""
    capl = tbl_std.shape[2] // grid_shape[2]
    counts = tbl_std.reshape(
        *grid_shape, capl)[..., cap * 4]
    return jnp.sum(jnp.maximum(counts - cap, 0.0)).astype(jnp.int32)


def _combine_cells(sums, face_shapes, lane_leading=False):
    """The shifted-accumulation body of p2g_combine on one cell block.
    lane_leading=True reads lanes as sums[lane] (pre-transposed input)."""
    from .grids import shifted_read

    def lane_of(idx):
        return sums[idx] if lane_leading else sums[..., idx]

    acc = []
    for comp in range(3):
        fs = face_shapes[comp]
        vs = jnp.zeros(fs, jnp.float32)
        ws = jnp.zeros(fs, jnp.float32)
        for oidx in range(18):
            o = p2g_abs_offset(comp, oidx)
            neg = tuple(-v for v in o)
            lane = comp * 18 + oidx
            ws = ws + shifted_read(lane_of(lane), neg, fs)
            vs = vs + shifted_read(lane_of(54 + lane), neg, fs)
        acc.append((vs, ws))
    return acc


def p2g_combine(sums, grid_shape, face_shapes, i_slabs=None):
    """Per-cell P2G sums -> [(val_sum, w_sum)] per component, by static
    shifted accumulation (face f = cell + offset receives the cell's
    sums), exactly like ops/stream_transfers.p2g_sdf_stream's second half.
    `sums` is the scatter kernel's K-folded (I, J, K*108) output (a 4D
    (I, J, K, 108) form is also accepted and folded for free).

    The per-lane shifted reads make XLA materialize a LANE-MAJOR copy of
    `sums` — 6.75 GB live next to the kernel's 8 GB output at 256^3
    (hardware OOM, round 5). i_slabs > 1 bounds that copy at one i-slab:
    a lax.fori_loop dynamic-slices a (bw+2)-row window (the offsets reach
    +-1), transposes it lane-leading IN the body, and pastes the owned
    face rows. The loop is essential, not style: a static python loop's
    per-slab transposes are transpose(slice(sums)) expressions that XLA
    rewrites to slice(transpose(sums)) and CSEs into ONE whole-array
    lane-major copy (observed on hardware at 256^3, both with and without
    an optimization_barrier on the slice); a transpose of an
    iteration-dependent dynamic-slice cannot be hoisted. u-grid rows
    overlap one row per slab seam (both slabs compute it completely —
    idempotent paste) so the body is iteration-uniform. None: auto — 8
    slabs at >= 2^24 cells, else 1 (the fused path, unchanged at bench
    scale)."""
    isz = grid_shape[0]
    if sums.ndim == 4:
        sums = sums.reshape(grid_shape[0], grid_shape[1], -1)
    if i_slabs is None:
        big = grid_shape[0] * grid_shape[1] * grid_shape[2] >= (1 << 24)
        i_slabs = 8 if (big and isz % 8 == 0) else 1
    if i_slabs == 1:
        return _combine_cells(
            sums.reshape(*grid_shape, -1), face_shapes)

    bw = isz // i_slabs
    win = bw + 2
    local_fs = (
        (win + 1,) + face_shapes[0][1:],
        (win,) + face_shapes[1][1:],
        (win,) + face_shapes[2][1:],
    )

    def body(s, out):
        i0 = s * bw
        start = jnp.clip(i0 - 1, 0, isz - win)
        off = i0 - start  # 0 on the first slab, 2 on the last, else 1
        slab = lax.dynamic_slice_in_dim(sums, start, win, axis=0)
        cell = jnp.moveaxis(
            slab.reshape(win, grid_shape[1], grid_shape[2], -1), -1, 0)
        part = _combine_cells(cell, local_fs, lane_leading=True)
        new = []
        for comp in range(3):
            # owned face rows [i0, i0+bw) — plus, for the u grid, row
            # i0+bw, which the window computes completely (cells i0+bw-1
            # and i0+bw are both inside it); the next slab repastes the
            # same complete value
            rows = bw + (1 if comp == 0 else 0)
            pv, pw = part[comp]
            vs, ws = out[2 * comp], out[2 * comp + 1]
            new.append(lax.dynamic_update_slice_in_dim(
                vs, lax.dynamic_slice_in_dim(pv, off, rows, 0), i0, 0))
            new.append(lax.dynamic_update_slice_in_dim(
                ws, lax.dynamic_slice_in_dim(pw, off, rows, 0), i0, 0))
        return tuple(new)

    init = []
    for fs in face_shapes:
        init += [jnp.zeros(fs, jnp.float32), jnp.zeros(fs, jnp.float32)]
    out = lax.fori_loop(0, i_slabs, body, tuple(init))
    return [(out[0], out[1]), (out[2], out[3]), (out[4], out[5])]


def liquid_sdf_from_fields(fields, grid_shape, dx, radius, solid_center_phi,
                           finalize=True):
    """27-offset dense min sweep over the expanded position table
    (particlelevelset.cpp:77-139), reusing the table engine's sweep.
    finalize=False skips the solid extrapolation (slab pipeline: fold halo
    mins across shards first)."""
    from .buckets import BucketTable
    from .particle_grid import liquid_sdf_from_particles

    stub = BucketTable(fields, (), None, None, jnp.int32(0))
    return liquid_sdf_from_particles(
        stub, grid_shape, dx, radius, solid_center_phi, finalize=finalize)


# ---------------------------------------------------------------------------
# gather kernel: per-particle rows of per-cell stacked columns
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "f_logical"))
def gather_rows(tabs, lockeys, cols_fw, n, f_logical=None):
    """Per-particle rows cols[key] for tile-sorted keys.

    tabs/lockeys: the stream's VisitPlan; cols_fw: (n_tiles, F, W)
    F-major tile columns (stack_tile_major_fw — NOTE that helper pads F to
    a sublane multiple of 8, so F here may already be wider than the
    caller's logical column count). Returns (N, f_logical) f32 rows;
    f_logical defaults to the input's F, so pass the pre-pad column count
    to slice the zero pad lanes off. One grid step per visit: the tile's
    column block rides in via the tv index map, the chunk's output rows
    accumulate under the cv map (first-visit zeroed)."""
    nv = lockeys.shape[1] // C
    n_chunks = _n_chunks(n)
    n_tiles, f_in, _ = cols_fw.shape
    n_cols_logical = f_in if f_logical is None else f_logical
    n_cols = -(-f_in // 8) * 8
    if n_cols != f_in:
        cols_fw = jnp.pad(
            cols_fw, ((0, 0), (0, n_cols - f_in), (0, 0)))
    # output rows keep F on the lane dim (the caller wants (N, F))
    n_cols_out = -(-n_cols // ALIGN) * ALIGN

    def kernel(tabs_ref, lk_ref, cols_ref, out_ref):
        v = pl.program_id(0)

        @pl.when((tabs_ref[v] & FLAG_CHUNK) != 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        sub_w = jax.lax.broadcasted_iota(
            jnp.int32, (W, C), 0).astype(jnp.float32)
        m1 = jnp.where(lk_ref[:] == sub_w, 1.0, 0.0)
        # contract W on both operands with the one-hot LEFT: the result is
        # (C, F) directly — no in-kernel transpose (a Mosaic relayout)
        rows_cf = onehot_dot(
            m1, cols_ref[0], (((0,), (1,)), ((), ())))     # (C, F)
        pad_f = n_cols_out - n_cols
        if pad_f:
            rows_cf = jnp.pad(rows_cf, ((0, 0), (0, pad_f)))
        out_ref[0] += rows_cf

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((1, C), lambda v, t: (0, v)),
            pl.BlockSpec((1, n_cols, W), lambda v, t: (t[v] & TV_MASK, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, C, n_cols_out), lambda v, t: (t[nv + v], 0, 0)),
    )
    rows = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks, C, n_cols_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tabs, lockeys, cols_fw)
    return rows.reshape(n_chunks * C, n_cols_out)[:n, :n_cols_logical]


# ---------------------------------------------------------------------------
# MAC sampling via gathered columns (G2P, RK2 stage 2)
# ---------------------------------------------------------------------------

def build_mac_columns(grids_u, grids_v, grids_w, grid_shape,
                      dtype=jnp.float32):
    """(n_tiles, F, W) F-MAJOR per-cell columns, GRID-MAJOR lane order:
    lane (g*3 + comp)*18 + oidx — grid g of component comp at window
    offset oidx (p2g_abs_offset layout). Matches
    ops/stream_transfers.sample_mac_at's column set.

    Grid-major (not comp-major) so that rows [:54] are exactly grid 0's
    columns: pass B samples only the post-solve grids, and a sublane
    PREFIX slice of the pass-A image is free, where the old comp-major
    order made pass B gather all 108 lanes for its 54 (2x DMA + MXU,
    ~20 ms/substep at 128^3)."""
    from .grids import shifted_read

    comp_grids = (grids_u, grids_v, grids_w)
    n_grids = len(grids_u)
    cols = []
    for g in range(n_grids):
        for comp in range(3):
            for oidx in range(18):
                o = p2g_abs_offset(comp, oidx)
                cols.append(shifted_read(comp_grids[comp][g], o, grid_shape))
    return stack_tile_major_fw(cols, grid_shape, dtype=dtype)


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
                lane = (g * 3 + comp) * 18 + oidx   # grid-major lane order
                out = out + w * rows[:, lane]
            if valid is not None:
                out = jnp.where(valid, out, 0.0)
            outs[comp].append(out)
    return outs


# ---------------------------------------------------------------------------
# fused gather + trilinear MAC combine (G2P without the (N, F) rows buffer)
# ---------------------------------------------------------------------------

GOUT = 8   # padded output sublanes; real rows = 3 * n_grids


def gather_payload(px, py, pz, keys, grid_shape):
    """(6, n_chunks*C) f32 [px,py,pz,gi,gj,gk] rows for gather_mac, from
    stream-ordered positions and their sorted tile-major keys."""
    gi, gj, gk = decode_key(keys, grid_shape)
    rows = jnp.stack(
        [px, py, pz, gi.astype(jnp.float32), gj.astype(jnp.float32),
         gk.astype(jnp.float32)], axis=0)
    pad = _n_chunks(px.shape[0]) * C - px.shape[0]
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    return rows


def _trilinear_weightsT(pay, dx, n_grids, f):
    """(f, C) per-(lane, particle) trilinear corner weights.

    Lane layout matches build_mac_columns: lane = (g*3+comp)*18+oidx
    (grid-major, as decoded below).
    Reproduces combine_mac_samples' math (macvelocityfield.cpp:455-578) with
    the lane decomposition done as f32 select arithmetic (Mosaic-safe)."""
    px, py, pz = pay[0:1], pay[1:2], pay[2:3]
    gi, gj, gk = pay[3:4], pay[4:5], pay[5:6]

    lane = jax.lax.broadcasted_iota(jnp.int32, (f, C), 0)
    comp = (lane // 18) % 3          # grid-major: lane = (g*3+comp)*18+oidx
    oidx = lane % 18
    ox = (oidx // 9).astype(jnp.float32)
    oy = ((oidx // 3) % 3 - 1).astype(jnp.float32)
    oz = (oidx % 3 - 1).astype(jnp.float32)
    is_u = (comp == 0).astype(jnp.float32)
    is_v = (comp == 1).astype(jnp.float32)
    is_w = (comp == 2).astype(jnp.float32)
    o_x = is_u * ox + is_v * oy + is_w * oy
    o_y = is_u * oy + is_v * ox + is_w * oz
    o_z = is_u * oz + is_v * oz + is_w * ox
    off_x = 0.5 * (1.0 - is_u)
    off_y = 0.5 * (1.0 - is_v)
    off_z = 0.5 * (1.0 - is_w)

    def axis_w(p, g, off, o_ax):
        fr = p / dx - off
        b = jnp.floor(fr)
        frac = fr - b
        corner = o_ax - (b - g)
        return jnp.where(
            corner == 0.0, 1.0 - frac,
            jnp.where(corner == 1.0, frac, 0.0))

    return (axis_w(px, gi, off_x, o_x) * axis_w(py, gj, off_y, o_y)
            * axis_w(pz, gk, off_z, o_z))


@functools.partial(
    jax.jit, static_argnames=("n", "dx", "n_grids", "terms"))
def gather_mac(tabs, lockeys, pay, cols_tm, n, dx, n_grids, terms=3):
    """Fused G2P: per-particle MAC samples without materializing rows.

    pay: (6, n_chunks*C) gather_payload rows; cols_tm: (n_tiles, F, W)
    build_mac_columns output in F-major tile layout (full 512-lane rows,
    F on the sublane dim — pads to a multiple of 8, not 128). Returns
    (GOUT, n_chunks*C) f32 in GRID-MAJOR row order: row g*3 + comp is
    grid g's sampled component comp (rows >= 3*n_grids are zero). Per
    visit: the one-hot gather,
    the trilinear weight matrix, and an (8, F) one-hot lane-group
    contraction all stay in VMEM — the (N, F) row buffer of
    gather_rows+combine_mac_samples (1.7 GB at 128^3/4.1M, 8.6 GB at 256^3)
    never exists."""
    nv = lockeys.shape[1] // C
    n_chunks = _n_chunks(n)
    n_cols_logical = cols_tm.shape[1]
    f = -(-n_cols_logical // 8) * 8
    if f != n_cols_logical:
        cols_tm = jnp.pad(
            cols_tm, ((0, 0), (0, f - n_cols_logical), (0, 0)))
    if cols_tm.dtype == jnp.bfloat16:
        # the bf16 image IS the single exact term: one native MXU pass
        terms = 1
    dxf = float(dx)

    def kernel(tabs_ref, lk_ref, pay_ref, cols_ref, out_ref):
        v = pl.program_id(0)

        @pl.when((tabs_ref[v] & FLAG_CHUNK) != 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        sub_w = jax.lax.broadcasted_iota(
            jnp.int32, (W, C), 0).astype(jnp.float32)
        m1 = jnp.where(lk_ref[:] == sub_w, 1.0, 0.0)
        row_t = onehot_dot(
            m1, cols_ref[0], (((1,), (0,)), ((), ())),
            onehot_left=False, terms=terms)              # (F, C)
        w_t = _trilinear_weightsT(pay_ref[:], dxf, n_grids, f)
        r8 = jax.lax.broadcasted_iota(jnp.int32, (GOUT, f), 0)
        l8 = jax.lax.broadcasted_iota(jnp.int32, (GOUT, f), 1)
        g8 = jnp.where(
            (l8 // 18 == r8) & (l8 < 54 * n_grids), 1.0, 0.0)
        out_ref[:] += onehot_dot(
            g8, w_t * row_t, (((1,), (0,)), ((), ())))   # (GOUT, C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((1, C), lambda v, t: (0, v)),
            pl.BlockSpec((6, C), lambda v, t: (0, t[nv + v])),
            pl.BlockSpec((1, f, W), lambda v, t: (t[v] & TV_MASK, 0, 0)),
        ],
        out_specs=pl.BlockSpec((GOUT, C), lambda v, t: (0, t[nv + v])),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((GOUT, n_chunks * C), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tabs, lockeys, pay, cols_tm)
    return out[:, :n] if n_chunks * C != n else out


def sort_by_key(key, fields, grid_shape):
    """Plain tile-key sort for pass B: returns (key_s, sorted fields,
    VisitPlan for the new ordering)."""
    n = key.shape[0]
    ops = lax.sort((key,) + tuple(fields), num_keys=1, is_stable=True)
    key_s = ops[0]
    plan = plan_visits(key_s, n, grid_shape)
    return key_s, tuple(ops[1:]), plan


# ---------------------------------------------------------------------------
# packed narrow-row gather: F=8 rows without 16x lane-padding waste
# ---------------------------------------------------------------------------

PK_F = 8                  # packed row width (the pushback's 8 cell nodes)
PK_G = ALIGN // PK_F      # cells folded per 128-lane row
PK_R = W // PK_G          # sublane rows per tile block


def pack_cols8(cols_tm):
    """(n_tiles, W, 8) tile-major columns -> (n_tiles, W/16, 128): 16 cells'
    8-lane rows share one 128-lane vector row, so the per-visit DMA moves
    16 KB instead of the 256 KB a 128-padded (W, F) block would."""
    n_tiles = cols_tm.shape[0]
    return cols_tm.reshape(n_tiles, PK_R, ALIGN)


@functools.partial(jax.jit, static_argnames=("n",))
def gather_rows8(tabs, lockeys, cols_pk, n):
    """Per-particle 8-wide rows from pack_cols8 columns, any visit plan.

    Two one-hot contractions replace the wide gather: a (PK_R, C) row
    one-hot pulls each particle's packed 128-lane row onto the MXU, then an
    in-lane group select + an (8, 128) lane one-hot compact the particle's
    8 real lanes. Returns (8, n_chunks*C) f32 (slice [:, :n]); rows of
    unmatched particles (lockey -1 / uncovered plans) are zero."""
    nv = lockeys.shape[1] // C
    n_chunks = _n_chunks(n)

    def kernel(tabs_ref, lk_ref, cols_ref, out_ref):
        v = pl.program_id(0)

        @pl.when((tabs_ref[v] & FLAG_CHUNK) != 0)
        def _zero():
            out_ref[:] = jnp.zeros_like(out_ref)

        lk = lk_ref[:]                                     # (1, C)
        rowf = jnp.floor(lk * (1.0 / PK_G))                # -1 -> no match
        sub_r = jax.lax.broadcasted_iota(
            jnp.int32, (PK_R, C), 0).astype(jnp.float32)
        r1 = jnp.where(rowf == sub_r, 1.0, 0.0)            # (PK_R, C)
        rows_t = onehot_dot(
            r1, cols_ref[0], (((0,), (0,)), ((), ())),
            onehot_left=False)                             # (128, C)
        g_row = lk - rowf * PK_G                           # (1, C) in [0,16)
        l_iota = jax.lax.broadcasted_iota(
            jnp.int32, (ALIGN, C), 0)
        ghot = jnp.where(
            (l_iota // PK_F).astype(jnp.float32) == g_row, 1.0, 0.0)
        sel8 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (PK_F, ALIGN), 1) % PK_F
            == jax.lax.broadcasted_iota(jnp.int32, (PK_F, ALIGN), 0),
            1.0, 0.0)
        out_ref[:] += onehot_dot(
            sel8, ghot * rows_t, (((1,), (0,)), ((), ())))  # (8, C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((1, C), lambda v, t: (0, v)),
            pl.BlockSpec(
                (1, PK_R, ALIGN), lambda v, t: (t[v] & TV_MASK, 0, 0)),
        ],
        out_specs=pl.BlockSpec((PK_F, C), lambda v, t: (0, t[nv + v])),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((PK_F, n_chunks * C), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(tabs, lockeys, cols_pk)
    return out[:, :n] if n_chunks * C != n else out


# ---------------------------------------------------------------------------
# midpoint visit plan: pass B WITHOUT the second sort
# ---------------------------------------------------------------------------

_IMAX = jnp.iinfo(jnp.int32).max


class MidpointPlan(NamedTuple):
    """gather_mac-compatible visit plan over UNSORTED (pass-A-ordered)
    midpoint keys.

    The RK2 midpoint moves at most cfl_number/2 cells from the particle's
    home cell, so a pass-A chunk's midpoints touch only a handful of
    distinct tiles (~2-4 at bench density vs the home span's ~1.1). Instead
    of re-sorting 9 payload operands by the midpoint key (the reference
    re-gathers at the midpoint, fluidsimulation.cpp:535-541; the round-2
    engine re-sorted — 70-90 ms at 4.1M), enumerate those distinct tiles
    per chunk and emit one visit per (chunk, midpoint-tile) incidence,
    compacted to a static budget.

    tabs/lockeys: exactly VisitPlan's layout, consumed by gather_mac
        unchanged (visit v gathers tile tv[v] against chunk cv[v]'s
        midpoint-local keys; tabs[3nv+v] zero-flags each chunk's first
        visit).
    covered: (n,) bool — this particle's midpoint tile received a visit.
        False (per-chunk distinct tiles beyond `budget`, or total visits
        beyond the plan capacity) means its gathered rows are
        zero/garbage; callers must fall back (ballistic advection, like
        the table engine's bucket-overflow contract) and count it.
    """

    tabs: jnp.ndarray
    lockeys: jnp.ndarray
    covered: jnp.ndarray


def midpoint_plan_size(n: int, factor: float = 3.0,
                       budget: int = 8) -> int:
    """Static visit capacity of the midpoint plan.

    budget * n_chunks always suffices (extraction caps each chunk at
    `budget` tiles), so small problems get it outright — exhaustive
    coverage within budget. Large problems cap at factor * n_chunks to
    bound the scalar-prefetch tables (2 int32/visit of SMEM) and the pad
    visits; coherent flow keeps distinct-tiles-per-chunk ~2-4 there, and
    overflow falls back ballistically (counted)."""
    exhaustive = budget * _n_chunks(n)
    if exhaustive <= 8192:
        return exhaustive
    return max(int(factor * _n_chunks(n)), _n_chunks(n) + 8)


def _pad_chunk_keys(key, n: int):
    """(N,) int32 keys -> (n_chunks, C) with _IMAX pads."""
    n_chunks = _n_chunks(n)
    pad = n_chunks * C - n
    km = key.astype(jnp.int32)
    if pad:
        km = jnp.concatenate([km, jnp.full((pad,), _IMAX, jnp.int32)])
    return km.reshape(n_chunks, C)


def _budget_extract(kmr, budget: int):
    """Per-chunk distinct home tiles, ascending, by `budget` min-sweeps.

    kmr: (n_chunks, C) padded keys. Returns (tiles (n_chunks, budget) with
    _IMAX empties, tm (n_chunks, C) per-particle tiles, cnt, off)."""
    n_chunks = kmr.shape[0]
    tm = jnp.where(kmr == _IMAX, _IMAX, kmr // W)
    rem = tm
    tiles = []
    for _ in range(budget):
        m = jnp.min(rem, axis=1)
        tiles.append(m)
        rem = jnp.where(rem == m[:, None], _IMAX, rem)
    tiles = jnp.stack(tiles, axis=1)               # (n_chunks, budget)
    valid_b = tiles != _IMAX
    cnt = jnp.sum(valid_b.astype(jnp.int32), axis=1)   # >= 1: every chunk
    off = jnp.concatenate(                             # has a real particle
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)])
    return tiles, tm, cnt, off


def plan_midpoint_visits(key_m, n: int, grid_shape, budget: int = 8,
                         factor: float = 3.0) -> MidpointPlan:
    """Build a MidpointPlan from pass-A-ordered midpoint keys.

    All dense XLA: `budget` min-extraction sweeps find each chunk's
    distinct midpoint tiles in ascending order, a cumsum/searchsorted pair
    compacts the (chunk, tile) incidences into `midpoint_plan_size(n)`
    visits, and two (NV, C) row gathers localize the keys per visit."""
    n_chunks = _n_chunks(n)
    nv = midpoint_plan_size(n, factor, budget)
    kmr = _pad_chunk_keys(key_m, n)
    tiles, tm, cnt, off = _budget_extract(kmr, budget)
    total = jnp.minimum(off[n_chunks], nv)

    # ---- compact into the static visit list ----
    vidx = jnp.arange(nv, dtype=jnp.int32)
    cv = jnp.clip(
        jnp.searchsorted(off, vidx, side="right").astype(jnp.int32) - 1,
        0, n_chunks - 1)
    b = jnp.clip(vidx - off[cv], 0, budget - 1)
    tv = tiles[cv, b]
    in_range = vidx < total
    last = total - 1
    tv = jnp.where(in_range, tv, tv[last])
    cv = jnp.where(in_range, cv, cv[last])
    first_c = in_range & jnp.concatenate(
        [jnp.ones((1,), bool), cv[1:] != cv[:-1]])

    # ---- per-particle coverage (tiles are ascending, so the particle's
    # extraction slot is a rank count). `hit` is a broadcast OR over the
    # budget lanes, NOT take_along_axis: a per-element gather of the
    # (n_chunks, C) slot indices costs ~8 ns/element on this chip — 34 of
    # plan_midpoint_visits' 41 ms at 4.1M (hardware, round 4) ----
    slot = jnp.zeros(tm.shape, jnp.int32)
    hit = jnp.zeros(tm.shape, bool)
    for bb in range(budget):
        slot = slot + (tiles[:, bb:bb + 1] < tm).astype(jnp.int32)
        hit = hit | (tiles[:, bb:bb + 1] == tm)
    placed = off[:-1][:, None] + slot < nv
    covered = (hit & (slot < budget) & placed & (kmr != _IMAX))
    covered = covered.reshape(-1)[:n]

    # ---- per-visit localized keys ----
    tmv = jnp.take(tm, cv, axis=0)                 # (nv, C)
    kmv = jnp.take(kmr, cv, axis=0)
    lk = jnp.where(
        (tmv == tv[:, None]) & in_range[:, None],
        (kmv - tv[:, None] * W).astype(jnp.float32), -1.0)

    tabs = pack_tabs(tv, cv, jnp.zeros((nv,), jnp.int32), first_c)
    return MidpointPlan(tabs, lk.reshape(1, -1), covered)


# ---------------------------------------------------------------------------
# stale-ordering pass A: budget plans over the previous substep's ordering
# ---------------------------------------------------------------------------


class ScatterPlan(NamedTuple):
    """Tile-major budget visit plan for the scatter kernel over UNSORTED
    (stale-pass-A-ordered) home keys.

    Where plan_visits' input is a sorted stream (spans telescope, visits
    come out tile-AND-chunk-monotone for free), here the incidences of a
    budget extraction are explicitly re-sorted by tile so that all visits
    of one output tile are contiguous — the scatter kernel's accumulator
    contract (a flushed block is never revisited). Tiles with no incidence
    get one zeroing visit each (FLAG_TILE, all-masked keys), exactly like
    plan_visits' empty-tile visits. FLAG_CHUNK is never set (the scatter
    kernel doesn't use it). Particles beyond their chunk's `budget`
    distinct tiles (or the factor*n_chunks visit capacity) appear in no
    visit: they are dropped from P2G and the SDF table for this substep
    (covered=False; the caller counts them and falls back ballistically,
    the table-engine overflow contract)."""

    tabs: jnp.ndarray
    lockeys: jnp.ndarray
    covered: jnp.ndarray


def scatter_plan_size(n: int, grid_shape, factor: float = 3.0,
                      budget: int = 8) -> int:
    n_tiles = (grid_shape[0] * grid_shape[1] * grid_shape[2]) // W
    return midpoint_plan_size(n, factor, budget) + n_tiles


def plan_pass_a(key, n: int, grid_shape, budget: int = 8,
                factor: float = 3.0):
    """Both pass-A plans from ONE budget extraction over unsorted keys.

    Returns (gather_plan: MidpointPlan, scatter_plan: ScatterPlan) with
    identical coverage. The gather plan is chunk-major (gather_mac's
    output-rows-resident contract); the scatter plan is the same incidence
    list re-sorted tile-major (a ~3*n_chunks-element sort, trivial next to
    the 7-operand N-element sort it replaces) plus one zeroing visit per
    uncovered tile."""
    n_chunks = _n_chunks(n)
    nv0 = midpoint_plan_size(n, factor, budget)
    n_tiles = (grid_shape[0] * grid_shape[1] * grid_shape[2]) // W
    nv = nv0 + n_tiles
    kmr = _pad_chunk_keys(key, n)
    tiles, tm, cnt, off = _budget_extract(kmr, budget)
    total = jnp.minimum(off[n_chunks], nv0)

    # ---- chunk-major incidence list (shared) ----
    vidx0 = jnp.arange(nv0, dtype=jnp.int32)
    cv0 = jnp.clip(
        jnp.searchsorted(off, vidx0, side="right").astype(jnp.int32) - 1,
        0, n_chunks - 1)
    b0 = jnp.clip(vidx0 - off[cv0], 0, budget - 1)
    tv0 = tiles[cv0, b0]
    in_r0 = vidx0 < total
    last0 = total - 1
    tv0 = jnp.where(in_r0, tv0, tv0[last0])
    cv0c = jnp.where(in_r0, cv0, cv0[last0])
    first_c0 = in_r0 & jnp.concatenate(
        [jnp.ones((1,), bool), cv0c[1:] != cv0c[:-1]])

    # ---- coverage (shared; identical to plan_midpoint_visits) ----
    slot = jnp.zeros(tm.shape, jnp.int32)
    hit = jnp.zeros(tm.shape, bool)
    for bb in range(budget):
        slot = slot + (tiles[:, bb:bb + 1] < tm).astype(jnp.int32)
        hit = hit | (tiles[:, bb:bb + 1] == tm)
    placed = off[:-1][:, None] + slot < nv0
    covered = (hit & (slot < budget) & placed & (kmr != _IMAX))
    covered = covered.reshape(-1)[:n]

    # ---- gather plan: chunk-major, as plan_midpoint_visits ----
    tmv0 = jnp.take(tm, cv0c, axis=0)
    kmv0 = jnp.take(kmr, cv0c, axis=0)
    lk0 = jnp.where(
        (tmv0 == tv0[:, None]) & in_r0[:, None],
        (kmv0 - tv0[:, None] * W).astype(jnp.float32), -1.0)
    gtabs = pack_tabs(tv0, cv0c, jnp.zeros((nv0,), jnp.int32), first_c0)
    gather_plan = MidpointPlan(gtabs, lk0.reshape(1, -1), covered)

    # ---- scatter plan: tile-major re-sort + empty-tile zero visits ----
    sort_key = jnp.where(in_r0, tv0, _IMAX)
    tv_s, cv_s = lax.sort((sort_key, cv0), num_keys=1, is_stable=True)
    tv = jnp.concatenate([tv_s, jnp.full((n_tiles,), _IMAX, jnp.int32)])
    cv = jnp.concatenate([cv_s, jnp.zeros((n_tiles,), jnp.int32)])
    vidx = jnp.arange(nv, dtype=jnp.int32)
    first_t = (vidx < total) & jnp.concatenate(
        [jnp.ones((1,), bool), tv[1:] != tv[:-1]])

    occ = jnp.zeros((n_tiles,), bool).at[tv_s].set(True, mode="drop")
    uncov = ~occ
    n_uncov = jnp.sum(uncov.astype(jnp.int32))
    tiles_ar = jnp.arange(n_tiles, dtype=jnp.int32)
    pos = jnp.where(
        uncov, total + jnp.cumsum(uncov.astype(jnp.int32)) - 1, nv)
    tv = tv.at[pos].set(tiles_ar, mode="drop")
    cv = cv.at[pos].set(0, mode="drop")
    first_t = first_t.at[pos].set(True, mode="drop")
    # pads repeat the LAST written block (still resident), flags off
    last_uncov = jnp.max(jnp.where(uncov, tiles_ar, -1))
    pad_fill = jnp.where(n_uncov > 0, last_uncov, tv[last0])
    is_pad = vidx >= total + n_uncov
    tv = jnp.where(is_pad, pad_fill, tv)
    first_t = first_t & ~is_pad

    tmv = jnp.take(tm, cv, axis=0)
    kmv = jnp.take(kmr, cv, axis=0)
    lk = jnp.where(
        (tmv == tv[:, None]) & (vidx < total)[:, None],
        (kmv - tv[:, None] * W).astype(jnp.float32), -1.0)
    stabs = pack_tabs(tv, cv, first_t.astype(jnp.int32),
                      jnp.zeros((nv,), jnp.int32))
    scatter_plan = ScatterPlan(stabs, lk.reshape(1, -1), covered)
    return gather_plan, scatter_plan
