#!/usr/bin/env python
"""Prototype + microbenchmark for the round-3 Pallas particle kernels.

Design under test (docs/DESIGN.md "run-expand gather" successor): particles
sorted by a TILE-MAJOR cell key; the irregular particle<->grid ops become
dense ONE-HOT MXU matmuls against the (8,8,8)=512-cell tile the particles
lie in (exact for f32 under precision=HIGHEST: the one-hot factor is 0/1 so
every bf16-pass product is exact). This replaces XLA's element-at-a-time
scatters/gathers (~7-25 ns per element/row measured, docs/DESIGN.md).

Mosaic layout rules learned here (and respected below):
- partial slices (DMA or ref) must be 128-aligned in shape AND offset on the
  lane (last) dim -> particle payload lives as (8, N) with particles on
  lanes, and all dynamic chunk offsets are rounded down to 128-multiples
  with the one-hot mask absorbing the overlap rows.
- full-extent dims are exempt, so (8, C) / (W, F) blocks are fine.

Kernels:
  A. scatter: grid over cell tiles; per-chunk one-hot m1 (W, C); per-cell
     P2G sums (108 cols) + position-table expansion (cap*4 cols) as ONE
     m1 @ vals^T matmul accumulated over the tile's chunks.
  B. gather: grid over particle chunks; loop over the tile range the chunk
     spans, DMA each tile's (W, F) column block, rows += m1^T @ cols.
Correctness is checked against numpy references on small sizes first.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/flip3d_jax_cache")

TILE = (8, 8, 8)
W = TILE[0] * TILE[1] * TILE[2]
C = 512   # particles per chunk
ALIGN = 128


def tile_major_key(idx, grid_shape):
    """(i,j,k) int32 -> tile-major flat key."""
    ti, tj, tk = (idx[..., a] // TILE[a] for a in range(3))
    li, lj, lk = (idx[..., a] % TILE[a] for a in range(3))
    nt = [grid_shape[a] // TILE[a] for a in range(3)]
    tile = (ti * nt[1] + tj) * nt[2] + tk
    local = (li * TILE[1] + lj) * TILE[2] + lk
    return tile * W + local


def make_scene(res=128, fill=0.27, ppc=8, seed=0):
    rng = np.random.default_rng(seed)
    shape = (res, res, res)
    nj_fill = int(res * fill)
    ii, jj, kk = np.meshgrid(
        np.arange(res), np.arange(nj_fill), np.arange(res), indexing="ij"
    )
    base = np.stack([ii, jj, kk], -1).reshape(-1, 3).astype(np.float32)
    base = np.repeat(base, ppc, axis=0)
    dx = 1.0 / res
    pos = (base + rng.random((base.shape[0], 3), np.float32)) * dx
    vel = rng.standard_normal((base.shape[0], 3)).astype(np.float32)
    return pos, vel, dx, shape


def sort_particles(pos, vel, dx, grid_shape):
    """-> payload (8, N + 2C) f32 [px,py,pz,vx,vy,vz,key,rank],
       starts (n_blocks+1,), chunk tile ranges (n_chunks, 2)."""
    idx = jnp.clip(
        jnp.floor(pos / dx).astype(jnp.int32),
        0,
        jnp.array(grid_shape, jnp.int32) - 1,
    )
    key = tile_major_key(idx, grid_shape)
    n = pos.shape[0]
    ops = lax.sort(
        (key, pos[:, 0], pos[:, 1], pos[:, 2], vel[:, 0], vel[:, 1],
         vel[:, 2]),
        num_keys=1, is_stable=True,
    )
    key_s = ops[0]
    i32 = jnp.arange(n, dtype=jnp.int32)
    new_run = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    run_start = lax.associative_scan(jnp.maximum, jnp.where(new_run, i32, 0))
    rank = i32 - run_start
    payload = jnp.stack(
        [ops[1], ops[2], ops[3], ops[4], ops[5], ops[6],
         key_s.astype(jnp.float32), rank.astype(jnp.float32)],
        axis=0,
    )  # (8, N)
    # pad 2C lanes; key = -1 so padding never matches any one-hot lane
    pad = jnp.concatenate(
        [jnp.zeros((6, 2 * C), jnp.float32),
         jnp.full((1, 2 * C), -1.0, jnp.float32),
         jnp.zeros((1, 2 * C), jnp.float32)], axis=0
    )
    payload = jnp.concatenate([payload, pad], axis=1)

    n_blocks = (grid_shape[0] * grid_shape[1] * grid_shape[2]) // W
    bounds = jnp.arange(n_blocks + 1, dtype=jnp.int32) * W
    starts = jnp.searchsorted(key_s, bounds).astype(jnp.int32)

    # per particle-chunk tile span (for the gather kernel)
    n_chunks = (n + C - 1) // C
    first = key_s[jnp.minimum(jnp.arange(n_chunks) * C, n - 1)] // W
    last = key_s[jnp.minimum((jnp.arange(n_chunks) + 1) * C - 1, n - 1)] // W
    spans = jnp.stack([first, last], axis=1).astype(jnp.int32)
    return payload, starts, spans


# ---------------------------------------------------------------------------
# scatter kernel
# ---------------------------------------------------------------------------

def _scatter_chunk_values(data, base_key, origin, dx, cap, n_sum):
    """data: (8, C) payload slice; origin: (oi,oj,ok) f32 scalars of the
    tile's first cell. Returns (m1 (W, C), vals (n_cols, C))."""
    px, py, pz = data[0:1], data[1:2], data[2:3]
    vx, vy, vz = data[3:4], data[4:5], data[5:6]
    key, rank = data[6:7], data[7:8]
    local = key - base_key  # f32, exact below 2^24

    sub_w = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0).astype(jnp.float32)
    m1 = jnp.where(local == sub_w, 1.0, 0.0)  # broadcast (1,C) vs (W,C)

    li = jnp.floor(local / (TILE[1] * TILE[2])) + origin[0]
    rem = local - (li - origin[0]) * (TILE[1] * TILE[2])
    lj = jnp.floor(rem / TILE[2]) + origin[1]
    lk = rem - (lj - origin[1]) * TILE[2] + origin[2]

    # --- P2G rows: 54 sublanes of (comp, offset); then 54 of w*v
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
    fx = (li + ax_) * dx - (px - sx * dx)
    fy = (lj + ay_) * dx - (py - sy * dx)
    fz = (lk + az_) * dx - (pz - sz * dx)
    d2 = fx * fx + fy * fy + fz * fz
    r2 = jnp.float32(dx * dx)
    c1 = jnp.float32((4.0 / 9.0) / dx**6)
    c2 = jnp.float32((17.0 / 9.0) / dx**4)
    c3 = jnp.float32((22.0 / 9.0) / dx**2)
    wgt = 1.0 - c1 * d2 * d2 * d2 + c2 * d2 * d2 - c3 * d2
    wgt = jnp.where(d2 < r2, wgt, 0.0)
    vsel = is_u * vx + is_v * vy + is_w * vz
    wv = wgt * vsel

    # --- table expansion rows: cap*4 sublanes (r, f) of [px,py,pz,1]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cap * 4, C), 0)
    r_ = (lane_t // 4).astype(jnp.float32)
    f_ = lane_t % 4
    rv = jnp.where(
        rank == r_,
        jnp.where(f_ == 0, px,
                  jnp.where(f_ == 1, py, jnp.where(f_ == 2, pz, 1.0))),
        0.0,
    )
    vals = jnp.concatenate([wgt, wv, rv], axis=0)
    assert vals.shape[0] == n_sum + cap * 4
    return m1, vals


def make_scatter_kernel(n_blocks, nt, dx, cap):
    n_sum = 108
    n_cols = n_sum + cap * 4

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
        a0 = (s0 // ALIGN) * ALIGN  # aligned walk start; mask absorbs overlap
        n_chunks = lax.div(s1 - a0 + C - 1, C)

        acc[:] = jnp.zeros_like(acc)

        def body(ci, _):
            start = a0 + ci * C
            dma = pltpu.make_async_copy(
                payload_hbm.at[:, pl.ds(start, C)], chunk, sem
            )
            dma.start()
            dma.wait()
            m1, vals = _scatter_chunk_values(
                chunk[:], base_key, origin, dx, cap, n_sum
            )
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
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, W, n_cols), lambda b, starts: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((W, n_cols), jnp.float32),
            pltpu.VMEM((8, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks, W, n_cols), jnp.float32),
        grid_spec=grid_spec,
    )


# ---------------------------------------------------------------------------
# gather kernel: per-particle rows of per-cell stacked columns
# ---------------------------------------------------------------------------

def make_gather_kernel(n_blocks, n_chunks, n_cols):
    def kernel(spans_ref, payload_ref, cols_hbm, out_ref, colbuf, acc, sem):
        ci = pl.program_id(0)
        t0 = spans_ref[ci, 0]
        t1 = spans_ref[ci, 1]
        key = payload_ref[6:7]  # (1, C)

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
            pl.BlockSpec((8, C), lambda ci, spans: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((C, n_cols), lambda ci, spans: (ci, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, n_cols), jnp.float32),
            pltpu.VMEM((C, n_cols), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks * C, n_cols), jnp.float32),
        grid_spec=grid_spec,
    )


# ---------------------------------------------------------------------------


def timeit(name, fn, *args, n=5):
    r = fn(*args)
    jax.tree.leaves(r)[0].ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        jax.tree.leaves(r)[0].ravel()[0].item()
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:48s} {dt:9.2f} ms", flush=True)
    return r


def check_scatter_correctness(res=16):
    pos, vel, dx, shape = make_scene(res, fill=0.5, ppc=4, seed=1)
    cap = 8
    payload, starts, _ = sort_particles(
        jnp.asarray(pos), jnp.asarray(vel), dx, shape
    )
    n_blocks = (res**3) // W
    nt = tuple(s_ // t for s_, t in zip(shape, TILE))
    fn = jax.jit(make_scatter_kernel(n_blocks, nt, dx, cap))
    out = np.asarray(fn(starts, payload))  # (n_blocks, W, 108+cap*4)

    pay = np.asarray(payload)
    keys = pay[6, : pos.shape[0]].astype(np.int64)
    rng = np.random.default_rng(0)
    ok = True
    for cell in rng.choice(res**3 // 2, 20, replace=False):
        sel = keys == cell
        b, l = cell // W, cell % W
        occ_cols = out[b, l, 108:].reshape(cap, 4)
        if int(round(occ_cols[:, 3].sum())) != min(sel.sum(), cap):
            print(f"  occ mismatch cell {cell}: {occ_cols[:,3].sum()} "
                  f"vs {sel.sum()}")
            ok = False
        ti = b // (nt[1] * nt[2])
        tj = (b // nt[2]) % nt[1]
        tk = b % nt[2]
        li = ti * TILE[0] + l // (TILE[1] * TILE[2])
        lj = tj * TILE[1] + (l // TILE[2]) % TILE[1]
        lk = tk * TILE[2] + l % TILE[2]
        px, py, pz = pay[0, :pos.shape[0]][sel], pay[1, :pos.shape[0]][sel], \
            pay[2, :pos.shape[0]][sel]
        # u-comp, oidx 4: ox=0, oy=0, oz=0 (oidx = ox*9 + (oy+1)*3 + oz+1)
        fx = (li + 0) * dx - px
        fy = (lj + 0) * dx - (py - 0.5 * dx)
        fz = (lk + 0) * dx - (pz - 0.5 * dx)
        d2 = fx**2 + fy**2 + fz**2
        w = np.where(
            d2 < dx * dx,
            1 - (4 / 9 / dx**6) * d2**3 + (17 / 9 / dx**4) * d2**2
            - (22 / 9 / dx**2) * d2,
            0.0,
        )
        got = out[b, l, 4]
        if not np.allclose(got, w.sum(), rtol=1e-5, atol=1e-6):
            print(f"  p2g mismatch cell {cell}: {got} vs {w.sum()}")
            ok = False
    print(f"scatter correctness ({res}^3): {'OK' if ok else 'FAIL'}")
    return ok


def check_gather_correctness(res=16, n_cols=128):
    pos, vel, dx, shape = make_scene(res, fill=0.5, ppc=4, seed=2)
    n = pos.shape[0]
    payload, starts, spans = sort_particles(
        jnp.asarray(pos), jnp.asarray(vel), dx, shape
    )
    n_blocks = (res**3) // W
    n_chunks = (n + C - 1) // C
    cols = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (n_blocks, W, n_cols)).astype(np.float32)
    )
    fn = jax.jit(make_gather_kernel(n_blocks, n_chunks, n_cols))
    out = np.asarray(fn(spans, payload[:, : n_chunks * C], cols))[:n]
    keys = np.asarray(payload)[6, :n].astype(np.int64)
    want = np.asarray(cols).reshape(-1, n_cols)[keys]
    ok = np.allclose(out, want)
    print(f"gather correctness ({res}^3): {'OK' if ok else 'FAIL'}")
    return ok


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    if not check_scatter_correctness():
        sys.exit(1)
    if not check_gather_correctness():
        sys.exit(1)

    res = int(os.environ.get("RES", "128"))
    pos, vel, dx, shape = make_scene(res)
    n = pos.shape[0]
    cap = 16
    n_cells = res**3
    n_blocks = n_cells // W
    n_chunks = (n + C - 1) // C
    print(f"bench scene: {res}^3, {n} particles, cap {cap}", flush=True)

    posj, velj = jnp.asarray(pos), jnp.asarray(vel)
    sort_fn = jax.jit(functools.partial(
        sort_particles, dx=dx, grid_shape=shape))
    payload, starts, spans = timeit("sort + rank + prefix", sort_fn,
                                    posj, velj)

    nt = tuple(s_ // t for s_, t in zip(shape, TILE))
    scat = jax.jit(make_scatter_kernel(n_blocks, nt, dx, cap))
    timeit("pallas scatter (108 sums + cap*4 table)", scat, starts, payload)

    gath = jax.jit(make_gather_kernel(n_blocks, n_chunks, 128))
    cols = jnp.zeros((n_blocks, W, 128), jnp.float32)
    timeit("pallas gather (128 cols)", gath, spans,
           payload[:, : n_chunks * C], cols)

    # XLA baselines these replace
    def xla_scatter6(payload):
        key = payload[6, :n].astype(jnp.int32)
        rank = payload[7, :n].astype(jnp.int32)
        slot = jnp.where(rank < cap, rank * n_cells + key, cap * n_cells)
        outs = []
        for f in range(6):
            col = jnp.zeros((cap * n_cells,), jnp.float32)
            outs.append(col.at[slot].set(
                payload[f, :n], mode="drop", unique_indices=True))
        return outs

    timeit("XLA 6 column scatters (round-2 passA)",
           jax.jit(xla_scatter6), payload)

    def xla_row_gather(payload, stacked):
        key = payload[6, :n].astype(jnp.int32)
        return jnp.take(stacked, key, axis=0)

    stacked = jnp.zeros((n_cells, 54), jnp.float32)
    timeit("XLA row gather (N,54)", jax.jit(xla_row_gather), payload, stacked)


if __name__ == "__main__":
    main()
