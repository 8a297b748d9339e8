"""Decisive probe: the full scatter/gather bodies in REVISIT form.

(The sole survivor of seven bisection probes; docs/KERNEL_PROBES.md records
the findings of the deleted probes 1-6.)

Hypothesis from probes 2-6: kernels that walk a data-dependent span with an
in-kernel fori_loop + manual DMA (the shipped pallas_particles design) cost
~15-30 ms PER VISIT, while moving the per-visit data selection into
BlockSpec index maps over a flattened (tile, chunk) visit grid — the
probe6 "revisit accumulate" pattern — runs at hardware speed.

Variants (all at N=262144 real sorted keys, ~4400 visits):
  scatterR  : out block = tile (tv[v] map, pl.when first-visit zero),
              in vals block = chunk (cv[v] map), PRE-localized keys,
              body = onehot^T @ vals @ HIGHEST          -> tiles (W=512,F)
  gatherR   : out block = chunk rows (cv[v] map, revisit-accum),
              in cols block = tile (tv[v] map), body = onehot @ cols
  scatterS  : scatterR but localization IN-KERNEL from the SMEM scalar
              tv_ref[v]*W (tests the "SMEM scalar into vector arithmetic"
              poison hypothesis; if slow, pre-localization is mandatory)

Exactness of scatterR/gatherR is asserted against numpy.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/flip3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from flipviscosity3d_tpu.ops import pallas_particles as pp

C, W = pp.C, pp.W
F = 128
HI = jax.lax.Precision.HIGHEST


def scatter_revisit(tabs, lockeys, vals, n_tiles, nv, smem_loc):
    # tabs = concat([tv, cv, first]) int32 (3*nv,)
    def kernel(tabs_ref, lk_ref, vals_ref, out_ref):
        v = pl.program_id(0)

        @pl.when(tabs_ref[2 * nv + v] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        if smem_loc:
            loc = lk_ref[0] - (tabs_ref[v] * W).astype(jnp.float32)
        else:
            loc = lk_ref[0]
        cell = jax.lax.broadcasted_iota(
            jnp.int32, (C, W), 1).astype(jnp.float32)
        onehot = jnp.where(loc[:, None] == cell, 1.0, 0.0)
        out_ref[0] += jax.lax.dot_general(
            onehot, vals_ref[0], (((0,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((1, C), lambda v, t: (0, v)),
            pl.BlockSpec((1, C, F), lambda v, t: (t[nv + v], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, W, F), lambda v, t: (t[v], 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_tiles, W, F), jnp.float32),
    )(tabs, lockeys, vals)


def gather_revisit(tabs, lockeys, cols, n_chunks, nv):
    def kernel(tabs_ref, lk_ref, cols_ref, out_ref):
        v = pl.program_id(0)

        @pl.when(tabs_ref[2 * nv + v] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        loc = lk_ref[0]
        cell = jax.lax.broadcasted_iota(
            jnp.int32, (C, W), 1).astype(jnp.float32)
        onehot = jnp.where(loc[:, None] == cell, 1.0, 0.0)
        out_ref[0] += jax.lax.dot_general(
            onehot, cols_ref[0], (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv,),
        in_specs=[
            pl.BlockSpec((1, C), lambda v, t: (0, v)),
            pl.BlockSpec((1, W, F), lambda v, t: (t[v], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, F), lambda v, t: (t[nv + v], 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_chunks, C, F), jnp.float32),
    )(tabs, lockeys, cols)


def time_fn(name, fj, *a, reps=3):
    t0 = time.perf_counter()
    r = fj(*a)
    out = np.asarray(r)
    t1 = time.perf_counter()
    for _ in range(reps):
        r = fj(*a)
    r.ravel()[0].item()
    t2 = time.perf_counter()
    print(f"{name:12s} first {t1 - t0:7.1f}s  warm "
          f"{(t2 - t1) / reps * 1e3:9.2f} ms", flush=True)
    return out


def main():
    res, n = 128, 262144
    shape = (res, res, res)
    n_tiles = (res // 8) ** 3
    rng = np.random.default_rng(0)
    pos = rng.uniform([0.02, 0.02, 0.02], [0.98, 0.27, 0.98],
                      (n, 3)).astype(np.float32)
    key = np.sort(np.asarray(
        pp.key_of_position(jnp.asarray(pos), 1.0 / res, shape)))
    n_chunks = pp._n_chunks(n)
    tile_of = key // W
    loc_of = (key % W).astype(np.float32)

    # visit list, tile-major (both coords nondecreasing on a sorted stream)
    visits = sorted({(int(tile_of[p]), int(p // C)) for p in range(n)})
    tv = np.array([t for t, _ in visits], np.int32)
    cv = np.array([c for _, c in visits], np.int32)
    first_t = np.concatenate([[1], (tv[1:] != tv[:-1]).astype(np.int32)])
    first_c = np.concatenate([[1], (cv[1:] != cv[:-1]).astype(np.int32)])
    nv = len(visits)
    print(f"N={n}: chunks={n_chunks} tiles_touched={len(set(tv.tolist()))} "
          f"visits={nv}", flush=True)

    # pre-localized keys per visit: key - tile*W for the visit's chunk;
    # off-tile particles -> -1 (no one-hot row)
    keys_chunk = loc_of.reshape(n_chunks, C) + \
        (tile_of.reshape(n_chunks, C) * 0.0)
    lk = np.full((nv, C), -1.0, np.float32)
    for i, (t, c) in enumerate(visits):
        sel = tile_of.reshape(n_chunks, C)[c] == t
        lk[i, sel] = loc_of.reshape(n_chunks, C)[c][sel]
    # raw (non-localized) keys per visit for the smem_loc variant
    rk = np.where(lk >= 0, lk + tv[:, None] * float(W), -1e9).astype(
        np.float32)

    vals = rng.standard_normal((n_chunks, C, F)).astype(np.float32)
    cols = rng.standard_normal((n_tiles, W, F)).astype(np.float32)

    tabs_s = jnp.asarray(np.concatenate([tv, cv, first_t]))
    out = time_fn("scatterR", jax.jit(functools.partial(
        scatter_revisit, n_tiles=n_tiles, nv=nv, smem_loc=False)),
        tabs_s, jnp.asarray(lk.reshape(1, -1)), jnp.asarray(vals))

    # numpy oracle
    ref = np.zeros((n_tiles, W, F), np.float32)
    np.add.at(ref, (tile_of, key % W), vals.reshape(n, F))
    err = np.max(np.abs(out - ref))
    print(f"scatterR exact: max|err|={err:.2e}", flush=True)

    # gather: c-major order
    order = np.lexsort((tv, cv))
    tabs_g = jnp.asarray(np.concatenate(
        [tv[order], cv[order],
         np.concatenate([[1],
                         (cv[order][1:] != cv[order][:-1]).astype(np.int32)]),
         ]))
    outg = time_fn("gatherR", jax.jit(functools.partial(
        gather_revisit, n_chunks=n_chunks, nv=nv)),
        tabs_g, jnp.asarray(lk[order].reshape(1, -1)), jnp.asarray(cols))
    refg = cols[tile_of, key % W].reshape(n_chunks, C, F)
    errg = np.max(np.abs(outg - refg))
    print(f"gatherR exact: max|err|={errg:.2e}", flush=True)

    time_fn("scatterS", jax.jit(functools.partial(
        scatter_revisit, n_tiles=n_tiles, nv=nv, smem_loc=True)),
        tabs_s, jnp.asarray(rk.reshape(1, -1)), jnp.asarray(vals))


if __name__ == "__main__":
    main()
