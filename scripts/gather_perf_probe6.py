"""Confirm the poison: fori_loop with DYNAMIC trip count from SMEM scalars.

  dyntrip : grid (512,), body adds x block; trip count tbl[2i+1]-tbl[2i]+1
            (always == 2) read from a prefetched SMEM table
  statict : same kernel, literal trip count 2
  revisit : the redesign pattern — grid (1024,), out block index v//2,
            first-visit zeroing via pl.when, accumulate block += x[v]
"""

import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/flip3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

W, NC, NT = 512, 128, 512


def trip_copy(tbl, x, dynamic):
    def kernel(tbl_ref, x_ref, o_ref):
        i = pl.program_id(0)
        if dynamic:
            trip = tbl_ref[2 * i + 1] - tbl_ref[2 * i] + 1
        else:
            trip = 2

        def body(t, _):
            o_ref[:] += x_ref[:] + t.astype(jnp.float32)
            return 0

        o_ref[:] = jnp.zeros_like(o_ref)
        lax.fori_loop(0, trip, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, W, NC), lambda i, tbl: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, W, NC), lambda i, tbl: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NT, W, NC), jnp.float32),
    )(tbl, x)


def revisit_accum(vtile, x):
    nv = 2 * NT

    def kernel(vt_ref, x_ref, o_ref):
        v = pl.program_id(0)

        @pl.when(v % 2 == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += x_ref[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nv,),
        in_specs=[pl.BlockSpec((1, W, NC), lambda v, vt: (vt[v], 0, 0))],
        out_specs=pl.BlockSpec((1, W, NC), lambda v, vt: (v // 2, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NT, W, NC), jnp.float32),
    )(vtile, x)


def time_fn(name, fj, *a, reps=3):
    t0 = time.perf_counter()
    r = fj(*a)
    r.ravel()[0].item()
    t1 = time.perf_counter()
    for _ in range(reps):
        r = fj(*a)
    r.ravel()[0].item()
    t2 = time.perf_counter()
    print(f"{name:28s} first {t1 - t0:7.1f}s  warm "
          f"{(t2 - t1)/reps*1e3:9.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NT, W, NC)).astype(np.float32))
    x.block_until_ready()
    tbl = jnp.stack(
        [jnp.arange(NT, dtype=jnp.int32) * 3,
         jnp.arange(NT, dtype=jnp.int32) * 3 + 1], axis=1).reshape(-1)
    vtile = jnp.repeat(jnp.arange(NT, dtype=jnp.int32), 2)

    time_fn("static trip fori_loop", jax.jit(
        functools.partial(trip_copy, dynamic=False)), tbl, x)
    time_fn("DYNAMIC trip fori_loop", jax.jit(
        functools.partial(trip_copy, dynamic=True)), tbl, x)
    time_fn("revisit accumulate", jax.jit(revisit_accum), vtile, x)

    # correctness of the revisit pattern
    r = jax.jit(revisit_accum)(vtile, x)
    np.testing.assert_allclose(np.asarray(r), 2 * np.asarray(x), rtol=1e-6)
    print("revisit accumulate: exact OK", flush=True)


if __name__ == "__main__":
    main()
