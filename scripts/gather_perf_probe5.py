"""Find the cliff: size sweep for the blocked copy + feature variants.

Sizes: nt in 1024/2048/4096 (0.27/0.54/1.07 GB).
Features at nt=512: +scalar-prefetch spec, +dynamic index map,
+manual DMA from ANY, +inner fori_loop.
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

W, NC = 512, 128


def blocked_copy(x, nt):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, W, NC), jnp.float32),
    )(x)


def prefetch_copy(tbl, x, nt, dyn):
    def kernel(tbl_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    in_map = (lambda i, tbl: (tbl[i], 0, 0)) if dyn else (
        lambda i, tbl: (i, 0, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, W, NC), in_map)],
        out_specs=pl.BlockSpec((1, W, NC), lambda i, tbl: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nt, W, NC), jnp.float32),
    )(tbl, x)


def manual_dma_copy(x, nt):
    def kernel(x_hbm, o_ref, buf, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[i], buf, sem)
        dma.start()
        dma.wait()
        o_ref[0] = buf[:] + 1.0

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, W, NC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((W, NC), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)


def loop_copy(x, nt):
    def kernel(x_ref, o_ref):
        def body(t, _):
            o_ref[:] = x_ref[:] + t.astype(jnp.float32)
            return 0

        lax.fori_loop(0, 2, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, W, NC), jnp.float32),
    )(x)


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

    for nt in (1024, 2048, 4096):
        x = jnp.asarray(rng.standard_normal((nt, W, NC)).astype(np.float32))
        x.block_until_ready()
        print(f"--- size sweep nt={nt} ({nt * W * NC * 4 / 1e6:.0f} MB) ---",
              flush=True)
        time_fn("blocked copy", jax.jit(
            functools.partial(blocked_copy, nt=nt)), x)

    nt = 512
    x = jnp.asarray(rng.standard_normal((nt, W, NC)).astype(np.float32))
    x.block_until_ready()
    tbl = jnp.arange(nt, dtype=jnp.int32)
    print(f"--- features at nt={nt} ---", flush=True)
    time_fn("prefetch static map", jax.jit(
        functools.partial(prefetch_copy, nt=nt, dyn=False)), tbl, x)
    time_fn("prefetch dynamic map", jax.jit(
        functools.partial(prefetch_copy, nt=nt, dyn=True)), tbl, x)
    time_fn("manual DMA from ANY", jax.jit(
        functools.partial(manual_dma_copy, nt=nt)), x)
    time_fn("inner fori_loop(2)", jax.jit(
        functools.partial(loop_copy, nt=nt)), x)


if __name__ == "__main__":
    main()
