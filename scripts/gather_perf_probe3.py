"""Which Pallas feature costs ~15-30 ms per grid step on this chip?

All variants: grid (4096,), move (512, 128) f32 blocks (1 GB total).
  p0_blocked  : classic auto-pipelined copy in->out
  p1_prefetch : p0 + an unused scalar-prefetch operand
  p2_loop     : p0 + trivial inner fori_loop(0, 2) around the add
  p3_manualdma: input in ANY space, manual make_async_copy .at[i] -> scratch
  p4_dynidx   : p0 but block index read from the prefetch table (dynamic map)
Control: scripts/mg_pallas_bench.py measured 0.58 ms/V-cycle on this chip.
"""

import functools
import os
import sys
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

NT, W, NC = 4096, 512, 128


def p0_blocked(x):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    return pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, W, NC), jnp.float32),
    )(x)


def p1_prefetch(tbl, x):
    def kernel(tbl_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

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


def p2_loop(x):
    def kernel(x_ref, o_ref):
        def body(t, _):
            o_ref[:] = x_ref[:] + t.astype(jnp.float32)
            return 0

        lax.fori_loop(0, 2, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, W, NC), jnp.float32),
    )(x)


def p3_manualdma(x):
    def kernel(x_hbm, o_ref, buf, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[i], buf, sem)
        dma.start()
        dma.wait()
        o_ref[0] = buf[:] + 1.0

    return pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, W, NC), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, W, NC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((W, NC), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)


def p4_dynidx(tbl, x):
    def kernel(tbl_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, W, NC), lambda i, tbl: (tbl[i], 0, 0))],
        out_specs=pl.BlockSpec((1, W, NC), lambda i, tbl: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NT, W, NC), jnp.float32),
    )(tbl, x)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((NT, W, NC)).astype(np.float32))
    tbl = jnp.arange(NT, dtype=jnp.int32)

    cases = [
        ("p0_blocked", lambda: p0_blocked(x)),
        ("p1_prefetch", lambda: p1_prefetch(tbl, x)),
        ("p2_loop", lambda: p2_loop(x)),
        ("p3_manualdma", lambda: p3_manualdma(x)),
        ("p4_dynidx", lambda: p4_dynidx(tbl, x)),
    ]
    for name, f in cases:
        try:
            fj = jax.jit(f)
            r = fj()
            r[0, 0, 0].item()
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                r = fj()
            r[0, 0, 0].item()
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"{name:13s} {dt:9.2f} ms  ({NT} steps, 1 GB r/w)",
                  flush=True)
        except Exception as e:
            print(f"{name:13s} FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
