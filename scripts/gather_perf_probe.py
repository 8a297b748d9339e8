"""Why is gather_rows ~81 s/call at 4.1M? Isolate the cost.

Variants (all hardware, small compiles):
  A. scale N: 256k vs 1M vs 4.1M  -> per-chunk overhead vs per-byte
  B. precision: HIGHEST vs DEFAULT one-hot dot
  C. no-DMA control: matmul-only kernel at same grid size
Env: N (default 1048576), COLS (108), PREC (highest|default), MODE
(gather|nodma|nomm).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/flip3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from flipviscosity3d_tpu.ops import pallas_particles as pp

C, W, ALIGN = pp.C, pp.W, pp.ALIGN


def variant_gather(spans_flat, keys_f32, cols_tm, n, precision, mode):
    n_chunks = pp._n_chunks(n)
    n_tiles, _, n_cols = cols_tm.shape

    def kernel(spans_ref, keys_ref, cols_hbm, out_ref, colbuf, acc, sem):
        ci = pl.program_id(0)
        t0 = spans_ref[2 * ci]
        t1 = spans_ref[2 * ci + 1]
        key = keys_ref[:]
        acc[:] = jnp.zeros_like(acc)

        def body(ti, _):
            t = t0 + ti
            if mode != "nodma":
                dma = pltpu.make_async_copy(cols_hbm.at[t], colbuf, sem)
                dma.start()
                dma.wait()
            local = key - (t * W).astype(jnp.float32)
            sub_w = jax.lax.broadcasted_iota(
                jnp.int32, (W, C), 0).astype(jnp.float32)
            m1 = jnp.where(local == sub_w, 1.0, 0.0)
            if mode != "nomm":
                acc[:] += jax.lax.dot_general(
                    m1, colbuf[:], (((0,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )
            else:
                acc[:] += jnp.broadcast_to(
                    jnp.sum(m1, axis=0)[:, None], acc.shape)
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
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks * C, n_cols), jnp.float32),
        grid_spec=grid_spec,
    )(spans_flat, keys_f32[:, : n_chunks * C], cols_tm)


def main():
    res = 128
    shape = (res, res, res)
    n_tiles = (res // 8) ** 3
    rng = np.random.default_rng(0)

    for n in (262144, 1048576, 4111806):
        pos = rng.uniform([0.02, 0.02, 0.02], [0.98, 0.27, 0.98],
                          (n, 3)).astype(np.float32)
        key = np.sort(np.asarray(
            pp.key_of_position(jnp.asarray(pos), 1.0 / res, shape)))
        spans = np.asarray(
            pp.chunk_spans(jnp.asarray(key), pp._n_chunks(n))).reshape(-1)
        keys_f32 = np.asarray(pp._pad_keys(jnp.asarray(key)))
        span_len = spans[1::2] - spans[0::2] + 1
        print(f"N={n}: chunks={pp._n_chunks(n)} "
              f"visits={int(span_len.sum())}", flush=True)

        cols = rng.standard_normal((n_tiles, W, 128)).astype(np.float32)
        for prec, mode in (
            (jax.lax.Precision.HIGHEST, "gather"),
            (jax.lax.Precision.DEFAULT, "gather"),
            (jax.lax.Precision.DEFAULT, "nodma"),
            (jax.lax.Precision.DEFAULT, "nomm"),
        ):
            fn = jax.jit(functools.partial(
                variant_gather, n=n, precision=prec, mode=mode))
            try:
                r = fn(jnp.asarray(spans), jnp.asarray(keys_f32),
                       jnp.asarray(cols))
                r[0, 0].item()
                t0 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    r = fn(jnp.asarray(spans), jnp.asarray(keys_f32),
                           jnp.asarray(cols))
                r[0, 0].item()
                dt = (time.perf_counter() - t0) / reps * 1e3
                print(f"  {mode:7s} prec={str(prec):22s} {dt:9.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"  {mode:7s} prec={str(prec):22s} FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
