"""Bisect the ~8.5 ms/visit cost inside the gather kernel body.

All variants at N=262144 (512 chunks, ~4400 visits). Body variants:
  dmaonly : DMA + acc += colbuf (no one-hot build)
  m1only  : sublane-iota one-hot build + acc += m1[:, :128] (no DMA, no dot)
  m1lane  : lane-iota one-hot build (transposed form, fake keys) +
            proper-form dot m1t(C,W) @ colbuf(W,ncols)
  static8 : dmaonly with a STATIC 8-iteration loop (dynamic-trip test)
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/flip3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from flipviscosity3d_tpu.ops import pallas_particles as pp

C, W = pp.C, pp.W


def variant(spans_flat, keys_f32, cols_tm, n, mode):
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
            if mode in ("dmaonly", "static8"):
                dma = pltpu.make_async_copy(cols_hbm.at[t], colbuf, sem)
                dma.start()
                dma.wait()
                acc[:] += colbuf[:]
            elif mode == "m1only":
                local = key - (t * W).astype(jnp.float32)
                sub_w = jax.lax.broadcasted_iota(
                    jnp.int32, (W, C), 0).astype(jnp.float32)
                m1 = jnp.where(local == sub_w, 1.0, 0.0)
                acc[:] += m1[:, :n_cols]
            elif mode == "m1lane":
                dma = pltpu.make_async_copy(cols_hbm.at[t], colbuf, sem)
                dma.start()
                dma.wait()
                # fake per-sublane keys: iota column (C, 1)
                local_t = jax.lax.broadcasted_iota(
                    jnp.float32, (C, 1), 0) - (t * W).astype(jnp.float32)
                sub_l = jax.lax.broadcasted_iota(
                    jnp.float32, (C, W), 1)
                m1t = jnp.where(local_t == sub_l, 1.0, 0.0)
                acc[:] += jax.lax.dot_general(
                    m1t, colbuf[:], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32,
                )
            return 0

        if mode == "static8":
            for _ in range(8):
                body(0, 0)
        else:
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
    n = 262144

    pos = rng.uniform([0.02, 0.02, 0.02], [0.98, 0.27, 0.98],
                      (n, 3)).astype(np.float32)
    key = np.sort(np.asarray(
        pp.key_of_position(jnp.asarray(pos), 1.0 / res, shape)))
    spans = np.asarray(
        pp.chunk_spans(jnp.asarray(key), pp._n_chunks(n))).reshape(-1)
    keys_f32 = np.asarray(pp._pad_keys(jnp.asarray(key)))
    span_len = spans[1::2] - spans[0::2] + 1
    print(f"N={n}: chunks={pp._n_chunks(n)} visits={int(span_len.sum())}",
          flush=True)

    cols = rng.standard_normal((n_tiles, W, 128)).astype(np.float32)
    for mode in ("dmaonly", "m1only", "m1lane", "static8"):
        fn = jax.jit(functools.partial(variant, n=n, mode=mode))
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
            print(f"  {mode:8s} {dt:9.1f} ms", flush=True)
        except Exception as e:
            print(f"  {mode:8s} FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
