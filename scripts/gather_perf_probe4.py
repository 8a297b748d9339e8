"""Bounded control: XLA elementwise vs small-grid Pallas copy on 1 GB.

Prints after every measurement; every case is seconds-bounded by design.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/flip3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

W, NC = 512, 128


def pallas_copy(x, nt):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

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
    print(f"{name:24s} first {t1 - t0:7.1f}s  warm {(t2 - t1)/reps*1e3:9.2f} ms",
          flush=True)


def main():
    rng = np.random.default_rng(0)

    for nt in (16, 64, 512):
        x = jnp.asarray(
            rng.standard_normal((nt, W, NC)).astype(np.float32))
        x.block_until_ready()
        print(f"--- nt={nt} ({nt * W * NC * 4 / 1e6:.0f} MB) ---", flush=True)
        time_fn("xla add", jax.jit(lambda a: a + 1.0), x)
        time_fn("pallas blocked copy", jax.jit(
            lambda a, n=nt: pallas_copy(a, n)), x)


if __name__ == "__main__":
    main()
