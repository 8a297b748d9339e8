#!/usr/bin/env python
"""Pallas vs XLA V-cycle: compiled-on-TPU equality + 128^3 cycle timing."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/flip3d_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from flipviscosity3d_tpu.config import SimConfig
from flipviscosity3d_tpu.solvers import multigrid as mg

RES = int(os.environ.get("RES", "128"))
K = int(os.environ.get("K", "50"))


def main():
    rng = np.random.default_rng(7)
    for shape in [(16, 16, 16), (3, 17, 18, 17)]:
        diag = jnp.asarray(rng.uniform(1, 2, shape).astype(np.float32))
        links = tuple(
            jnp.asarray(rng.uniform(0, 0.25, shape).astype(np.float32))
            for _ in range(3))
        b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        cfg_x = SimConfig(isize=16, jsize=16, ksize=16, dx=1 / 16,
                          mg_backend="xla")
        cfg_p = SimConfig(isize=16, jsize=16, ksize=16, dx=1 / 16,
                          mg_backend="pallas")
        hx = mg.build_hierarchy(diag, links, cfg_x)
        hp = mg.build_hierarchy(diag, links, cfg_p)
        ox = jax.jit(lambda b, h=hx: mg.v_cycle(h, b, 1, 1, 0.8, 1.4))(b)
        op = jax.jit(lambda b, h=hp: mg.v_cycle(h, b, 1, 1, 0.8, 1.4))(b)
        print(shape, "cycle diff", float(jnp.abs(ox - op).max()), flush=True)

    for shape in [(RES, RES, RES), (3, RES + 1, RES + 1, RES + 1)]:
        diag = jnp.asarray(rng.uniform(1, 2, shape).astype(np.float32))
        links = tuple(
            jnp.asarray(rng.uniform(0, 0.3, shape).astype(np.float32))
            for _ in range(3))
        b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        for name, backend in [("xla", "xla"), ("pallas", "pallas")]:
            cfg = SimConfig(isize=RES, jsize=RES, ksize=RES, dx=1.0 / RES,
                            mg_backend=backend)
            h = mg.build_hierarchy(diag, links, cfg)

            @jax.jit
            def chain(b, h=h):
                def body(_, x):
                    return mg.v_cycle(h, x, 1, 1, 0.8, 1.4)
                return lax.fori_loop(0, K, body, b)

            r = chain(b)
            r.ravel()[0].item()
            t0 = time.perf_counter()
            for _ in range(3):
                r = chain(b)
                r.ravel()[0].item()
            dt = (time.perf_counter() - t0) / 3
            print(f"{shape} {name:7s} v_cycle {dt / K * 1e3:8.3f} ms/cycle "
                  f"(+{34 / K:.2f} dispatch/K)", flush=True)


if __name__ == "__main__":
    main()
