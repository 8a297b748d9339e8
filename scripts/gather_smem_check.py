"""Hardware check: gather_rows at 4M-particle scale (the SMEM-budget case).

The (n_chunks, 2) spans prefetch array lane-pads to 128 columns in SMEM
(n_chunks * 512 B = 4.1 MB > 1 MB at 4M particles); gather_rows now ships
spans flattened 1-D. This compiles ONLY the gather kernel at bench scale to
prove the fix without the full-step compile.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/flip3d_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from flipviscosity3d_tpu.ops import pallas_particles as pp


def main():
    res = int(os.environ.get("RES", "128"))
    n = int(os.environ.get("N", "4111806"))
    shape = (res, res, res)
    n_tiles = (res // 8) ** 3
    rng = np.random.default_rng(0)

    # sorted tile-major keys concentrated like the bench pool (bottom ~27%)
    pos = rng.uniform([0.02, 0.02, 0.02], [0.98, 0.27, 0.98],
                      (n, 3)).astype(np.float32)
    key = np.asarray(pp.key_of_position(jnp.asarray(pos), 1.0 / res, shape))
    key_s = np.sort(key)
    spans = np.asarray(pp.chunk_spans(jnp.asarray(key_s), pp._n_chunks(n)))
    keys_f32 = np.asarray(pp._pad_keys(jnp.asarray(key_s)))

    for n_cols_logical in (108, 54):
        cols = rng.uniform(-1, 1, (n_tiles, pp.W, n_cols_logical)).astype(
            np.float32)
        t0 = time.perf_counter()
        rows = pp.gather_rows(
            jnp.asarray(spans), jnp.asarray(keys_f32), jnp.asarray(cols), n)
        first = np.asarray(rows[:4])
        t1 = time.perf_counter()
        # check a few rows on host
        for i in rng.integers(0, n, 64):
            t, w = key_s[i] // pp.W, key_s[i] % pp.W
            got = np.asarray(rows[i])
            np.testing.assert_allclose(
                got[:n_cols_logical], cols[t, w], rtol=0, atol=0)
        # timing: 10 warm reps
        t2 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            rows = pp.gather_rows(
                jnp.asarray(spans), jnp.asarray(keys_f32),
                jnp.asarray(cols), n)
        _ = np.asarray(rows[0, 0])
        t3 = time.perf_counter()
        print(f"gather_rows n_cols={n_cols_logical}: compile+first "
              f"{t1 - t0:.1f}s, exact OK, {(t3 - t2) / reps * 1e3:.1f} "
              f"ms/call warm", flush=True)


if __name__ == "__main__":
    main()
