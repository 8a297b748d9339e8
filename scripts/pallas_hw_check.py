"""Hardware check + timing for the production tile-block Pallas engine.

Runs the REAL package kernels (ops/pallas_particles.py) — not the proto's
copies — so the lane-padding path taken at n_cols=108 (pass A) and 54
(pass B) is exactly what the bench compiles. Usage:

    python scripts/pallas_hw_check.py            # correctness @32^3 + bench @128^3
    RES=64 python scripts/pallas_hw_check.py     # different bench res
    SKIP_BENCH=1 python scripts/pallas_hw_check.py
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


def make_scene(res, fill=0.27, ppc=8, seed=0):
    dx = 1.0 / res
    rng = np.random.default_rng(seed)
    nz = max(2, int(res * fill))
    n = nz * res * res * ppc
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pos[:, 1] *= nz * dx  # fill the bottom band, like the bench pool
    vel = rng.standard_normal((n, 3)).astype(np.float32)
    return pos, vel, dx, (res, res, res)


def timeit(name, fn, *args, n=5):
    r = fn(*args)
    jax.tree.leaves(r)[0].ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        jax.tree.leaves(r)[0].ravel()[0].item()
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return r


def check_small(res=32, cap=8):
    pos, vel, dx, shape = make_scene(res, fill=0.5, ppc=4, seed=1)
    n = pos.shape[0]
    stream = jax.jit(
        lambda p, v: pp.tiled_sort(p, v, dx, shape)
    )(jnp.asarray(pos), jnp.asarray(vel))

    out = pp.scatter_p2g_table(stream.starts, stream.payload, shape, dx, cap)
    sums, fields = pp.split_scatter_output(out, shape, cap)
    sums = np.asarray(sums)
    assert np.isfinite(sums).all(), "scatter sums not finite"
    # weight-sum column 4 is the (0,0,0) u-offset: compare one random cell
    keys = np.asarray(stream.key)
    spx = np.asarray(stream.sorted[0])
    spy = np.asarray(stream.sorted[1])
    spz = np.asarray(stream.sorted[2])
    ok = True
    rng = np.random.default_rng(0)
    ii, jj, kk = pp.decode_key(stream.key, shape)
    ii, jj, kk = np.asarray(ii), np.asarray(jj), np.asarray(kk)
    for _ in range(10):
        p = rng.integers(0, n)
        ci, cj, ck = ii[p], jj[p], kk[p]
        sel = (ii == ci) & (jj == cj) & (kk == ck)
        fx = ci * dx - spx[sel]
        fy = cj * dx - (spy[sel] - 0.5 * dx)
        fz = ck * dx - (spz[sel] - 0.5 * dx)
        d2 = fx**2 + fy**2 + fz**2
        w = np.where(
            d2 < dx * dx,
            1 - (4 / 9 / dx**6) * d2**3 + (17 / 9 / dx**4) * d2**2
            - (22 / 9 / dx**2) * d2,
            0.0,
        ).sum()
        got = sums[ci, cj, ck, 4]
        if not np.allclose(got, w, rtol=1e-4, atol=1e-5):
            print(f"  p2g mismatch cell ({ci},{cj},{ck}): {got} vs {w}")
            ok = False
    print(f"scatter correctness ({res}^3): {'OK' if ok else 'FAIL'}",
          flush=True)

    # gather at both production widths (108 pads->128, 54 pads->128)
    n_tiles = (res**3) // pp.W
    for n_cols in (108, 54):
        cols = jnp.asarray(
            np.random.default_rng(3).standard_normal(
                (n_tiles, pp.W, n_cols)).astype(np.float32))
        rows = np.asarray(
            pp.gather_rows(stream.spans, stream.payload[6:7], cols, n))
        want = np.asarray(cols).reshape(-1, n_cols)[keys]
        g_ok = np.allclose(rows, want)
        print(f"gather correctness ({res}^3, {n_cols} cols): "
              f"{'OK' if g_ok else 'FAIL'}", flush=True)
        ok = ok and g_ok
    return ok


def bench(res, cap=16):
    pos, vel, dx, shape = make_scene(res)
    n = pos.shape[0]
    print(f"bench scene: {res}^3, {n} particles, cap {cap}", flush=True)
    posj, velj = jnp.asarray(pos), jnp.asarray(vel)

    sort_fn = jax.jit(lambda p, v: pp.tiled_sort(p, v, dx, shape))
    stream = timeit("tiled_sort (sort+rank+prefix+spans)", sort_fn,
                    posj, velj)

    timeit(f"scatter_p2g_table (108 sums + {cap}*4 tbl)",
           lambda s, p: pp.scatter_p2g_table(s, p, shape, dx, cap),
           stream.starts, stream.payload)

    n_tiles = (res**3) // pp.W
    for n_cols in (108, 54):
        cols = jnp.zeros((n_tiles, pp.W, n_cols), jnp.float32)
        timeit(f"gather_rows ({n_cols} cols)",
               lambda sp, k, c: pp.gather_rows(sp, k, c, n),
               stream.spans, stream.payload[6:7], cols)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    if not check_small():
        raise SystemExit(1)
    if not os.environ.get("SKIP_BENCH"):
        bench(int(os.environ.get("RES", "128")))


if __name__ == "__main__":
    main()
