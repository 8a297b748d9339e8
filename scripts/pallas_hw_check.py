"""Hardware smoke gate for the tile-block Pallas engine (~30 s warm).

Runs the REAL package kernels (ops/pallas_particles.py) at 32^3 on the
current backend and verifies them against plain-XLA oracles. Interpret
mode has twice masked fatal Mosaic incompatibilities (per-operand dot
precision, round 3; layout OOMs, round 4) — run THIS the moment the TPU
tunnel is up, before building anything on top of the kernels.

    python scripts/pallas_hw_check.py         # exits 1 on any mismatch
"""

import os
import sys

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
    res, cap = 32, 8
    dx = 1.0 / res
    shape = (res, res, res)
    n = res * res * res * 2
    print(f"backend={jax.default_backend()} res={res} n={n}", flush=True)

    k = jax.random.split(jax.random.PRNGKey(7), 4)
    pos = jax.random.uniform(k[0], (n, 3), jnp.float32, 0.02, 0.98)
    vel = jax.random.normal(k[1], (n, 3), jnp.float32)

    stream = jax.jit(lambda p, v: pp.tiled_sort(p, v, dx, shape))(pos, vel)
    ok = True

    # scatter: weight-sum lane 4 is the (0,0,0) u-offset — oracle via a
    # dense per-cell segment sum of Wyvill weights
    sums, tbl = jax.jit(lambda t, lk, pay: pp.scatter_p2g_table(
        t, lk, pay, shape, dx, cap))(
        stream.plan.tabs, stream.plan.lockeys, stream.payload)
    sums = np.asarray(sums)
    assert np.isfinite(sums).all(), "scatter sums not finite"
    key = np.asarray(stream.key)
    spx, spy, spz = (np.asarray(stream.sorted[a]) for a in range(3))
    ii, jj, kk = (np.asarray(a) for a in pp.decode_key(stream.key, shape))
    fx = ii * dx - spx
    fy = jj * dx - (spy - 0.5 * dx)
    fz = kk * dx - (spz - 0.5 * dx)
    d2 = fx**2 + fy**2 + fz**2
    w = np.where(
        d2 < dx * dx,
        1 - (4 / 9 / dx**6) * d2**3 + (17 / 9 / dx**4) * d2**2
        - (22 / 9 / dx**2) * d2, 0.0)
    want = np.zeros(res**3, np.float32)
    np.add.at(want, key, w.astype(np.float32))
    # sums is standard K-folded (I, J, K*F); key is tile-major — compare
    # via decode on the free 4D view
    got = sums.reshape(res, res, res, -1)[ii, jj, kk, 4]
    want_g = want[key]
    if not np.allclose(got, want_g, rtol=1e-4, atol=1e-5):
        bad = np.abs(got - want_g).max()
        print(f"  scatter p2g mismatch: max err {bad}")
        ok = False
    print(f"scatter (sums direct 4D): {'OK' if ok else 'FAIL'}", flush=True)

    # table fields: every occupied slot holds a particle of that cell
    fields = jax.jit(lambda t: pp.table_fields(t, shape, cap))(tbl)
    fpx = np.asarray(fields[0])
    occ = fpx < 1e7
    # fields are in STANDARD cell order; key is tile-major — bincount on
    # the standard flat id
    cell_std = (ii * res + jj) * res + kk
    n_in_cell = np.bincount(cell_std, minlength=res**3)
    t_ok = (occ.sum(axis=0) == np.minimum(n_in_cell, cap)).all()
    print(f"table_fields occupancy: {'OK' if t_ok else 'FAIL'}", flush=True)
    ok = ok and bool(t_ok)

    # gather at both production widths (108 pads->128, 54 pads->128)
    n_tiles = res**3 // pp.W
    for n_cols in (108, 54):
        cols = jax.random.normal(
            k[2], (n_tiles, n_cols, pp.W), jnp.float32)
        rows = np.asarray(jax.jit(
            lambda t, lk, c: pp.gather_rows(t, lk, c, n))(
            stream.plan.tabs, stream.plan.lockeys, cols))
        want_r = np.asarray(cols).transpose(0, 2, 1).reshape(-1, n_cols)[key]
        g_ok = np.allclose(rows, want_r, rtol=2e-6, atol=1e-6)
        print(f"gather ({n_cols} cols): {'OK' if g_ok else 'FAIL'}",
              flush=True)
        ok = ok and g_ok

    if not ok:
        raise SystemExit(1)
    print("hw gate: ALL OK", flush=True)


if __name__ == "__main__":
    main()
