#!/usr/bin/env python
"""Per-stage timing of the substep pipeline on the active backend.

Each stage is jitted separately and timed with forced sync (.item()); the
~34ms dispatch latency of the tunneled TPU is measured first and should be
subtracted mentally from small numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from flipviscosity3d_tpu import FluidSimulation
from flipviscosity3d_tpu.io.trianglemesh import box_mesh
from flipviscosity3d_tpu.ops import particle_grid as pg
from flipviscosity3d_tpu.ops.buckets import build_buckets, gather_results
from flipviscosity3d_tpu.ops.extrapolate import extrapolate_velocity_field
from flipviscosity3d_tpu.solvers import pressure as psolver
from flipviscosity3d_tpu.solvers import viscosity as vsolver

RES = int(os.environ.get("PROFILE_RESOLUTION", "128"))


def timeit(name, fn, *args, n=3):
    r = fn(*args)
    jax.tree.leaves(r)[0].ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        jax.tree.leaves(r)[0].ravel()[0].item()
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:36s} {dt:9.2f} ms")
    return r


def main():
    sim = FluidSimulation()
    sim.initialize(RES, RES, RES, 1.0 / RES)
    lo = 2.5 / RES
    sim.add_liquid(box_mesh((lo, lo, lo), (1 - lo, 0.285, 1 - lo)))
    sim.set_viscosity(5.0)
    state = sim.state
    cfg = sim.cfg
    dt = jnp.float32(0.01)
    n_parts = state.pos.shape[0]
    print(f"# {RES}^3, {n_parts} particles, cap {cfg.bucket_capacity}")

    # dispatch floor
    timeit("dispatch floor (tiny op)", jax.jit(lambda x: x + 1), jnp.ones(8), n=10)

    tbl = timeit(
        "build_buckets (sort+scatter)",
        jax.jit(
            lambda p, v: build_buckets(
                p, (p[:, 0], p[:, 1], p[:, 2], v[:, 0], v[:, 1], v[:, 2]),
                cfg.dx, cfg.grid_shape, cfg.bucket_capacity,
            )
        ),
        state.pos, state.vel,
    )

    phi = timeit(
        "liquid SDF (27 offsets)",
        jax.jit(
            lambda t, sc: pg.liquid_sdf_from_particles(
                t, cfg.grid_shape, cfg.dx, cfg.particle_radius, sc
            )
        ),
        tbl, state.solid.center_phi,
    )

    u = timeit(
        "p2g one component (18 offsets)",
        jax.jit(
            lambda t: pg.p2g_component(
                t, t.fields[3], cfg.grid_shape, cfg.dx, "u", cfg.u_shape
            )
        ),
        tbl,
    )[0]

    timeit(
        "g2p 3 components x2 grids",
        jax.jit(
            lambda t, uu: (
                pg.sample_mac_at_table(t, uu, state.v, state.w, cfg.dx),
                pg.sample_mac_at_table(t, uu, state.v, state.w, cfg.dx),
            )
        ),
        tbl, u,
    )

    timeit(
        "gather_results x6",
        jax.jit(
            lambda t: gather_results(
                t, (t.fields[0], t.fields[1], t.fields[2],
                    t.fields[3], t.fields[4], t.fields[5])
            )
        ),
        tbl,
    )

    valid = jnp.zeros(cfg.u_shape, bool).at[1:-1, 1:-1, 1:-1].set(True)
    timeit(
        "extrapolate 3 comps x7 layers",
        jax.jit(
            lambda uu: extrapolate_velocity_field(
                uu, state.v, state.w, valid,
                jnp.zeros(cfg.v_shape, bool), jnp.zeros(cfg.w_shape, bool), 7
            )
        ),
        u,
    )

    psys = timeit(
        "pressure build",
        jax.jit(
            lambda p, uu: psolver.build_pressure_system(
                uu, state.v, state.w, p,
                state.solid.weight_u, state.solid.weight_v,
                state.solid.weight_w, dt, cfg,
            )
        ),
        phi, u,
    )

    timeit(
        "pressure matvec x30",
        jax.jit(
            lambda s: jax.lax.fori_loop(
                0, 30,
                lambda _, x: psolver.apply_pressure_matrix(s, x)
                / jnp.maximum(jnp.max(jnp.abs(x)), 1e-30),
                s.b,
            )
        ),
        psys,
    )

    vols = timeit(
        "viscosity volume grids (7)",
        jax.jit(lambda p: vsolver.compute_volume_grids(p, cfg)),
        phi,
    )

    states = vsolver.FaceStates(
        state.solid.solid_u, state.solid.solid_v, state.solid.solid_w
    )
    vsys = timeit(
        "viscosity build",
        jax.jit(
            lambda uu, vol: vsolver.build_viscosity_system(
                uu, state.v, state.w, vol, states, state.viscosity, dt, cfg
            )
        ),
        u, vols,
    )

    timeit(
        "viscosity matvec x30",
        jax.jit(
            lambda s: jax.lax.fori_loop(
                0, 30,
                lambda _, x: tuple(
                    y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
                    for y in vsolver.apply_viscosity_matrix(s, x, cfg)
                ),
                s.rhs,
            )
        ),
        vsys,
    )

    from flipviscosity3d_tpu.core import step as step_mod

    timeit(
        "FULL advance (1 frame)",
        lambda s: step_mod.advance(s, 0.01, cfg)[0].pos,
        state,
        n=3,
    )


if __name__ == "__main__":
    main()
