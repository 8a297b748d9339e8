"""Multigrid preconditioner: SPD sanity and iteration-count improvement."""

import jax
import jax.numpy as jnp
import numpy as np

from flipviscosity3d_tpu.config import SimConfig
from flipviscosity3d_tpu.solvers import viscosity as vs

N = 16
DT = 0.01


def _setup():
    cfg_j = SimConfig(
        isize=N, jsize=N, ksize=N, dx=1.0 / N,
        viscosity_preconditioner="jacobi",
    )
    cfg_m = SimConfig(
        isize=N, jsize=N, ksize=N, dx=1.0 / N,
        viscosity_preconditioner="multigrid",
    )
    # all-liquid box with a shear profile and a solid floor
    phi = np.full((N, N, N), -1.0, np.float32)
    solid_center = np.ones((N, N, N), np.float32)
    solid_center[:, :2, :] = -1.0
    visc = np.full((N + 1, N + 1, N + 1), 5.0, np.float32)
    rng = np.random.default_rng(0)
    u = rng.normal(size=(N + 1, N, N)).astype(np.float32)
    v = rng.normal(size=(N, N + 1, N)).astype(np.float32)
    w = rng.normal(size=(N, N, N + 1)).astype(np.float32)
    states = jax.jit(lambda s: vs.compute_face_states(s, cfg_j))(
        jnp.asarray(solid_center)
    )

    @jax.jit
    def build(uu, vv, ww, p, vis):
        volumes = vs.compute_volume_grids(p, cfg_j)
        return vs.build_viscosity_system(
            uu, vv, ww, volumes, states, vis, DT, cfg_j
        )

    sysv = build(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(w), jnp.asarray(phi),
        jnp.asarray(visc),
    )
    return cfg_j, cfg_m, sysv


def test_mg_preconditioner_spd_and_faster():
    cfg_j, cfg_m, sysv = _setup()

    res_j = jax.jit(lambda s: vs.solve_viscosity(s, cfg_j))(sysv)
    res_m = jax.jit(lambda s: vs.solve_viscosity(s, cfg_m))(sysv)

    assert bool(res_j.converged)
    assert bool(res_m.converged), (
        f"MG-preconditioned CG failed: {int(res_m.iterations)} iters, "
        f"residual {float(res_m.residual)}"
    )
    it_j, it_m = int(res_j.iterations), int(res_m.iterations)
    # solutions agree
    for a, b in zip(res_j.x, res_m.x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )
    # the point of MG: materially fewer iterations
    assert it_m < it_j, (it_m, it_j)
    print(f"jacobi {it_j} iters vs multigrid {it_m} iters")
