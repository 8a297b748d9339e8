"""Multi-chip: the sharded step must match the single-device step bitwise-ish
on the virtual 8-device CPU mesh (the fake-backend strategy from SURVEY §4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flipviscosity3d_tpu import FluidSimulation
from flipviscosity3d_tpu.core import step as step_mod
from flipviscosity3d_tpu.core.state import SimState, SolidBoundary
from flipviscosity3d_tpu.io.trianglemesh import box_mesh

N = 16
NDEV = 8


@pytest.fixture(scope="module")
def scene():
    sim = FluidSimulation()
    sim.initialize(N, N, N, 1.0 / N)
    sim.add_liquid(box_mesh((0.2, 0.25, 0.2), (0.8, 0.6, 0.8)))
    sim.set_viscosity(1.0)
    # fix the particle count to a multiple of NDEV for clean sharding
    state = sim.state
    n = (state.pos.shape[0] // NDEV) * NDEV
    state = state._replace(pos=state.pos[:n], vel=state.vel[:n])
    return sim.cfg, state


def _shardings(mesh, cfg):
    rep = NamedSharding(mesh, P())
    parts = NamedSharding(mesh, P("x", None))

    def grid_sharding(shape):
        for ax in range(3):
            if shape[ax] % NDEV == 0:
                spec = [None, None, None]
                spec[ax] = "x"
                return NamedSharding(mesh, P(*spec))
        return rep

    cell = grid_sharding(cfg.grid_shape)
    return SimState(
        pos=parts, vel=parts,
        u=grid_sharding(cfg.u_shape),
        v=grid_sharding(cfg.v_shape),
        w=grid_sharding(cfg.w_shape),
        solid=SolidBoundary(
            phi=rep, center_phi=cell,
            weight_u=grid_sharding(cfg.u_shape),
            weight_v=grid_sharding(cfg.v_shape),
            weight_w=grid_sharding(cfg.w_shape),
            solid_u=grid_sharding(cfg.u_shape),
            solid_v=grid_sharding(cfg.v_shape),
            solid_w=grid_sharding(cfg.w_shape),
        ),
        viscosity=rep,
        gravity=rep,
    )


def test_sharded_step_matches_single_device(scene):
    cfg, state = scene
    single_state, single_diag = step_mod.advance(state, 0.01, cfg)

    mesh = Mesh(np.array(jax.devices()[:NDEV]), ("x",))
    shardings = _shardings(mesh, cfg)
    sharded_in = jax.device_put(state, shardings)
    sharded_state, sharded_diag = jax.jit(
        lambda s, dt: step_mod.advance(s, dt, cfg),
        in_shardings=(shardings, NamedSharding(mesh, P())),
        out_shardings=(shardings, NamedSharding(mesh, P())),
    )(sharded_in, jnp.float32(0.01))

    assert int(single_diag.substeps) == int(sharded_diag.substeps)
    assert int(single_diag.pressure_iterations) == int(
        sharded_diag.pressure_iterations
    )
    # particle sets match as SETS (sort order inside a cell may differ across
    # partitioned sorts); compare sorted flattened positions
    a = np.sort(np.asarray(single_state.pos).round(6).view("f4").reshape(-1, 3),
                axis=0)
    b = np.sort(np.asarray(sharded_state.pos).round(6).view("f4").reshape(-1, 3),
                axis=0)
    np.testing.assert_allclose(a, b, atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(single_state.u), np.asarray(sharded_state.u), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(single_state.v), np.asarray(sharded_state.v), atol=1e-5
    )
