"""Multi-chip: the sharded step must match the single-device step bitwise-ish
on the virtual 8-device CPU mesh (the fake-backend strategy from SURVEY §4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from flipviscosity3d_tpu import FluidSimulation
from flipviscosity3d_tpu.core import step as step_mod
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


def test_sharded_step_matches_single_device(scene):
    from flipviscosity3d_tpu.parallel.sharding import make_mesh, shard_state

    cfg, state = scene
    single_state, single_diag = step_mod.advance(state, 0.01, cfg)

    mesh = make_mesh(NDEV)
    sharded_in, shardings = shard_state(state, mesh, cfg)
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
