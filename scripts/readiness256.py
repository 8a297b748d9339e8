"""256^3 single-device readiness check (BASELINE config 4 scale).

Compiles and runs ONE pallas-engine substep at 256^3 grid shapes to flush
shape/plan/memory-structure bugs in the tile-block engine. Runs on the TPU
by default (the engine's Pallas kernels need Mosaic — interpret mode at
~34K grid steps is infeasible); set READINESS_CPU=1 to force the CPU
backend (only sensible at reduced RES). Companion to scripts/
readiness512.py (which checks the shard_map slab pipeline at config 5).

Usage: NPART=2000000 python scripts/readiness256.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("READINESS_CPU"):
    jax.config.update("jax_platforms", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
jax.config.update("jax_compilation_cache_dir", "/tmp/flip3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from flipviscosity3d_tpu.config import SimConfig
from flipviscosity3d_tpu.core import step as step_mod
from flipviscosity3d_tpu.core.sim import FluidSimulation
from flipviscosity3d_tpu.ops.mesh_sdf import MeshLevelSet


def analytic_boundary_sdf(cfg):
    """Inverted-box solid SDF (same closed form as scripts/readiness512.py)
    so setup never runs the mesh->SDF path at this scale. Built ON DEVICE:
    the 257^3-node grid is 68 MB, ~4 minutes through the 0.3 MB/s axon
    tunnel if built in host numpy."""
    inset = 0.5 * (3.0 * cfg.dx + 1e-6)
    lo = jnp.full((3,), inset, jnp.float32)
    hi = (jnp.array([cfg.isize, cfg.jsize, cfg.ksize], jnp.float32)
          * cfg.dx - inset)

    @jax.jit
    def build():
        axes = [jnp.arange(s + 1, dtype=jnp.float32) * cfg.dx
                for s in (cfg.isize, cfg.jsize, cfg.ksize)]
        p = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        q = jnp.maximum(lo - p, p - hi)
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return -(outside + inside)

    return MeshLevelSet(build(), cfg.dx)


def main():
    res = int(os.environ.get("RES", "256"))
    npart = int(os.environ.get("NPART", "500000"))
    print(f"devices: {jax.devices()}", flush=True)

    engine = os.environ.get("ENGINE", "pallas")
    # engine default is "pallas" (the measured bench default). The two
    # round-4/5 256^3 OOMs are both fixed: the F-major (n_tiles, F, W)
    # gather-column layout (d279a5c) killed the 128-lane-padded column
    # images, and the standard-layout (I, J, K*cap4) SDF table killed the
    # 4x-padded tile-major table + its 8 GB detile (round 5).
    sim = FluidSimulation.__new__(FluidSimulation)
    sim.cfg = SimConfig(isize=res, jsize=res, ksize=res, dx=1.0 / res,
                        particle_engine=engine, bucket_capacity=8)
    cfg = sim.cfg
    sim._viscosity = jnp.ones(cfg.node_shape, jnp.float32) * 5.0
    sim._solid_sdf = analytic_boundary_sdf(cfg)
    sim._gravity = np.array([0.0, -9.81, 0.0], np.float32)
    sim._rng = np.random.default_rng(0)

    # particles generated on device (192 MB of host positions at the
    # 16M-particle config 4 scale would take ~10 min through the tunnel)
    m = 2.0 / res
    plo = jnp.array([m, m, m], jnp.float32)
    phi_ = jnp.array([1.0 - m, 0.25, 1.0 - m], jnp.float32)
    pos = jax.random.uniform(
        jax.random.PRNGKey(1), (npart, 3), jnp.float32) * (phi_ - plo) + plo
    sim._particles_pos = [pos]
    sim._state = None
    state = sim.state
    print(f"state built: {res}^3, {npart} particles "
          f"(engine={cfg.particle_engine}, cap={cfg.bucket_capacity})",
          flush=True)

    step_fn = jax.jit(lambda s: step_mod.step(s, jnp.float32(0.004), cfg))
    t0 = time.time()
    new_state, diag = step_fn(state)
    com = float(jnp.mean(new_state.pos[:, 1]))
    t1 = time.time()
    # MG iteration counts are the scale-tracking signal (config.py
    # mg_operator_dtype: bf16 was A/B'd at 128^3 only; a blow-up here
    # says the V-cycle weakens with depth/scale)
    print(f"substep compiled+ran in {t1 - t0:.1f}s  com_y={com:.5f} "
          f"overflow={int(diag['bucket_overflow'])} iters: "
          f"pressure={int(diag['pressure_iterations'])} "
          f"viscosity={int(diag['viscosity_iterations'])}", flush=True)
    assert np.isfinite(com)
    t0 = time.time()
    new_state, diag = step_fn(state)
    float(jnp.mean(new_state.pos[:, 1]))
    print(f"warm substep {time.time() - t0:.2f}s", flush=True)
    print("READY", flush=True)


if __name__ == "__main__":
    main()
