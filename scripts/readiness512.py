#!/usr/bin/env python
"""512^3 readiness check (BASELINE config 5, VERDICT r2 item 9).

Compiles and runs ONE substep of the flagship multi-chip engine
(parallel/shard_step.advance_sharded) at 512^3 over 8 forced-CPU devices,
to flush shape/capacity bugs before multi-chip hardware exists. Reduced
particle density (the full 8/cell seeding would be 1e9 candidates); the
solid boundary uses the ANALYTIC inset-box SDF (identical by construction
to mesh_to_sdf of box_mesh, which is exact) so setup doesn't grind the
single CPU core through a 513^3 x 12-triangle brute force.

Run:  python scripts/readiness512.py          (self-configures CPU mesh)
Env:  RES (default 512), NPART (default 2_000_000), NDEV (default 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NDEV = int(os.environ.get("NDEV", "8"))
# sitecustomize imports jax at interpreter startup, so JAX_PLATFORMS in the
# env is too late — update jax.config directly (before any backend use),
# exactly like tests/conftest.py.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (
        flags + f" --xla_force_host_platform_device_count={NDEV}").strip()
# 8 virtual devices multiplex ONE physical core here; at 512^3 a shard's
# compute between collectives exceeds XLA-CPU's 40 s rendezvous kill timer,
# which aborts the process ("Termination timeout ... exceeded"). Raise all
# three collective timeouts far past single-core grind speed.
flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=3600"
          " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
          " --xla_cpu_collective_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from flipviscosity3d_tpu.config import SimConfig
from flipviscosity3d_tpu.core.sim import FluidSimulation
from flipviscosity3d_tpu.ops.mesh_sdf import MeshLevelSet
from flipviscosity3d_tpu.parallel import shard_step as sh


def analytic_boundary_sdf(cfg) -> MeshLevelSet:
    """Negated exact SDF of the inset domain box on the node grid —
    the closed form of core/sim._domain_boundary_sdf's mesh version."""
    inset = 0.5 * (3.0 * cfg.dx + 1e-6)
    lo = np.full(3, inset, np.float64)
    hi = np.array([cfg.isize, cfg.jsize, cfg.ksize], np.float64) * cfg.dx - inset
    axes = [np.arange(s + 1, dtype=np.float64) * cfg.dx
            for s in (cfg.isize, cfg.jsize, cfg.ksize)]
    p = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    q_lo = lo - p
    q_hi = p - hi
    q = np.maximum(q_lo, q_hi)             # per-axis outside distance
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    phi = (outside + inside).astype(np.float32)
    return MeshLevelSet(jnp.asarray(-phi), cfg.dx)


def main():
    res = int(os.environ.get("RES", "512"))
    npart = int(os.environ.get("NPART", "2000000"))
    # ISIZE < RES runs slab-exact readiness: per-shard slabs of shape
    # (ISIZE/NDEV + 2H, RES, RES) — set ISIZE = NDEV * (512/8) = NDEV*64
    # to reproduce config 5's EXACT per-shard shapes, halos, and
    # capacities on a host that cannot hold all eight 512-wide slabs at
    # once (the full 512^3 x 8-virtual-device run peaks >130 GB host RAM
    # and is OOM-killed; 8 real chips hold 16 GB HBM each).
    isize = int(os.environ.get("ISIZE", str(res)))
    print(f"devices: {jax.devices()}", flush=True)

    sim = FluidSimulation.__new__(FluidSimulation)
    sim.cfg = SimConfig(isize=isize, jsize=res, ksize=res, dx=1.0 / res)
    cfg = sim.cfg
    sim._viscosity = jnp.ones(cfg.node_shape, jnp.float32)
    sim._solid_sdf = analytic_boundary_sdf(cfg)
    sim._gravity = np.array([0.0, -9.81, 0.0], np.float32)
    sim._rng = np.random.default_rng(0)

    rng = np.random.default_rng(1)
    m = 2.0 / res
    xhi = isize * cfg.dx - m
    pos = rng.uniform(
        [m, m, m], [xhi, 0.25, 1.0 - m], (npart, 3)).astype(np.float32)
    sim._particles_pos = [pos]
    sim._state = None
    state = sim.state
    print(f"state built: ({isize},{res},{res}), {npart} particles",
          flush=True)

    spec = sh.make_spec(cfg, NDEV, cap_factor=2.0, n_particles=npart)
    ss = sh.shard_simstate(state, cfg, spec)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:NDEV]), (sh.AXIS,))

    t0 = time.perf_counter()
    ss, diag = sh.advance_sharded(ss, 1e-4, cfg, spec, mesh)
    n_sub = int(diag.substeps)       # forces execution
    t1 = time.perf_counter()
    alive = int(np.asarray(jax.jit(lambda a: a.sum())(ss.alive)))
    pos_out, _ = sh.gather_particles(ss)
    assert np.isfinite(np.asarray(pos_out)).all(), "non-finite positions"
    assert alive == npart, f"lost particles: {alive} != {npart}"
    out = dict(
        ok=True, res=res, isize=isize, n_devices=NDEV, n_particles=npart,
        slab_shape=[spec.B + 2 * spec.H, res, res],
        substeps=n_sub,
        pressure_iters=int(diag.pressure_iterations),
        viscosity_iters=int(diag.viscosity_iterations),
        compile_plus_first_substep_s=round(t1 - t0, 1),
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
