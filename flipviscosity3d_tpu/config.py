"""Simulation configuration.

The reference hardcodes all numerical parameters as private members scattered
through the code (see /root/reference/src/fluidsimulation.h:121-130,
pressuresolver.h:224-226, viscositysolver.h:200-202, fluidsimulation.cpp:36,79).
Here they live in one frozen, hashable dataclass so the whole parameter set can
be a static argument to jitted functions.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """All numerical constants of the FLIP solver.

    Defaults reproduce the reference's hardcoded values.
    """

    # Grid (cells per axis) and cell width.
    isize: int = 64
    jsize: int = 64
    ksize: int = 64
    dx: float = 1.0 / 64.0

    # CFL condition number: substep dt = cfl * dx / max|u|
    # (fluidsimulation.h:128, fluidsimulation.cpp:241-269)
    cfl_number: float = 5.0

    # PIC/FLIP blend: v = r*PIC + (1-r)*FLIP (fluidsimulation.h:130)
    ratio_pic_flip: float = 0.05

    # Free-surface ghost-fluid minimum fraction theta clamp
    # (fluidsimulation.h:129, pressuresolver.h:226)
    minfrac: float = 0.01

    # Mesh->SDF exact computation band, in cells (fluidsimulation.h:121)
    mesh_levelset_exact_band: int = 3

    # Particle radius = dx * 1.01 * sqrt(3)/2 (fluidsimulation.cpp:36)
    particle_radius_factor: float = 1.01 * (3.0 ** 0.5) / 2.0

    # Jittered seeding samples per cell (fluidsimulation.cpp:79)
    particles_per_cell: int = 8

    # Velocity extrapolation layers = ceil(cfl) + 2 (fluidsimulation.cpp:690-694).
    # The reference recomputes this per call; here it must be a static python
    # int, so None (the default) derives ceil(cfl_number) + 2 at construction
    # and an explicit int overrides it.
    extrapolation_layers: int | None = None

    # Pressure solve (pressuresolver.h:224-225). The reference uses an absolute
    # inf-norm tolerance of 1e-9 with MICCG in float64; in float32 on TPU we use
    # a relative tolerance floor instead (documented divergence).
    pressure_solve_max_iterations: int = 200
    pressure_solve_tolerance: float = 1e-9       # absolute floor
    pressure_solve_rtol: float = 1e-6            # relative to ||b||_inf

    # Viscosity solve (viscositysolver.h:200-202). Reference: relative 1e-6,
    # 700 iters, and results accepted if final abs error < 10.0.
    viscosity_solve_max_iterations: int = 700
    viscosity_solve_rtol: float = 1e-6
    viscosity_acceptable_error: float = 10.0

    # Particle engine. "table" (default): fixed-capacity bucket tables with
    # dense per-slot transfers (ops/buckets.py, ops/particle_grid.py) —
    # measured fastest at multi-million particles, where XLA gathers/
    # scatters cost ~6-10 ns per ELEMENT (row gather (4.1M, 54) = 323 ms,
    # scatter-min (4.1M, 27) = 560 ms) so the stream engine's per-particle
    # row ops lose to dense slot arithmetic. "stream": sorted-stream segment
    # reductions — no capacity limit, no overflow, faster at small N; used
    # by the shard_map slab pipeline (small per-shard N) and available for
    # scenes where the capacity contract matters more than throughput.
    particle_engine: str = "table"

    # Bucketed particle-engine capacity: max particles tracked per grid cell.
    # Seeding places 8 per cell; FLIP compression packs more (the 64^3 bunny
    # scene peaks above 16/cell), so 24 keeps overflow at zero in practice.
    bucket_capacity: int = 24

    # Liquid-SDF table capacity for the PALLAS engine only (its P2G/G2P are
    # capacity-free; slots are needed just to enumerate per-cell particle
    # positions for the 27-offset SDF min sweep). The min over a crowded
    # cell's particles saturates far below bucket_capacity, so a smaller
    # cap changes phi only in cells where it is already deeply negative;
    # it cuts the scatter kernel's accumulator lanes and the (cap, n_cells)
    # sweep traffic proportionally. None -> bucket_capacity (exact
    # table-engine SDF semantics). The table engine ignores this (one
    # capacity governs all its passes).
    sdf_capacity: int | None = None

    # Bucket-overflow contract. Particles beyond bucket_capacity in one cell
    # skip that pass's grid transfers and take the documented ballistic
    # fallback instead (ops/buckets.gather_results: advect with the particle's
    # own velocity, clamped to the domain and still counted in diagnostics).
    # "fallback" keeps that policy silently; "error" makes
    # FluidSimulation.advance raise as soon as a frame reports overflow > 0.
    on_bucket_overflow: str = "fallback"

    # Pallas-engine pass B. "plan" (default, measured round 4): keep pass-A
    # ordering and gather the RK2 stage-2 samples through a midpoint visit
    # plan (plan_midpoint_visits) — no second sort; chunks whose midpoints
    # touch more than pallas_midpoint_budget distinct tiles (or blow the
    # factor*n_chunks visit capacity) fall back to ballistic advection,
    # counted as bucket_overflow. Measured on hardware at 128^3/4.1M,
    # back-to-back same session: plan 2.728 steps/s vs sort 2.534 (the
    # plan builder's take_along_axis fix took it from 41 ms to 6 ms, which
    # flipped the round-4 earlier decision), fallback rate 0.001% of
    # particle-substeps on the real coherent flow. "sort": re-sort by the
    # midpoint key — exact, no fallback; kept for A/B and as the
    # conservative option for pathologically incoherent velocity fields
    # (a chunk whose midpoints scatter to >8 distinct tiles).
    pallas_pass_b: str = "plan"
    pallas_midpoint_budget: int = 8
    pallas_midpoint_factor: float = 3.0

    # Pallas-engine pass A. "sort" (default): one 7-operand lax.sort per
    # substep re-establishes the tile-major stream (35.2 ms at 4.1M on
    # hardware, round 4 — the engine's largest single waste vs its ~1.4 ms
    # radix floor). "stale": keep the previous substep's ordering and build
    # budget visit plans over the CURRENT keys instead (plan_pass_a): a
    # chunk-major plan drives the G2P gather, a tile-major re-sorted plan
    # (a ~3*n_chunks-element sort) drives the scatter, and within-cell SDF
    # ranks are computed in-kernel from accumulator count lanes
    # (_rank_from_accumulator) since no sorted stream exists. Particles
    # beyond a chunk's pallas_passa_budget distinct tiles skip this
    # substep's transfers (ballistic fallback, counted). A full re-sort
    # still runs every pallas_resort_every substeps (and on the first
    # substep of every frame) to bound chunk spatial spread.
    pallas_pass_a: str = "sort"
    pallas_resort_every: int = 8
    pallas_passa_budget: int = 8
    pallas_passa_factor: float = 3.0

    # Pallas-engine solid pushback. "gather": one XLA (N, 8) node-SDF
    # row-gather (round-2 path, ~7-25 ns/row on this chip). "kernel":
    # visit-plan packed gather (gather_rows8) — 16 cells share one
    # 128-lane row so the DMA moves no padding; uncovered particles skip
    # the pushback for one substep (counted as bucket_overflow). Default
    # stays "gather" until the kernel path is measured on hardware.
    pallas_pushback: str = "gather"

    # Pass-A gather column layout. False: ONE 108-lane image serves new +
    # FLIP-saved grids (one gather kernel; pass B prefix-slices its 54).
    # True: two 54-lane images gathered separately — same MXU/DMA total,
    # but the peak column memory halves (at 256^3 the 108-lane image is a
    # 7 GB array whose relayout needs TWO copies live, 16 GB of transient
    # HBM — the round-5 OOM #3). None (default): auto — split at
    # >= 2^24 cells (256^3+).
    pallas_split_gather: bool | None = None

    # Storage dtype for the G2P gather column images ("f32" | "bf16").
    # "bf16" halves the column build/relayout traffic AND the per-visit
    # gather DMA, and the gather kernels contract the bf16 image in ONE
    # native MXU pass (vs pallas_split_terms f32 passes) — the largest
    # single lever on the gather pair's ~71 ms (r4 roofline). Cost:
    # sampled velocities round to bf16 (~2^-9 relative) before the FLIP
    # blend and RK2 midpoint. Measured A/B + parity before any default
    # change (see BASELINE.md round-5 rows).
    pallas_gather_dtype: str = "f32"

    # bf16 split passes per one-hot matmul in the pallas particle kernels:
    # 3 reproduces f32 products to ~2^-22 (the default, parity-exact
    # class); 2 is ~2^-15 (single-f32-pass class) and saves a third of the
    # MXU work in the scatter and both gathers. Measured A/B before any
    # default change; parity must be re-run under 2 if it ever wins.
    pallas_split_terms: int = 3

    # Storage dtype for the fused Pallas V-cycle's OPERATOR arrays
    # (diag + 3 links). "bf16" halves their share of the bandwidth-bound
    # cycle's DMA traffic; the kernels upcast to f32 before arithmetic, so
    # the only change is the operator's own rounding — a fixed linear
    # M-tilde, still a valid CG preconditioner. "f32" is exact. Applies to
    # the Pallas backend only (the XLA cycle keeps f32 levels).
    # Measured on hardware (128^3/4.1M bench, round 4): bf16 2.668 steps/s
    # vs f32 2.551 with IDENTICAL iteration counts (pressure 21,
    # viscosity 24) — the cycle is bandwidth-bound, as the roofline said.
    # NOTE the A/B ran at 128^3 only; other resolutions inherit bf16
    # unmeasured. Verify iteration counts once per new scale (the 256^3
    # readiness prints them) before relying on it there.
    mg_operator_dtype: str = "bf16"

    # Safety bound on CFL substeps per advance() call (reference has no cap;
    # its while-loop runs until t reaches dt).
    max_substeps: int = 64

    # CG preconditioners: "jacobi" (parallel baseline) or "multigrid"
    # (Galerkin aggregation V-cycle, solvers/multigrid.py). The reference's
    # MIC(0) is inherently sequential and has no TPU analogue; the V-cycle
    # is the TPU-parallel replacement and the default for both systems.
    viscosity_preconditioner: str = "multigrid"
    pressure_preconditioner: str = "multigrid"

    # Multigrid V-cycle shape (see solvers/multigrid.py). Coarsening is
    # exact Galerkin over 2x2x2 aggregates; mg_coarse_scale over-corrects
    # the prolongated update (the standard fix for piecewise-constant
    # transfer deficiency; keeps the preconditioner symmetric). The coarsest
    # level (min dim <= mg_coarse_size) is solved with an explicit dense
    # inverse — tiny-grid smoothing sweeps are dispatch-bound on TPU.
    mg_max_levels: int = 16          # auto-stops at mg_coarse_size
    mg_coarse_size: int = 8
    mg_pre_smooth: int = 1
    mg_post_smooth: int = 1
    mg_omega: float = 0.8
    mg_coarse_scale: float = 1.4
    # V-cycle executor: "auto" fuses each level into 2 Pallas launches when
    # the j*k plane fits the kernels' VMEM budget (ops/pallas_mg.py; the XLA
    # expression costs ~100 launches/cycle and is launch-overhead-bound on
    # this chip); "xla"/"pallas" force a backend.
    mg_backend: str = "auto"

    def __post_init__(self):
        if self.extrapolation_layers is None:
            import math

            object.__setattr__(
                self, "extrapolation_layers",
                int(math.ceil(self.cfl_number)) + 2,
            )

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return (self.isize, self.jsize, self.ksize)

    @property
    def n_cells(self) -> int:
        return self.isize * self.jsize * self.ksize

    @property
    def particle_radius(self) -> float:
        return self.dx * self.particle_radius_factor

    @property
    def u_shape(self) -> tuple[int, int, int]:
        return (self.isize + 1, self.jsize, self.ksize)

    @property
    def v_shape(self) -> tuple[int, int, int]:
        return (self.isize, self.jsize + 1, self.ksize)

    @property
    def w_shape(self) -> tuple[int, int, int]:
        return (self.isize, self.jsize, self.ksize + 1)

    @property
    def node_shape(self) -> tuple[int, int, int]:
        return (self.isize + 1, self.jsize + 1, self.ksize + 1)
