"""Batty-Bridson variational viscosity solve, matrix-free and coupled.

Reimplements the reference ViscositySolver
(/root/reference/src/viscositysolver.cpp:41-727) as dense factor grids plus a
coupled U/V/W stencil operator under PCG:

- face states solid/fluid from summed solid cell-center phi, edges forced
  solid (viscositysolver.cpp:80-123); static for a static solid boundary
- 7 staggered control-volume fraction grids from the liquid SDF, restricted
  to the 2-dilated fluid-cell mask (viscositysolver.cpp:135-270). The
  reference samples 8 cube corners by trilinear interpolation; because every
  corner lands on either an exact cell center or a half-shifted midpoint,
  each corner-phi grid reduces to an exact 1- or 2- or 4-point average of
  the cell phi array -- no interpolation needed
- row set: fluid faces in [1, size-1)^3 with any adjacent control volume > 0
  (viscositysolver.cpp:276-366)
- SPD system with edge-averaged viscosities, factor dt/dx^2, cross-coupled
  U<->V<->W off-diagonals and solid-Dirichlet velocities moved to the RHS
  (viscositysolver.cpp:374-664)
- PCG (reference: MIC(0), tol 1e-6 relative inf-norm, 700 iters, failure
  accepted if error < 10; pcgsolver.h:241-295, viscositysolver.cpp:666-690);
  here with a parallel Jacobi preconditioner
- solution written back to matrix faces only, everything else zeroed
  (viscositysolver.cpp:692-727)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import SimConfig
from ..ops.grids import shifted_read
from ..ops.levelset import volume_fraction_cube
from .pcg import jacobi_preconditioner, pcg


class FaceStates(NamedTuple):
    """True where the face is SOLID (everything else is fluid; the air state
    is never produced, viscositysolver.cpp:85-122)."""

    solid_u: jnp.ndarray
    solid_v: jnp.ndarray
    solid_w: jnp.ndarray


def compute_face_states(solid_center_phi, cfg: SimConfig) -> FaceStates:
    """Solid if on the grid edge (component axis) or the two adjacent solid
    cell-center phis sum <= 0 (viscositysolver.cpp:80-123)."""
    p = solid_center_phi

    su = jnp.ones(cfg.u_shape, bool)
    su = su.at[1:-1].set(p[:-1] + p[1:] <= 0)
    sv = jnp.ones(cfg.v_shape, bool)
    sv = sv.at[:, 1:-1].set(p[:, :-1] + p[:, 1:] <= 0)
    sw = jnp.ones(cfg.w_shape, bool)
    sw = sw.at[:, :, 1:-1].set(p[:, :, :-1] + p[:, :, 1:] <= 0)
    return FaceStates(su, sv, sw)


# --------------------------------------------------------------------------
# control-volume fractions
# --------------------------------------------------------------------------

def _ext_axis(arr, axis):
    """corner[n] = arr[n] with out-of-range -> 0; output one longer."""
    pads = [(0, 0)] * 3
    pads[axis] = (0, 1)
    return jnp.pad(arr, pads)


def _avg_axis(arr, axis):
    """corner[n] = 0.5*(arr[n-1] + arr[n]) with out-of-range -> 0; the
    volume grid on a zero-offset axis has len+1 entries, so its corner
    array has len+2."""
    pads_lo = [(0, 0)] * 3
    pads_lo[axis] = (1, 1)
    pads_hi = [(0, 0)] * 3
    pads_hi[axis] = (0, 2)
    return 0.5 * (jnp.pad(arr, pads_lo) + jnp.pad(arr, pads_hi))


class VolumeGrids(NamedTuple):
    center: jnp.ndarray  # (I,J,K)
    u: jnp.ndarray       # (I+1,J,K)
    v: jnp.ndarray       # (I,J+1,K)
    w: jnp.ndarray       # (I,J,K+1)
    edge_u: jnp.ndarray  # (I,J+1,K+1)
    edge_v: jnp.ndarray  # (I+1,J,K+1)
    edge_w: jnp.ndarray  # (I+1,J+1,K)


def compute_volume_grids(liquid_phi, cfg: SimConfig) -> VolumeGrids:
    """The 7 control-volume fraction grids (viscositysolver.cpp:135-270).

    centerStart offsets per grid (":170-177"): center (h,h,h), U (0,h,h),
    V (h,0,h), W (h,h,0), edgeU (h,0,0), edgeV (0,h,0), edgeW (0,0,h), where
    an axis with offset h samples corner phi exactly at cell centers
    (identity) and an axis with offset 0 samples at midpoints (2-point
    average). Restricted to the fluid mask dilated 2 layers over the
    (I+1,J+1,K+1) valid-cell grid.
    """
    isz, jsz, ksz = liquid_phi.shape

    valid = jnp.zeros((isz + 1, jsz + 1, ksz + 1), bool)
    valid = valid.at[:isz, :jsz, :ksz].set(liquid_phi < 0)
    vshape = valid.shape
    for _ in range(2):
        grown = valid
        for o in ((-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
                  (0, 0, -1), (0, 0, 1)):
            grown = grown | shifted_read(valid, o, vshape, fill=False)
        valid = grown

    def volumes_for(half_axes):
        """half_axes[a]=True when centerStart has +dx/2 on axis a (exact
        cell-center corner samples); False -> midpoint average."""
        corner = liquid_phi
        for ax in range(3):
            corner = _ext_axis(corner, ax) if half_axes[ax] else _avg_axis(corner, ax)
        shape = tuple(corner.shape[a] - 1 for a in range(3))
        c = {}
        for bx in (0, 1):
            for by in (0, 1):
                for bz in (0, 1):
                    c[(bx, by, bz)] = corner[
                        bx : bx + shape[0], by : by + shape[1], bz : bz + shape[2]
                    ]
        frac = volume_fraction_cube(
            c[0, 0, 0], c[1, 0, 0], c[0, 1, 0], c[1, 1, 0],
            c[0, 0, 1], c[1, 0, 1], c[0, 1, 1], c[1, 1, 1],
        )
        mask = valid[: shape[0], : shape[1], : shape[2]]
        return jnp.where(mask, frac, 0.0)

    return VolumeGrids(
        center=volumes_for((True, True, True)),
        u=volumes_for((False, True, True)),
        v=volumes_for((True, False, True)),
        w=volumes_for((True, True, False)),
        edge_u=volumes_for((True, False, False)),
        edge_v=volumes_for((False, True, False)),
        edge_w=volumes_for((False, False, True)),
    )


# --------------------------------------------------------------------------
# system assembly
# --------------------------------------------------------------------------

class ViscositySystem(NamedTuple):
    in_mat: tuple       # (inU, inV, inW) bool row masks
    diag: tuple         # (diagU, diagV, diagW)
    vol: tuple          # (volU, volV, volW) diagonal mass terms
    factors: tuple      # per component: dict of 6 directional factor grids
    rhs: tuple          # (rhsU, rhsV, rhsW)


def _row_range_mask(shape, cfg):
    """Row index range: i,j,k in [1, size) per axis on a face grid — the
    reference assembly loop bounds (viscositysolver.cpp:284-286, 381-383)."""
    m = jnp.zeros(shape, bool)
    return m.at[1 : cfg.isize, 1 : cfg.jsize, 1 : cfg.ksize].set(True)


def build_viscosity_system(
    u, v, w, volumes: VolumeGrids, states: FaceStates, viscosity_node, dt,
    cfg: SimConfig, row_masks=None,
) -> ViscositySystem:
    """`row_masks` (maskU, maskV, maskW) overrides the index-range row
    eligibility (default: [1, size) per axis, the reference's assembly loop
    bounds). The shard_map pipeline passes slab-aware masks relative to the
    GLOBAL domain."""
    factor = jnp.float32(dt / (cfg.dx * cfg.dx))
    visc = viscosity_node

    def vr(offset, shape):
        return shifted_read(visc, offset, shape)

    def avg4(shape, offsets):
        return 0.25 * sum(vr(o, shape) for o in offsets)

    us, vs, ws = u.shape, v.shape, w.shape
    if row_masks is None:
        row_masks = (
            _row_range_mask(us, cfg),
            _row_range_mask(vs, cfg),
            _row_range_mask(ws, cfg),
        )

    # ---- U rows (viscositysolver.cpp:374-469) ----
    visc_r = vr((0, 0, 0), us)
    visc_l = vr((-1, 0, 0), us)
    visc_t = avg4(us, [(-1, 1, 0), (-1, 0, 0), (0, 1, 0), (0, 0, 0)])
    visc_b = avg4(us, [(-1, 0, 0), (-1, -1, 0), (0, 0, 0), (0, -1, 0)])
    visc_f = avg4(us, [(-1, 0, 1), (-1, 0, 0), (0, 0, 1), (0, 0, 0)])
    visc_k = avg4(us, [(-1, 0, 0), (-1, 0, -1), (0, 0, 0), (0, 0, -1)])
    vol_r = shifted_read(volumes.center, (0, 0, 0), us)
    vol_l = shifted_read(volumes.center, (-1, 0, 0), us)
    vol_t = shifted_read(volumes.edge_w, (0, 1, 0), us)
    vol_b = shifted_read(volumes.edge_w, (0, 0, 0), us)
    vol_f = shifted_read(volumes.edge_v, (0, 0, 1), us)
    vol_k = shifted_read(volumes.edge_v, (0, 0, 0), us)
    fU = {
        "r": 2 * factor * visc_r * vol_r,
        "l": 2 * factor * visc_l * vol_l,
        "t": factor * visc_t * vol_t,
        "b": factor * visc_b * vol_b,
        "f": factor * visc_f * vol_f,
        "k": factor * visc_k * vol_k,
    }
    vol_u_face = shifted_read(volumes.u, (0, 0, 0), us)
    diag_u = vol_u_face + fU["r"] + fU["l"] + fU["t"] + fU["b"] + fU["f"] + fU["k"]

    # ---- V rows (":472-568") ----
    visc_r = avg4(vs, [(0, -1, 0), (1, -1, 0), (0, 0, 0), (1, 0, 0)])
    visc_l = avg4(vs, [(0, -1, 0), (-1, -1, 0), (0, 0, 0), (-1, 0, 0)])
    visc_t = vr((0, 0, 0), vs)
    visc_b = vr((0, -1, 0), vs)
    visc_f = avg4(vs, [(0, -1, 0), (0, -1, 1), (0, 0, 0), (0, 0, 1)])
    visc_k = avg4(vs, [(0, -1, 0), (0, -1, -1), (0, 0, 0), (0, 0, -1)])
    vol_r = shifted_read(volumes.edge_w, (1, 0, 0), vs)
    vol_l = shifted_read(volumes.edge_w, (0, 0, 0), vs)
    vol_t = shifted_read(volumes.center, (0, 0, 0), vs)
    vol_b = shifted_read(volumes.center, (0, -1, 0), vs)
    vol_f = shifted_read(volumes.edge_u, (0, 0, 1), vs)
    vol_k = shifted_read(volumes.edge_u, (0, 0, 0), vs)
    fV = {
        "r": factor * visc_r * vol_r,
        "l": factor * visc_l * vol_l,
        "t": 2 * factor * visc_t * vol_t,
        "b": 2 * factor * visc_b * vol_b,
        "f": factor * visc_f * vol_f,
        "k": factor * visc_k * vol_k,
    }
    vol_v_face = shifted_read(volumes.v, (0, 0, 0), vs)
    diag_v = vol_v_face + fV["r"] + fV["l"] + fV["t"] + fV["b"] + fV["f"] + fV["k"]

    # ---- W rows (":570-664") ----
    visc_r = avg4(ws, [(0, 0, 0), (0, 0, -1), (1, 0, 0), (1, 0, -1)])
    visc_l = avg4(ws, [(0, 0, 0), (0, 0, -1), (-1, 0, 0), (-1, 0, -1)])
    visc_t = avg4(ws, [(0, 0, 0), (0, 0, -1), (0, 1, 0), (0, 1, -1)])
    visc_b = avg4(ws, [(0, 0, 0), (0, 0, -1), (0, -1, 0), (0, -1, -1)])
    visc_f = vr((0, 0, 0), ws)
    visc_k = vr((0, 0, -1), ws)
    vol_r = shifted_read(volumes.edge_v, (1, 0, 0), ws)
    vol_l = shifted_read(volumes.edge_v, (0, 0, 0), ws)
    vol_t = shifted_read(volumes.edge_u, (0, 1, 0), ws)
    vol_b = shifted_read(volumes.edge_u, (0, 0, 0), ws)
    vol_f = shifted_read(volumes.center, (0, 0, 0), ws)
    vol_k = shifted_read(volumes.center, (0, 0, -1), ws)
    fW = {
        "r": factor * visc_r * vol_r,
        "l": factor * visc_l * vol_l,
        "t": factor * visc_t * vol_t,
        "b": factor * visc_b * vol_b,
        "f": 2 * factor * visc_f * vol_f,
        "k": 2 * factor * visc_k * vol_k,
    }
    vol_w_face = shifted_read(volumes.w, (0, 0, 0), ws)
    diag_w = vol_w_face + fW["r"] + fW["l"] + fW["t"] + fW["b"] + fW["f"] + fW["k"]

    # ---- row masks (":276-366") ----
    in_u = (
        row_masks[0]
        & ~states.solid_u
        & (
            (shifted_read(volumes.u, (0, 0, 0), us) > 0)
            | (shifted_read(volumes.center, (0, 0, 0), us) > 0)
            | (shifted_read(volumes.center, (-1, 0, 0), us) > 0)
            | (shifted_read(volumes.edge_w, (0, 1, 0), us) > 0)
            | (shifted_read(volumes.edge_w, (0, 0, 0), us) > 0)
            | (shifted_read(volumes.edge_v, (0, 0, 1), us) > 0)
            | (shifted_read(volumes.edge_v, (0, 0, 0), us) > 0)
        )
    )
    in_v = (
        row_masks[1]
        & ~states.solid_v
        & (
            (shifted_read(volumes.v, (0, 0, 0), vs) > 0)
            | (shifted_read(volumes.edge_w, (1, 0, 0), vs) > 0)
            | (shifted_read(volumes.edge_w, (0, 0, 0), vs) > 0)
            | (shifted_read(volumes.center, (0, 0, 0), vs) > 0)
            | (shifted_read(volumes.center, (0, -1, 0), vs) > 0)
            | (shifted_read(volumes.edge_u, (0, 0, 1), vs) > 0)
            | (shifted_read(volumes.edge_u, (0, 0, 0), vs) > 0)
        )
    )
    in_w = (
        row_masks[2]
        & ~states.solid_w
        & (
            (shifted_read(volumes.w, (0, 0, 0), ws) > 0)
            | (shifted_read(volumes.edge_v, (1, 0, 0), ws) > 0)
            | (shifted_read(volumes.edge_v, (0, 0, 0), ws) > 0)
            | (shifted_read(volumes.edge_u, (0, 1, 0), ws) > 0)
            | (shifted_read(volumes.edge_u, (0, 0, 0), ws) > 0)
            | (shifted_read(volumes.center, (0, 0, 0), ws) > 0)
            | (shifted_read(volumes.center, (0, 0, -1), ws) > 0)
        )
    )
    in_mat = (in_u, in_v, in_w)
    # Premask all coefficients by their row mask: the operator output is then
    # zero outside rows by construction (no output masking pass needed), and
    # column gating still comes from x being supported on rows only.
    diag = (
        jnp.where(in_u, diag_u, 0.0),
        jnp.where(in_v, diag_v, 0.0),
        jnp.where(in_w, diag_w, 0.0),
    )
    fU = {k: jnp.where(in_u, v, 0.0) for k, v in fU.items()}
    fV = {k: jnp.where(in_v, v, 0.0) for k, v in fV.items()}
    fW = {k: jnp.where(in_w, v, 0.0) for k, v in fW.items()}
    vol = (vol_u_face, vol_v_face, vol_w_face)
    factors = (fU, fV, fW)

    # ---- RHS: vol*vel minus coupling applied to solid-Dirichlet velocities
    # (":448-465" and V/W analogues) ----
    su = states.solid_u.astype(jnp.float32)
    sv = states.solid_v.astype(jnp.float32)
    sw = states.solid_w.astype(jnp.float32)
    cu, cv, cw = _apply_coupling(factors, u * su, v * sv, w * sw, cfg)
    rhs_u = jnp.where(in_u, vol_u_face * u - cu, 0.0)
    rhs_v = jnp.where(in_v, vol_v_face * v - cv, 0.0)
    rhs_w = jnp.where(in_w, vol_w_face * w - cw, 0.0)

    return ViscositySystem(in_mat, diag, vol, factors, (rhs_u, rhs_v, rhs_w))


def _apply_coupling(factors, xu, xv, xw, cfg: SimConfig):
    """Off-diagonal part of the coupled operator: for each row, the sum of
    coefficient * x over all 14 neighbor couplings (6 same-component + 8
    cross-component), with the signs of viscositysolver.cpp:431-446, 529-544,
    627-642."""
    fU, fV, fW = factors
    us, vs, ws = xu.shape, xv.shape, xw.shape

    def s(x, o, shape):
        return shifted_read(x, o, shape)

    yu = (
        -fU["r"] * s(xu, (1, 0, 0), us) - fU["l"] * s(xu, (-1, 0, 0), us)
        - fU["t"] * s(xu, (0, 1, 0), us) - fU["b"] * s(xu, (0, -1, 0), us)
        - fU["f"] * s(xu, (0, 0, 1), us) - fU["k"] * s(xu, (0, 0, -1), us)
        - fU["t"] * s(xv, (0, 1, 0), us) + fU["t"] * s(xv, (-1, 1, 0), us)
        + fU["b"] * s(xv, (0, 0, 0), us) - fU["b"] * s(xv, (-1, 0, 0), us)
        - fU["f"] * s(xw, (0, 0, 1), us) + fU["f"] * s(xw, (-1, 0, 1), us)
        + fU["k"] * s(xw, (0, 0, 0), us) - fU["k"] * s(xw, (-1, 0, 0), us)
    )
    yv = (
        -fV["r"] * s(xv, (1, 0, 0), vs) - fV["l"] * s(xv, (-1, 0, 0), vs)
        - fV["t"] * s(xv, (0, 1, 0), vs) - fV["b"] * s(xv, (0, -1, 0), vs)
        - fV["f"] * s(xv, (0, 0, 1), vs) - fV["k"] * s(xv, (0, 0, -1), vs)
        - fV["r"] * s(xu, (1, 0, 0), vs) + fV["r"] * s(xu, (1, -1, 0), vs)
        + fV["l"] * s(xu, (0, 0, 0), vs) - fV["l"] * s(xu, (0, -1, 0), vs)
        - fV["f"] * s(xw, (0, 0, 1), vs) + fV["f"] * s(xw, (0, -1, 1), vs)
        + fV["k"] * s(xw, (0, 0, 0), vs) - fV["k"] * s(xw, (0, -1, 0), vs)
    )
    yw = (
        -fW["r"] * s(xw, (1, 0, 0), ws) - fW["l"] * s(xw, (-1, 0, 0), ws)
        - fW["t"] * s(xw, (0, 1, 0), ws) - fW["b"] * s(xw, (0, -1, 0), ws)
        - fW["f"] * s(xw, (0, 0, 1), ws) - fW["k"] * s(xw, (0, 0, -1), ws)
        - fW["r"] * s(xu, (1, 0, 0), ws) + fW["r"] * s(xu, (1, 0, -1), ws)
        + fW["l"] * s(xu, (0, 0, 0), ws) - fW["l"] * s(xu, (0, 0, -1), ws)
        - fW["t"] * s(xv, (0, 1, 0), ws) + fW["t"] * s(xv, (0, 1, -1), ws)
        + fW["b"] * s(xv, (0, 0, 0), ws) - fW["b"] * s(xv, (0, 0, -1), ws)
    )
    return yu, yv, yw


def apply_viscosity_matrix(sys: ViscositySystem, x, cfg: SimConfig):
    """Coupled operator apply; coefficients are premasked at build time so
    the output is supported on rows with no masking pass."""
    xu, xv, xw = x
    cu, cv, cw = _apply_coupling(sys.factors, xu, xv, xw, cfg)
    return (
        sys.diag[0] * xu + cu,
        sys.diag[1] * xv + cv,
        sys.diag[2] * xw + cw,
    )


def solve_viscosity(sys: ViscositySystem, cfg: SimConfig, warm_start=None):
    """PCG on the coupled system; relative inf-norm tolerance like the
    reference PCGSolver (pcgsolver.h:255-258). `warm_start` (the pre-solve
    velocity field, masked to rows) typically cuts iterations substantially
    versus the reference's zero start while converging to the same solution.
    """
    rhs = sys.rhs
    bnorm = jnp.max(
        jnp.stack([jnp.max(jnp.abs(r)) for r in rhs])
    )
    tol = jnp.float32(cfg.viscosity_solve_rtol) * bnorm
    diag_masked = sys.diag  # premasked at build time
    x0 = None
    if warm_start is not None:
        x0 = tuple(
            jnp.where(m, x, 0.0) for m, x in zip(sys.in_mat, warm_start)
        )
    if cfg.viscosity_preconditioner == "multigrid":
        from .multigrid import viscosity_mg_preconditioner

        precon = viscosity_mg_preconditioner(sys, cfg)
    else:
        precon = jacobi_preconditioner(diag_masked)
    result = pcg(
        lambda x: apply_viscosity_matrix(sys, x, cfg),
        rhs,
        precon,
        tol,
        cfg.viscosity_solve_max_iterations,
        x0=x0,
    )
    return result


def apply_viscosity_solution(u, v, w, sys: ViscositySystem, result, cfg):
    """Write the solution back to matrix faces, zero all other faces
    (viscositysolver.cpp:692-727); on failure (not converged and residual >=
    acceptable threshold) the velocity field is left untouched
    (fluidsimulation.cpp:193-195 via the solver's bool return)."""
    xu, xv, xw = result.x
    ok = result.converged | (result.residual < cfg.viscosity_acceptable_error)
    u_new = jnp.where(sys.in_mat[0], xu, 0.0)
    v_new = jnp.where(sys.in_mat[1], xv, 0.0)
    w_new = jnp.where(sys.in_mat[2], xw, 0.0)
    u = jnp.where(ok, u_new, u)
    v = jnp.where(ok, v_new, v)
    w = jnp.where(ok, w_new, w)
    return u, v, w
