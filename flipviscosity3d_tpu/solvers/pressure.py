"""Variational ghost-fluid pressure projection, matrix-free.

Reimplements the reference PressureSolver
(/root/reference/src/pressuresolver.cpp:160-567) as dense coefficient grids +
a 7-point stencil operator under PCG:

- rows exist for interior fluid cells (liquid phi < 0, indices in
  [1, size-2]) (pressuresolver.cpp:207-215)
- RHS = weighted negative divergence / dx (pressuresolver.cpp:227-246)
- per-face term = solid-open weight * dt/dx^2; fluid neighbor -> symmetric
  off-diagonal; air neighbor -> ghost-fluid diag boost term/theta with
  theta = max(liquid face fraction, 0.01) (pressuresolver.cpp:248-322)
- the reference's sequential MICCG(0) preconditioner is replaced by a
  parallel one (Jacobi); the CG loop itself matches
  pressuresolver.cpp:521-567 with an absolute inf-norm tolerance extended by
  a float32-appropriate relative floor

and the pressure application to faces (fluidsimulation.cpp:598-688).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import SimConfig
from ..ops.grids import (
    face_borders_fluid_u,
    face_borders_fluid_v,
    face_borders_fluid_w,
    range_mask,
    shifted_read,
)
from ..ops.levelset import fraction_inside
from .pcg import PCGResult, jacobi_preconditioner, pcg


class PressureSystem(NamedTuple):
    fluid: jnp.ndarray      # (I,J,K) bool: row mask (interior fluid cells)
    diag: jnp.ndarray       # (I,J,K)
    plus_i: jnp.ndarray     # coupling to (i+1,j,k)
    plus_j: jnp.ndarray
    plus_k: jnp.ndarray
    b: jnp.ndarray          # RHS (negative divergence)
    theta_u: jnp.ndarray    # (I+1,J,K) clamped liquid face fractions
    theta_v: jnp.ndarray
    theta_w: jnp.ndarray


def liquid_face_weights(liquid_phi):
    """1D inside-fractions on every interior face
    (ParticleLevelSet::getFaceWeight*, particlelevelset.cpp:54-75).
    Boundary faces (index 0 and size) are returned as 0; they are never read
    by the solver (rows are interior cells only)."""
    zero_u = jnp.zeros((1,) + liquid_phi.shape[1:], liquid_phi.dtype)
    fw_u = jnp.concatenate(
        [zero_u, fraction_inside(liquid_phi[:-1], liquid_phi[1:]), zero_u], axis=0
    )
    zero_v = jnp.zeros((liquid_phi.shape[0], 1, liquid_phi.shape[2]), liquid_phi.dtype)
    fw_v = jnp.concatenate(
        [zero_v, fraction_inside(liquid_phi[:, :-1], liquid_phi[:, 1:]), zero_v],
        axis=1,
    )
    zero_w = jnp.zeros(liquid_phi.shape[:2] + (1,), liquid_phi.dtype)
    fw_w = jnp.concatenate(
        [zero_w, fraction_inside(liquid_phi[:, :, :-1], liquid_phi[:, :, 1:]), zero_w],
        axis=2,
    )
    return fw_u, fw_v, fw_w


def build_pressure_system(
    u, v, w, liquid_phi, weight_u, weight_v, weight_w, dt, cfg: SimConfig,
    interior=None,
) -> PressureSystem:
    """`interior` overrides the row-eligibility mask (default: cells with
    indices in [1, size-2] on every axis, pressuresolver.cpp:207-215). The
    shard_map pipeline passes a slab-aware mask instead: interior relative
    to the GLOBAL domain, not the local slab."""
    shape = liquid_phi.shape
    if interior is None:
        interior = range_mask(
            shape, (1, 1, 1), (shape[0] - 1, shape[1] - 1, shape[2] - 1)
        )
    fluid = (liquid_phi < 0) & interior
    fluid_f = fluid.astype(jnp.float32)

    # RHS: b = (w_u(i)u(i) - w_u(i+1)u(i+1) + ... ) / dx  (":227-246")
    div = (
        weight_u[:-1] * u[:-1] - weight_u[1:] * u[1:]
        + weight_v[:, :-1] * v[:, :-1] - weight_v[:, 1:] * v[:, 1:]
        + weight_w[:, :, :-1] * w[:, :, :-1] - weight_w[:, :, 1:] * w[:, :, 1:]
    ) / cfg.dx
    b = div * fluid_f

    scale = jnp.float32(dt / (cfg.dx * cfg.dx))
    fw_u, fw_v, fw_w = liquid_face_weights(liquid_phi)
    theta_u = jnp.maximum(fw_u, cfg.minfrac)
    theta_v = jnp.maximum(fw_v, cfg.minfrac)
    theta_w = jnp.maximum(fw_w, cfg.minfrac)

    diag = jnp.zeros(shape, jnp.float32)
    plus = {}
    # (axis, direction) -> (face weight grid slice at the face between c and
    # neighbor, neighbor phi, theta at that face)
    specs = [
        (0, +1, weight_u[1:], theta_u[1:]),
        (0, -1, weight_u[:-1], theta_u[:-1]),
        (1, +1, weight_v[:, 1:], theta_v[:, 1:]),
        (1, -1, weight_v[:, :-1], theta_v[:, :-1]),
        (2, +1, weight_w[:, :, 1:], theta_w[:, :, 1:]),
        (2, -1, weight_w[:, :, :-1], theta_w[:, :, :-1]),
    ]
    for axis, sign, wgt, theta in specs:
        off = [0, 0, 0]
        off[axis] = sign
        nphi = shifted_read(liquid_phi, tuple(off), shape, fill=jnp.inf)
        term = wgt * scale
        nb_fluid = nphi < 0
        diag = diag + jnp.where(nb_fluid, term, term / theta) * fluid_f
        if sign == +1:
            plus[axis] = jnp.where(nb_fluid & fluid, -term, 0.0)
    return PressureSystem(
        fluid, diag, plus[0], plus[1], plus[2], b, theta_u, theta_v, theta_w
    )


def apply_pressure_matrix(sys: PressureSystem, x):
    """7-point SPD stencil apply (pressuresolver.cpp:464-499).

    plus_i(c) couples rows c and c+i_hat symmetrically; x is implicitly
    masked (zero outside rows) and the result is masked back.
    """
    shape = x.shape
    y = sys.diag * x
    for axis, plus in ((0, sys.plus_i), (1, sys.plus_j), (2, sys.plus_k)):
        up = [0, 0, 0]
        up[axis] = 1
        dn = [0, 0, 0]
        dn[axis] = -1
        y = y + plus * shifted_read(x, tuple(up), shape)
        y = y + shifted_read(plus * x, tuple(dn), shape)
    return jnp.where(sys.fluid, y, 0.0)


def solve_pressure(sys: PressureSystem, cfg: SimConfig) -> PCGResult:
    """MICCG in the reference (tol 1e-9 absolute, <=200 iterations,
    pressuresolver.cpp:521-567); here Jacobi-PCG with tol = max(abs_tol,
    rtol * ||b||_inf) to stay meaningful in float32."""
    bnorm = jnp.max(jnp.abs(sys.b))
    tol = jnp.maximum(
        jnp.float32(cfg.pressure_solve_tolerance),
        jnp.float32(cfg.pressure_solve_rtol) * bnorm,
    )
    if cfg.pressure_preconditioner == "multigrid":
        from .multigrid import pressure_mg_preconditioner

        precon = pressure_mg_preconditioner(sys, cfg)
    else:
        precon = jacobi_preconditioner(sys.diag)
    return pcg(
        lambda x: apply_pressure_matrix(sys, x),
        sys.b,
        precon,
        tol,
        cfg.pressure_solve_max_iterations,
    )


def apply_pressure(
    u, v, w, pressure, liquid_phi, weight_u, weight_v, weight_w, dt,
    cfg: SimConfig
):
    """Subtract the pressure gradient on valid faces; zero all others
    (fluidsimulation.cpp:598-688). `liquid_phi` decides face-borders-fluid
    over ALL cells (not just interior). Returns (u, v, w, valid_u, valid_v,
    valid_w)."""
    dx = cfg.dx
    fluid = liquid_phi < 0
    fw_u, fw_v, fw_w = liquid_face_weights(liquid_phi)

    # U faces: interior i in [1, I-1]
    shape_u = u.shape
    iu = range_mask(shape_u, (1, 0, 0), (shape_u[0] - 1, shape_u[1], shape_u[2]))
    borders_u = face_borders_fluid_u(fluid)
    theta = jnp.maximum(fw_u, cfg.minfrac)
    grad = jnp.zeros(shape_u, jnp.float32)
    grad = grad.at[1:-1].set(pressure[1:] - pressure[:-1])
    mask_u = iu & (weight_u > 0) & borders_u
    u_new = jnp.where(mask_u, u - dt * grad / (dx * theta), 0.0)

    shape_v = v.shape
    iv = range_mask(shape_v, (0, 1, 0), (shape_v[0], shape_v[1] - 1, shape_v[2]))
    borders_v = face_borders_fluid_v(fluid)
    theta = jnp.maximum(fw_v, cfg.minfrac)
    grad = jnp.zeros(shape_v, jnp.float32)
    grad = grad.at[:, 1:-1].set(pressure[:, 1:] - pressure[:, :-1])
    mask_v = iv & (weight_v > 0) & borders_v
    v_new = jnp.where(mask_v, v - dt * grad / (dx * theta), 0.0)

    shape_w = w.shape
    iw = range_mask(shape_w, (0, 0, 1), (shape_w[0], shape_w[1], shape_w[2] - 1))
    borders_w = face_borders_fluid_w(fluid)
    theta = jnp.maximum(fw_w, cfg.minfrac)
    grad = jnp.zeros(shape_w, jnp.float32)
    grad = grad.at[:, :, 1:-1].set(pressure[:, :, 1:] - pressure[:, :, :-1])
    mask_w = iw & (weight_w > 0) & borders_w
    w_new = jnp.where(mask_w, w - dt * grad / (dx * theta), 0.0)

    return u_new, v_new, w_new, mask_u, mask_v, mask_w
