"""Galerkin aggregation multigrid V-cycle preconditioner for 7-point blocks.

The reference preconditions both solvers with MIC(0)
(/root/reference/src/pcgsolver/pcgsolver.h:62-178,
/root/reference/src/pressuresolver.cpp:324-462) — a sequential triangular
solve with no TPU analogue. This module is the TPU-parallel replacement: a
multigrid V-cycle used as the CG preconditioner for the pressure system and
for the three diagonal blocks of the coupled viscosity system.

Why aggregation (piecewise-constant) transfers: with P = "each fine cell
takes its coarse parent's value" over 2x2x2 blocks and R = P^T, the Galerkin
coarse operator A_c = P^T A P of any 7-point operator is again *exactly* a
7-point operator (cells of edge/corner-adjacent blocks are never face
neighbors), so every level can be computed in closed form as sum-poolings of
the fine diagonal and link grids:

    L_c[I -> I+ax] = sum of fine links crossing the block face
                     (odd-index links, 1x2x2 pooled)
    diag_c[I]      = sum of fine diagonals in the block
                     - 2 * sum of links internal to the block

This makes every level the exact P^T A P — in particular the ghost-fluid /
partial-volume free-surface rows are *summed*, not rediscretized, which is
what the round-1 semi-geometric coarsening got wrong (it rescaled pooled
links as a resized Laplacian and stalled on free-surface scenes). A_c is SPD
whenever A is PSD, so the V-cycle with symmetric smoothing is a valid SPD
preconditioner at any depth.

Pure aggregation transfers underestimate smooth corrections (the classical
O(1-1/cycle) aggregation deficiency), compensated here the standard way with
an over-correction factor on the prolongated coarse update (cfg.mg_coarse_scale,
~1.6-1.9 optimal for 3D Poisson-like operators) — the scaling keeps the
preconditioner symmetric.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.grids import shifted_read

_AXES = (0, 1, 2)


def _off(axis, sign):
    o = [0, 0, 0]
    o[axis] = sign
    return tuple(o)


class MGLevel(NamedTuple):
    diag: jnp.ndarray
    links: tuple       # per axis: L[c] >= 0 couples c <-> c+ax_hat, A[c,c+ax] = -L[c]
    inv_diag: jnp.ndarray


def _level(diag, links):
    inv = jnp.where(diag > 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
    return MGLevel(diag, links, inv)


def _apply(level: MGLevel, x):
    """y = diag*x - sum_ax (L*x(+ax) + shifted(L*x)). Symmetric by design."""
    shape = x.shape
    y = level.diag * x
    for ax in _AXES:
        L = level.links[ax]
        y = y - L * shifted_read(x, _off(ax, +1), shape)
        y = y - shifted_read(L * x, _off(ax, -1), shape)
    return y


def _pad_to_even(a):
    pads = [(0, s % 2) for s in a.shape]
    if any(p != (0, 0) for p in pads):
        a = jnp.pad(a, pads)
    return a


def _pool_sum(a):
    """2x2x2 sum pooling = R (restriction) for piecewise-constant aggregates."""
    a = _pad_to_even(a)
    s = a.shape
    return a.reshape(s[0] // 2, 2, s[1] // 2, 2, s[2] // 2, 2).sum(
        axis=(1, 3, 5)
    )


def _prolong(a, fine_shape):
    """P: replicate each coarse cell into its 2x2x2 block (R^T exactly)."""
    i, j, k = a.shape
    b = jnp.broadcast_to(
        a[:, None, :, None, :, None], (i, 2, j, 2, k, 2)
    ).reshape(2 * i, 2 * j, 2 * k)
    return b[: fine_shape[0], : fine_shape[1], : fine_shape[2]]


def _parity_mask(shape, axis, dtype):
    """1.0 at odd indices along `axis` (links crossing an aggregate face)."""
    n = shape[axis]
    idx = jnp.arange(n, dtype=jnp.int32) % 2
    view = [1, 1, 1]
    view[axis] = n
    return idx.reshape(view).astype(dtype)


def _coarsen(level: MGLevel) -> MGLevel:
    """Exact Galerkin A_c = P^T A P, in closed form (see module docstring)."""
    diag, links = level.diag, level.links
    new_links = []
    internal_total = 0.0
    for ax in _AXES:
        L = links[ax]
        odd = _parity_mask(L.shape, ax, L.dtype)
        new_links.append(_pool_sum(L * odd))
        internal_total = internal_total + _pool_sum(L * (1.0 - odd))
    diag_c = _pool_sum(diag) - 2.0 * internal_total
    return _level(diag_c, tuple(new_links))


def _dense_coarse_inverse(level: MGLevel):
    """Explicit symmetric inverse of the coarsest operator (a few hundred
    rows). Off-mask rows (diag == 0 after coarsening) get an identity row so
    the inverse exists; they only ever see zero residuals. Computed once per
    solve; each V-cycle's coarse solve is then a single small matmul instead
    of dozens of tiny smoothing kernels (which are dispatch-bound on TPU)."""
    shape = level.diag.shape
    n = shape[0] * shape[1] * shape[2]
    diag_flat = level.diag.ravel()
    A = jnp.zeros((n, n), level.diag.dtype)
    A = A.at[jnp.arange(n), jnp.arange(n)].set(
        jnp.where(diag_flat > 0, diag_flat, 1.0)
    )
    strides = (shape[1] * shape[2], shape[2], 1)
    idx = jnp.arange(n)
    for ax in _AXES:
        # boundary links are zero by construction, so the wrapped flat index
        # of the last cell along `ax` only ever adds zeros
        L = level.links[ax].ravel()
        j = idx + strides[ax]
        valid = j < n
        jc = jnp.where(valid, j, 0)
        Lv = jnp.where(valid, L, 0.0)
        A = A.at[idx, jc].add(-Lv)
        A = A.at[jc, idx].add(-Lv)
    inv = jnp.linalg.inv(A)
    return 0.5 * (inv + inv.T)  # exact symmetry for CG


class MGHierarchy(NamedTuple):
    levels: tuple
    coarse_inv: jnp.ndarray


def build_hierarchy(diag, links, cfg) -> MGHierarchy:
    """Level hierarchy from the premasked fine operator; coarsening stops
    once the grid fits a direct dense solve (min dim <= mg_coarse_size)."""
    levels = [_level(diag, links)]
    for _ in range(cfg.mg_max_levels - 1):
        if min(levels[-1].diag.shape) <= cfg.mg_coarse_size:
            break
        levels.append(_coarsen(levels[-1]))
    return MGHierarchy(tuple(levels), _dense_coarse_inverse(levels[-1]))


def _smooth(level: MGLevel, x, b, iters: int, omega: float):
    for _ in range(iters):
        r = b - _apply(level, x)
        x = x + omega * level.inv_diag * r
    return x


def v_cycle(hier: MGHierarchy, b, pre: int, post: int, omega: float,
            coarse_scale: float):
    """One V(pre,post) cycle from x=0; symmetric linear operator in b."""
    levels = hier.levels

    def cycle(lvl: int, b):
        level = levels[lvl]
        if lvl == len(levels) - 1:
            return (hier.coarse_inv @ b.ravel()).reshape(b.shape)
        x = _smooth(level, jnp.zeros_like(b), b, pre, omega)
        r = b - _apply(level, x)
        xc = cycle(lvl + 1, _pool_sum(r))
        x = x + coarse_scale * _prolong(xc, b.shape)
        x = _smooth(level, x, b, post, omega)
        return x

    return cycle(0, b)


def component_links(dir_factors, mask):
    """Undirected link grids of one component's own 7-point block.

    dir_factors holds the premasked directional factor grids {"r","l","t",
    "b","f","k"}; for an in-mask pair the '+' directional factor equals the
    neighbor's '-' one (the system is symmetric,
    /root/reference/src/viscositysolver.cpp:397-446), so the link is the '+'
    factor gated by both masks.
    """
    mask_f = mask.astype(dir_factors["r"].dtype)
    plus_keys = ("r", "t", "f")
    return tuple(
        dir_factors[k]
        * mask_f
        * shifted_read(mask_f, _off(ax, +1), mask_f.shape, fill=0.0)
        for ax, k in zip(_AXES, plus_keys)
    )


def viscosity_mg_preconditioner(sys, cfg):
    """Block-diagonal multigrid preconditioner for the coupled viscosity
    system: each velocity component is preconditioned by a V-cycle on its own
    7-point diagonal block (cross-component couplings are left to the outer
    CG; they are bounded by the same-component ones, so the block V-cycle
    still collapses the stiff dt*mu/dx^2 spectrum that drives iteration
    counts)."""
    comp_hier = []
    for c in range(3):
        links = component_links(sys.factors[c], sys.in_mat[c])
        comp_hier.append(build_hierarchy(sys.diag[c], links, cfg))

    def apply_M(r):
        return tuple(
            jnp.where(
                m,
                v_cycle(
                    hier, jnp.where(m, ri, 0.0),
                    cfg.mg_pre_smooth, cfg.mg_post_smooth,
                    cfg.mg_omega, cfg.mg_coarse_scale,
                ),
                0.0,
            )
            for hier, ri, m in zip(comp_hier, r, sys.in_mat)
        )

    return apply_M


def pressure_mg_preconditioner(sys, cfg):
    """Multigrid preconditioner for the 7-point ghost-fluid pressure system
    (the reference uses MIC(0) here, pressuresolver.cpp:324-462). plus_*
    grids store A[c, c+ax] (negative for fluid-fluid couplings); gate by the
    row mask on both sides so links only couple actual rows."""
    fluid_f = sys.fluid.astype(sys.diag.dtype)
    links = tuple(
        (-plus)
        * fluid_f
        * shifted_read(fluid_f, _off(ax, +1), fluid_f.shape, fill=0.0)
        for ax, plus in zip(_AXES, (sys.plus_i, sys.plus_j, sys.plus_k))
    )
    diag = jnp.where(sys.fluid, sys.diag, 0.0)
    hier = build_hierarchy(diag, links, cfg)

    def apply_M(r):
        return jnp.where(
            sys.fluid,
            v_cycle(
                hier, jnp.where(sys.fluid, r, 0.0),
                cfg.mg_pre_smooth, cfg.mg_post_smooth,
                cfg.mg_omega, cfg.mg_coarse_scale,
            ),
            0.0,
        )

    return apply_M
