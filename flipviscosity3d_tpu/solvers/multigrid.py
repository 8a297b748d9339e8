"""Semi-geometric multigrid V-cycle preconditioner for 7-point operators.

The reference preconditions with MIC(0) — a sequential triangular solve that
cannot run on TPU. Jacobi (the default here) is fully parallel but leaves
CG iteration counts growing with resolution. This module provides a stronger
TPU-parallel option: a block-diagonal V-cycle that approximately inverts
each velocity component's own 7-point sub-operator (the U-U/V-V/W-W blocks
of the coupled viscosity system), ignoring the cross-component couplings.

Design notes:
- Every level is an explicitly SYMMETRIC graph Laplacian + mass operator:
  per-axis undirected link strengths L (the row-masked factor grids alone
  are *not* symmetric as a standalone stencil — the mask breaks
  f_r(c) == f_l(c+1) — which makes naive V-cycles indefinite and stalls CG;
  links here couple only in-mask pairs, so all intermediate V-cycle vectors
  see a symmetric PSD operator).
- Symmetric damped-Jacobi smoothing, trilinear prolongation with
  full-weighting restriction (its adjoint/8), link coarsening by mean
  pooling with the 1/2 series scaling of a rediscretized Laplacian.

Status: EXPERIMENTAL (SimConfig.viscosity_preconditioner="multigrid").
On full-liquid interiors it cuts CG iterations 3-5x (56 -> 12 at 16^3).
On free-surface scenes the coarsened operator mishandles the partial-volume
boundary rows and the cycle stalls below Jacobi quality — measured at 32^3
across 2-4 levels and both 1/2 and 1/4 link scalings. Fixing this needs
boundary-aware coarsening (e.g. Galerkin RAP with the ghost-volume terms),
left for a future round; Jacobi remains the default.
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
    links: tuple  # per axis: L[c] couples c <-> c+axis_hat


def _apply(level: MGLevel, x):
    """y = diag*x - sum_axis (L*x(+ax) shifted both ways). Symmetric."""
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


def _pool(a):
    """2x2x2 mean pooling for coefficient coarsening."""
    a = _pad_to_even(a)
    s = a.shape
    return a.reshape(s[0] // 2, 2, s[1] // 2, 2, s[2] // 2, 2).mean(
        axis=(1, 3, 5)
    )


def _prolong_axis(a, axis):
    """Cell-centered linear interpolation along one axis (length doubles):
    fine[2i] = 0.75 a[i] + 0.25 a[i-1]; fine[2i+1] = 0.75 a[i] + 0.25 a[i+1]
    (zero extension at the ends)."""
    am = shifted_read(a, _off(axis, -1), a.shape)
    ap = shifted_read(a, _off(axis, +1), a.shape)
    even = 0.75 * a + 0.25 * am
    odd = 0.75 * a + 0.25 * ap
    stacked = jnp.stack([even, odd], axis=axis + 1)
    s = list(a.shape)
    s[axis] *= 2
    return stacked.reshape(s)


def _prolong(a, fine_shape):
    for axis in _AXES:
        a = _prolong_axis(a, axis)
    return a[: fine_shape[0], : fine_shape[1], : fine_shape[2]]


def _restrict_axis(f, axis):
    """Adjoint of _prolong_axis scaled by 1/2 (full weighting):
    coarse[i] = (0.25 f[2i-1] + 0.75 f[2i] + 0.75 f[2i+1] + 0.25 f[2i+2])/2.
    """
    s = list(f.shape)
    n2 = s[axis] // 2
    split_shape = s[:axis] + [n2, 2] + s[axis + 1 :]
    fs = f.reshape(split_shape)
    fe = jnp.take(fs, 0, axis=axis + 1)
    fo = jnp.take(fs, 1, axis=axis + 1)
    fo_m = shifted_read(fo, _off(axis, -1), fo.shape)  # f[2i-1]
    fe_p = shifted_read(fe, _off(axis, +1), fe.shape)  # f[2i+2]
    return 0.5 * (0.75 * (fe + fo) + 0.25 * (fo_m + fe_p))


def _restrict(f):
    f = _pad_to_even(f)
    for axis in _AXES:
        f = _restrict_axis(f, axis)
    return f


def build_levels(diag, dir_factors, mask, n_levels: int):
    """Construct the level hierarchy from the (premasked) component block.

    dir_factors: {"r","l","t","b","f","k"} directional factor grids of the
    component's own 7-point block (already zero outside rows). The symmetric
    undirected link on axis `ax` is the "+": f_{r|t|f}(c) gated by the
    neighbor's mask. The diagonal keeps the full system diagonal (which also
    holds solid-Dirichlet and cross-component contributions), preserving
    diagonal dominance and hence PSD at every level.
    """
    mask_f = mask.astype(diag.dtype)
    plus_keys = ("r", "t", "f")
    links = tuple(
        dir_factors[k]
        * mask_f
        * shifted_read(mask_f, _off(ax, +1), mask_f.shape)
        for ax, k in zip(_AXES, plus_keys)
    )
    levels = [MGLevel(diag, links)]
    for _ in range(n_levels - 1):
        cur = levels[-1]
        incident = sum(
            cur.links[ax] + shifted_read(cur.links[ax], _off(ax, -1),
                                         cur.links[ax].shape)
            for ax in _AXES
        )
        mass = jnp.maximum(cur.diag - incident, 0.0)
        mass_c = _pool(mass)
        links_c = tuple(0.5 * _pool(cur.links[ax]) for ax in _AXES)
        incident_c = sum(
            links_c[ax] + shifted_read(links_c[ax], _off(ax, -1),
                                       links_c[ax].shape)
            for ax in _AXES
        )
        levels.append(MGLevel(mass_c + incident_c, links_c))
        if min(levels[-1].diag.shape) <= 4:
            break
    return levels


def _smooth(level: MGLevel, x, b, iters: int, omega: float = 0.7):
    inv = jnp.where(
        level.diag > 0,
        1.0 / jnp.where(level.diag == 0, 1.0, level.diag),
        0.0,
    )
    for _ in range(iters):
        r = b - _apply(level, x)
        x = x + omega * inv * r
    return x


def v_cycle(levels, b, pre: int = 2, post: int = 2, coarse_iters: int = 20):
    """One V(pre,post) cycle solving A x ~= b from x=0; symmetric in b."""

    def cycle(lvl: int, b):
        level = levels[lvl]
        if lvl == len(levels) - 1:
            return _smooth(level, jnp.zeros_like(b), b, coarse_iters)
        x = _smooth(level, jnp.zeros_like(b), b, pre)
        r = b - _apply(level, x)
        xc = cycle(lvl + 1, _restrict(r))
        x = x + _prolong(xc, b.shape)
        x = _smooth(level, x, b, post)
        return x

    return cycle(0, b)


def viscosity_mg_preconditioner(sys, cfg, n_levels: int = 4):
    """Block-diagonal multigrid preconditioner for the coupled viscosity
    system: each component preconditioned by a V-cycle on its own 7-point
    block; cross couplings are left to the outer CG."""
    comp_levels = []
    for c in range(3):
        comp_levels.append(
            build_levels(sys.diag[c], sys.factors[c], sys.in_mat[c], n_levels)
        )

    def apply_M(r):
        return tuple(
            jnp.where(m, v_cycle(levels, jnp.where(m, ri, 0.0)), 0.0)
            for levels, ri, m in zip(comp_levels, r, sys.in_mat)
        )

    return apply_M
