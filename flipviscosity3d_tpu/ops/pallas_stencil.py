"""Pallas TPU kernel: fused coupled-viscosity stencil apply.

The viscosity CG iteration is the hot loop of the simulator (hundreds of
iterations per substep, each reading 3 velocity grids + 18 factor grids +
3 diagonals). The XLA formulation emits ~45 separate shifted-slice reads;
this kernel streams each input exactly once per block, keeps the halo logic
in VMEM, and fuses all three output components.

Layout contract (prepared by solvers/viscosity.py): every array is padded on
its leading (i) axis with `BI` zero rows in front and enough zero rows behind
to make the length `PI` a multiple of the block size `BI`, so the kernel
needs no boundary cases: block b covers rows [b*BI, (b+1)*BI) and the
prev/next blocks always exist. j/k shifts are handled on VMEM values with
zero fill at array edges (the reference's out-of-range-reads-zero semantics,
matching ops/grids.shifted_read).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BI = 2  # i-rows per block

_FKEYS = ("r", "l", "t", "b", "f", "k")


def _vmem_shift(ext, off, tgt_jk):
    """values[1+oi : 1+oi+BI] shifted by (oj, ok) with zero fill, cropped or
    zero-extended to (BI,) + tgt_jk."""
    oi, oj, ok = off
    a = ext[1 + oi : 1 + oi + BI]
    # desired: out[:, j, k] = a[:, j + oj, k + ok] for 0<=j+oj<a_j else 0
    aj, ak = a.shape[1], a.shape[2]
    tj, tk = tgt_jk
    pj_lo = max(0, -oj)
    pk_lo = max(0, -ok)
    sj_lo = max(0, oj)
    sk_lo = max(0, ok)
    nj = min(tj - pj_lo, aj - sj_lo)
    nk = min(tk - pk_lo, ak - sk_lo)
    block = a[:, sj_lo : sj_lo + nj, sk_lo : sk_lo + nk]
    pads = ((0, 0), (pj_lo, tj - pj_lo - nj), (pk_lo, tk - pk_lo - nk))
    if any(p != (0, 0) for p in pads):
        block = jnp.pad(block, pads)
    return block


def _viscosity_matvec_kernel(*refs):
    (xu_p, xu_c, xu_n, xv_p, xv_c, xv_n, xw_p, xw_c, xw_n) = refs[:9]
    fu = dict(zip(_FKEYS, refs[9:15]))
    fv = dict(zip(_FKEYS, refs[15:21]))
    fw = dict(zip(_FKEYS, refs[21:27]))
    du, dv, dw = refs[27:30]
    yu, yv, yw = refs[30:33]

    xu = jnp.concatenate([xu_p[-1:], xu_c[:], xu_n[:1]], axis=0)
    xv = jnp.concatenate([xv_p[-1:], xv_c[:], xv_n[:1]], axis=0)
    xw = jnp.concatenate([xw_p[-1:], xw_c[:], xw_n[:1]], axis=0)

    ujk = (yu.shape[1], yu.shape[2])
    vjk = (yv.shape[1], yv.shape[2])
    wjk = (yw.shape[1], yw.shape[2])

    def s(ext, oi, oj, ok, jk):
        return _vmem_shift(ext, (oi, oj, ok), jk)

    yu[:] = (
        du[:] * xu_c[:]
        - fu["r"][:] * s(xu, 1, 0, 0, ujk) - fu["l"][:] * s(xu, -1, 0, 0, ujk)
        - fu["t"][:] * s(xu, 0, 1, 0, ujk) - fu["b"][:] * s(xu, 0, -1, 0, ujk)
        - fu["f"][:] * s(xu, 0, 0, 1, ujk) - fu["k"][:] * s(xu, 0, 0, -1, ujk)
        - fu["t"][:] * s(xv, 0, 1, 0, ujk) + fu["t"][:] * s(xv, -1, 1, 0, ujk)
        + fu["b"][:] * s(xv, 0, 0, 0, ujk) - fu["b"][:] * s(xv, -1, 0, 0, ujk)
        - fu["f"][:] * s(xw, 0, 0, 1, ujk) + fu["f"][:] * s(xw, -1, 0, 1, ujk)
        + fu["k"][:] * s(xw, 0, 0, 0, ujk) - fu["k"][:] * s(xw, -1, 0, 0, ujk)
    )
    yv[:] = (
        dv[:] * xv_c[:]
        - fv["r"][:] * s(xv, 1, 0, 0, vjk) - fv["l"][:] * s(xv, -1, 0, 0, vjk)
        - fv["t"][:] * s(xv, 0, 1, 0, vjk) - fv["b"][:] * s(xv, 0, -1, 0, vjk)
        - fv["f"][:] * s(xv, 0, 0, 1, vjk) - fv["k"][:] * s(xv, 0, 0, -1, vjk)
        - fv["r"][:] * s(xu, 1, 0, 0, vjk) + fv["r"][:] * s(xu, 1, -1, 0, vjk)
        + fv["l"][:] * s(xu, 0, 0, 0, vjk) - fv["l"][:] * s(xu, 0, -1, 0, vjk)
        - fv["f"][:] * s(xw, 0, 0, 1, vjk) + fv["f"][:] * s(xw, 0, -1, 1, vjk)
        + fv["k"][:] * s(xw, 0, 0, 0, vjk) - fv["k"][:] * s(xw, 0, -1, 0, vjk)
    )
    yw[:] = (
        dw[:] * xw_c[:]
        - fw["r"][:] * s(xw, 1, 0, 0, wjk) - fw["l"][:] * s(xw, -1, 0, 0, wjk)
        - fw["t"][:] * s(xw, 0, 1, 0, wjk) - fw["b"][:] * s(xw, 0, -1, 0, wjk)
        - fw["f"][:] * s(xw, 0, 0, 1, wjk) - fw["k"][:] * s(xw, 0, 0, -1, wjk)
        - fw["r"][:] * s(xu, 1, 0, 0, wjk) + fw["r"][:] * s(xu, 1, 0, -1, wjk)
        + fw["l"][:] * s(xu, 0, 0, 0, wjk) - fw["l"][:] * s(xu, 0, 0, -1, wjk)
        - fw["t"][:] * s(xv, 0, 1, 0, wjk) + fw["t"][:] * s(xv, 0, 1, -1, wjk)
        + fw["b"][:] * s(xv, 0, 0, 0, wjk) - fw["b"][:] * s(xv, 0, 0, -1, wjk)
    )


def _pad_rows(a, pi):
    """Pad the leading axis with BI zero rows in front, to total length pi."""
    return jnp.pad(a, ((BI, pi - a.shape[0] - BI), (0, 0), (0, 0)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def viscosity_matvec_pallas(x, factors, diag, interpret=False):
    """Fused apply of the coupled viscosity operator (no row mask).

    x: (xu, xv, xw) natural-layout face grids. factors: (fU, fV, fW) dicts of
    the 6 directional factor grids each (premasked to rows). diag: per-
    component diagonal (premasked). Returns (yu, yv, yw) of natural shapes.
    The caller applies the in-matrix row mask (or folds it into the inputs).
    """
    xu, xv, xw = x
    shapes = [xu.shape, xv.shape, xw.shape]
    max_rows = max(s[0] for s in shapes)
    pi = ((max_rows + 2 * BI - 1) // BI + 1) * BI  # front pad + room behind

    def prep(a):
        return _pad_rows(a, pi)

    xs = [prep(a) for a in (xu, xv, xw)]
    fU, fV, fW = factors
    coeffs = (
        [prep(fU[k]) for k in _FKEYS]
        + [prep(fV[k]) for k in _FKEYS]
        + [prep(fW[k]) for k in _FKEYS]
        + [prep(d) for d in diag]
    )

    nblocks = pi // BI
    grid = (nblocks,)

    def spec(a, delta):
        jk = tuple(a.shape[1:])
        return pl.BlockSpec(
            (BI,) + jk,
            lambda b, d=delta: (
                jnp.maximum(0, jnp.minimum(b + d, nblocks - 1)), 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    in_specs = []
    for a in xs:
        for d in (-1, 0, 1):
            in_specs.append(spec(a, d))
    for a in coeffs:
        in_specs.append(spec(a, 0))

    out_shapes = [
        jax.ShapeDtypeStruct((pi,) + tuple(s[1:]), jnp.float32) for s in shapes
    ]
    out_specs = [spec(jnp.zeros(o.shape, jnp.float32), 0) for o in out_shapes]

    inputs = []
    for a in xs:
        inputs += [a, a, a]
    inputs += coeffs

    yu, yv, yw = pl.pallas_call(
        _viscosity_matvec_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)

    return (
        yu[BI : BI + shapes[0][0]],
        yv[BI : BI + shapes[1][0]],
        yw[BI : BI + shapes[2][0]],
    )
