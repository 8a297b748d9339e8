"""Pallas TPU kernels for the multigrid V-cycle.

Why: the XLA expression of one V-cycle (solvers/multigrid.py) lowers to
~100 small kernels (each _shift is a pad+slice, each smooth/residual/
transfer its own fusion); measured on this chip the cycle costs ~3-6 ms at
128^3 while its arithmetic+bandwidth is worth ~0.3 ms — per-kernel launch
overhead dominates. These kernels fuse a whole level's work into TWO
launches:

- DOWN: pre-smooth from zero (x = omega*D^-1 b, no wasted A*0 apply),
  residual r = b - A x, and the 2x2x2 restriction of r — one kernel.
- UP: coarse-correction prolongation x += scale*P(xc) and post-smooth —
  one kernel.

A V(1,1) cycle over L levels is then ~2L+1 launches (+ the dense coarse
einsum), i.e. ~10 instead of ~100.

Layout: every level array is stored i-padded (BI zero rows in front, back
rows to a multiple of BI) and j/k-padded to even — zero diag/links make
padded rows inert. Blocks are (1, BI, J, K) with prev/center/next row
blocks passed separately (the standard halo trick); j/k shifts and
2x-pooling/prolongation happen on
VMEM values (pooling/prolongation along j/k ride the MXU as one-hot
matmuls; along i they are leading-axis reshapes, which Mosaic supports).

Operator semantics match solvers/multigrid.py exactly:
  A x = diag*x - sum_ax( L_ax * x(+ax) + (L_ax * x)(-ax) )
with zero fill out of range (the Galerkin-aggregation links).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BI = 4  # fine-axis rows per block (even, for 2x pooling)

# The kernels' in-kernel value temps (six (BI+2, J, K) f32 extensions +
# shift/apply intermediates) exceed the DEFAULT 16 MB scoped-vmem stack at
# a 258x258 plane (18.6 MB needed — hardware, 256^3, round 5). Raise the
# per-kernel limit; total VMEM (DMA blocks + stack) stays well inside the
# chip's 128 MB at the 260^2 plane cap (solvers/multigrid._PALLAS_MAX_PLANE).
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _interpret() -> bool:
    """Compiled on TPU; interpreter elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


def _jkshift(a, oj, ok):
    """a shifted by (oj, ok) on its last two axes, zero fill (matches
    multigrid._shift on j/k)."""
    nj, nk = a.shape[-2], a.shape[-1]
    pj_lo, pk_lo = max(0, -oj), max(0, -ok)
    sj_lo, sk_lo = max(0, oj), max(0, ok)
    nj_keep = nj - abs(oj)
    nk_keep = nk - abs(ok)
    block = a[..., sj_lo : sj_lo + nj_keep, sk_lo : sk_lo + nk_keep]
    pads = [(0, 0)] * (a.ndim - 2) + [
        (pj_lo, nj - pj_lo - nj_keep), (pk_lo, nk - pk_lo - nk_keep)
    ]
    return jnp.pad(block, pads)


def _apply_ext(de, le0, le1, le2, xe):
    """A x on the BI center rows, from (BI+2)-row extended operands."""
    x_c = xe[1:-1]
    y = de[1:-1] * x_c
    # i axis: L[i]*x[i+1] + L[i-1]*x[i-1]
    y = y - le0[1:-1] * xe[2:] - le0[:-2] * xe[:-2]
    # j axis
    lc1 = le1[1:-1]
    y = y - lc1 * _jkshift(x_c, 1, 0) - _jkshift(lc1 * x_c, -1, 0)
    # k axis
    lc2 = le2[1:-1]
    y = y - lc2 * _jkshift(x_c, 0, 1) - _jkshift(lc2 * x_c, 0, -1)
    return y


def _half_onehot(n, dtype):
    """(n, n//2) matrix M[j, m] = 1 where j//2 == m (pool/prolong via MXU)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n // 2), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (n, n // 2), 1)
    return (j // 2 == m).astype(dtype)


def _pool2(r):
    """2x2x2 sum pooling of (BI, J, K) -> (BI//2, J//2, K//2)."""
    bi, nj, nk = r.shape
    r = r.reshape(bi // 2, 2, nj, nk).sum(axis=1)
    pj = _half_onehot(nj, r.dtype)
    r = jax.lax.dot_general(
        r, pj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (bi/2, K, J/2) -- j contracted, k moved up
    pk = _half_onehot(nk, r.dtype)
    r = jax.lax.dot_general(
        r, pk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (bi/2, J/2, K/2)
    return r


def _prolong2(xce, bi_out, nj, nk):
    """(BI//2 + 2, J/2, K/2) coarse ext rows -> (bi_out+2, J, K) fine ext
    values: fine ext row e reads coarse ext row (e+1)//2."""
    # interleaved row doubling (rows t -> xce[t//2]); jnp-style repeat via a
    # leading-axis stack+reshape (pltpu.repeat tiles the whole array)
    n = xce.shape[0]
    rep = jnp.stack([xce, xce], axis=1).reshape((2 * n,) + xce.shape[1:])
    fine_i = rep[1 : bi_out + 3]                # t = e+1
    pj = _half_onehot(nj, xce.dtype).T          # (J/2, J)
    out = jax.lax.dot_general(
        fine_i, pj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (rows, K/2, J)
    pk = _half_onehot(nk, xce.dtype).T
    out = jax.lax.dot_general(
        out, pk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (rows, J, K)
    return out


def _inv(de):
    return jnp.where(de > 0, 1.0 / jnp.where(de == 0, 1.0, de), 0.0)


def _down_kernel(omega, *refs):
    (d_p, d_c, d_n, l0_p, l0_c, l0_n, l1_p, l1_c, l1_n,
     l2_p, l2_c, l2_n, b_p, b_c, b_n, x_out, rc_out) = refs

    def ext(p, c, n):
        # operator refs may be stored bf16 (half the DMA traffic of the
        # bandwidth-bound cycle); all arithmetic stays f32
        return jnp.concatenate(
            [p[0, -1:], c[0], n[0, :1]], axis=0).astype(jnp.float32)

    de = ext(d_p, d_c, d_n)
    be = ext(b_p, b_c, b_n)
    le0 = ext(l0_p, l0_c, l0_n)
    le1 = ext(l1_p, l1_c, l1_n)
    le2 = ext(l2_p, l2_c, l2_n)

    xe = omega * _inv(de) * be          # pre-smooth from zero
    y = _apply_ext(de, le0, le1, le2, xe)
    r = be[1:-1] - y
    x_out[0] = xe[1:-1]
    rc_out[0] = _pool2(r)


def _up_kernel(omega, scale, *refs):
    (d_p, d_c, d_n, l0_p, l0_c, l0_n, l1_p, l1_c, l1_n,
     l2_p, l2_c, l2_n, b_p, b_c, b_n, x_p, x_c, x_n,
     xc_p, xc_c, xc_n, x_out) = refs

    def ext(p, c, n):
        # bf16 operator refs upcast once; see _down_kernel
        return jnp.concatenate(
            [p[0, -1:], c[0], n[0, :1]], axis=0).astype(jnp.float32)

    de = ext(d_p, d_c, d_n)
    be = ext(b_p, b_c, b_n)
    le0 = ext(l0_p, l0_c, l0_n)
    le1 = ext(l1_p, l1_c, l1_n)
    le2 = ext(l2_p, l2_c, l2_n)
    xe = ext(x_p, x_c, x_n)
    xce = jnp.concatenate([xc_p[0, -1:], xc_c[0], xc_n[0, :1]], axis=0)

    bi = x_c.shape[1]
    nj, nk = x_c.shape[2], x_c.shape[3]
    xe2 = xe + scale * _prolong2(xce, bi, nj, nk)
    y = _apply_ext(de, le0, le1, le2, xe2)
    r = be[1:-1] - y
    x_out[0] = xe2[1:-1] + omega * _inv(de[1:-1]) * r


def _specs(nb, nblocks, bi, nj, nk, deltas):
    out = []
    for d in deltas:
        out.append(pl.BlockSpec(
            (1, bi, nj, nk),
            lambda c, b, d=d: (c, jnp.clip(b + d, 0, nblocks - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ))
    return out


def pad_level(diag, links, bi=BI, dtype=jnp.float32):
    """Pad a level's arrays for the kernels: batch axis (add if missing),
    bi front rows + back rows to a multiple of bi on i, j/k to even.
    `dtype=bfloat16` stores the padded OPERATOR in half precision — the
    cycle is bandwidth-bound, and the kernels upcast to f32 before any
    arithmetic, so this only perturbs the preconditioner by the operator's
    rounding (a fixed linear M-tilde; CG stays plain CG).

    Links on the last REAL index of their own axis are zeroed: in the real
    (unpadded) operator they only ever multiply an out-of-range x (= 0), but
    in the padded layout their symmetric term would deposit flux into padded
    cells, which 2x-pooling of odd extents folds back into the last coarse
    row. Zeroing them is exact."""
    def eye_pad(n, n_out, dt):
        j = jax.lax.broadcasted_iota(jnp.int32, (n, n_out), 0)
        m = jax.lax.broadcasted_iota(jnp.int32, (n, n_out), 1)
        return (j == m).astype(dt)

    def prep(a, edge_axis=None):
        if a.ndim == 3:
            a = a[None]
        if edge_axis is not None:
            idx = [slice(None)] * 4
            idx[edge_axis + 1] = a.shape[edge_axis + 1] - 1
            a = a.at[tuple(idx)].set(0.0)
        nbt, ni, nj, nk = a.shape
        back = (-(ni % -bi)) + bi  # to multiple of bi, plus one spare block
        # i pads ride a major-dim jnp.pad; j/k pads (and the bf16 cast)
        # ride two one-hot MXU dots — a jnp.pad on a tiled (8,128) dim is
        # a full retile copy, ~6 ms per (3,129,129,129) operand and four
        # operands per solve on hardware (round 4)
        a = jnp.pad(a, ((0, 0), (bi, back), (0, 0), (0, 0)))
        if nj % 2 == 0 and nk % 2 == 0:
            return a.astype(dtype)
        for n, n_out in ((nj, nj + nj % 2), (nk, nk + nk % 2)):
            a = jax.lax.dot_general(
                a, eye_pad(n, n_out, a.dtype),
                (((a.ndim - 2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype,
            )
        return a
    return prep(diag), tuple(
        prep(l, edge_axis=ax) for ax, l in enumerate(links)
    )


def down(diag_p, links_p, b_p, omega, bi=BI):
    """One DOWN launch on pre-padded level arrays (nb, PI, J, K).
    Returns (x, rc) with x (nb, PI, J, K) and rc (nb, PI//2, J//2, K//2)."""
    nb, pi, nj, nk = diag_p.shape
    nblocks = pi // bi
    grid = (nb, nblocks)
    in_specs = []
    operands = []
    for a in (diag_p, *links_p, b_p):
        in_specs += _specs(nb, nblocks, bi, nj, nk, (-1, 0, 1))
        operands += [a, a, a]
    out_shapes = [
        jax.ShapeDtypeStruct((nb, pi, nj, nk), jnp.float32),
        jax.ShapeDtypeStruct((nb, pi // 2, nj // 2, nk // 2), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, bi, nj, nk), lambda c, b: (c, b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bi // 2, nj // 2, nk // 2),
                     lambda c, b: (c, b, 0, 0), memory_space=pltpu.VMEM),
    ]
    x, rc = pl.pallas_call(
        functools.partial(_down_kernel, float(omega)),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=_PARAMS,
    )(*operands)
    return x, rc


def up(diag_p, links_p, b_p, x, xc, omega, scale, bi=BI):
    """One UP launch: x + scale*P(xc), post-smoothed. xc is (nb, PI//2,
    J//2, K//2) in the same padded layout as down()'s rc output."""
    nb, pi, nj, nk = diag_p.shape
    nblocks = pi // bi
    grid = (nb, nblocks)
    in_specs = []
    operands = []
    for a in (diag_p, *links_p, b_p, x):
        in_specs += _specs(nb, nblocks, bi, nj, nk, (-1, 0, 1))
        operands += [a, a, a]
    in_specs += _specs(nb, nblocks, bi // 2, nj // 2, nk // 2, (-1, 0, 1))
    operands += [xc, xc, xc]
    out_shape = jax.ShapeDtypeStruct((nb, pi, nj, nk), jnp.float32)
    out_spec = pl.BlockSpec((1, bi, nj, nk), lambda c, b: (c, b, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_up_kernel, float(omega), float(scale)),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=_PARAMS,
    )(*operands)
