"""Pallas fused viscosity matvec vs the XLA formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from flipviscosity3d_tpu.config import SimConfig
from flipviscosity3d_tpu.ops.pallas_stencil import viscosity_matvec_pallas
from flipviscosity3d_tpu.solvers import viscosity as vs

N = 10
CFG = SimConfig(isize=N, jsize=N, ksize=N, dx=1.0 / N)


def test_pallas_matvec_matches_xla():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    fU = {k: mk(CFG.u_shape) for k in "rltbfk"}
    fV = {k: mk(CFG.v_shape) for k in "rltbfk"}
    fW = {k: mk(CFG.w_shape) for k in "rltbfk"}
    diag = (mk(CFG.u_shape), mk(CFG.v_shape), mk(CFG.w_shape))
    ones = tuple(
        jnp.ones(s, bool) for s in (CFG.u_shape, CFG.v_shape, CFG.w_shape)
    )
    sysv = vs.ViscositySystem(ones, diag, diag, (fU, fV, fW), diag)
    x = (mk(CFG.u_shape), mk(CFG.v_shape), mk(CFG.w_shape))

    want = jax.jit(lambda x: vs.apply_viscosity_matrix(sysv, x, CFG))(x)
    got = viscosity_matvec_pallas(x, (fU, fV, fW), diag, interpret=True)
    for g, w, name in zip(got, want, "uvw"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4, err_msg=name
        )
