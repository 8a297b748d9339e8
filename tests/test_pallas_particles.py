"""The tile-block Pallas particle engine must reproduce the table engine.

Runs in interpret mode on the CPU test backend (conftest forces cpu), so
these tests exercise the kernels' logic, not Mosaic lowering; the TPU-side
numerics are additionally covered by scripts/pallas_particle_proto.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flipviscosity3d_tpu.config import SimConfig
from flipviscosity3d_tpu.core import step as step_mod
from flipviscosity3d_tpu.core.sim import FluidSimulation
from flipviscosity3d_tpu.io.trianglemesh import box_mesh
from flipviscosity3d_tpu.ops import pallas_particles as pp


def make_sim(engine, res=16, seed_box=(0.2, 0.2, 0.2, 0.8, 0.55, 0.8),
             **overrides):
    sim = FluidSimulation()
    sim.initialize(res, res, res, 1.0 / res, particle_engine=engine,
                   bucket_capacity=16, **overrides)
    x0, y0, z0, x1, y1, z1 = seed_box
    sim.add_liquid(box_mesh((x0, y0, z0), (x1, y1, z1)))
    sim.set_viscosity(2.0)
    sim.set_gravity(0.0, -9.81, 0.0)
    return sim


def test_onehot_dot_split3_matches_f32():
    """The HARDWARE path of onehot_dot (3-pass bf16 split) is plain JAX and
    must run on CPU too: it has to match the exact f32 dot to ~2^-22
    relative on random values, and bit-exactly on 0/1 one-hot operands."""
    rng = np.random.default_rng(3)
    oh = jnp.asarray(
        (rng.integers(0, 8, size=(64, 96)) == 0).astype(np.float32))
    vals = jnp.asarray(
        rng.normal(size=(64, 48)).astype(np.float32) * 100.0)
    dims = (((0,), (0,)), ((), ()))
    exact = jax.lax.dot_general(
        oh, vals, dims, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    got = pp.onehot_dot_split3(oh, vals, dims)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), rtol=3e-7, atol=1e-4)
    # 0/1 values are bf16-exact in every split term -> bit-exact result
    vals01 = jnp.asarray(
        (rng.integers(0, 2, size=(64, 48))).astype(np.float32))
    exact01 = jax.lax.dot_general(
        oh, vals01, dims, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    got01 = pp.onehot_dot_split3(oh, vals01, dims)
    np.testing.assert_array_equal(np.asarray(got01), np.asarray(exact01))
    # and the onehot_left=False orientation (post-swap dims order)
    dims_r = (((1,), (0,)), ((), ()))
    exact_r = jax.lax.dot_general(
        vals.T, oh, dims_r, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    got_r = pp.onehot_dot_split3(oh, vals.T, dims_r, onehot_left=False)
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(exact_r), rtol=3e-7, atol=1e-4)


def test_tile_key_roundtrip():
    shape = (16, 24, 32)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, np.array(shape), size=(1000, 3)), jnp.int32)
    key = pp.tile_major_key(idx, shape)
    i, j, k = pp.decode_key(key, shape)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(idx[:, 0]))
    np.testing.assert_array_equal(np.asarray(j), np.asarray(idx[:, 1]))
    np.testing.assert_array_equal(np.asarray(k), np.asarray(idx[:, 2]))
    # distinct cells -> distinct keys, range [0, n_cells)
    assert int(jnp.max(key)) < shape[0] * shape[1] * shape[2]
    assert int(jnp.min(key)) >= 0


def test_tile_major_layout_roundtrip():
    shape = (16, 8, 24)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((*shape, 3)), jnp.float32)
    y = pp.to_tile_major(x)
    # the Pallas detile kernel must agree with the XLA transpose
    np.testing.assert_array_equal(
        np.asarray(pp.detile(y, shape)), np.asarray(pp.from_tile_major(y, shape)))
    back = pp.from_tile_major(y, shape)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # tile-major block b, lane l holds cell decode(b*W + l)
    keys = pp.tile_major_key(
        jnp.stack(jnp.meshgrid(
            jnp.arange(shape[0]), jnp.arange(shape[1]),
            jnp.arange(shape[2]), indexing="ij"), axis=-1), shape)
    flat = y.reshape(-1, 3)
    np.testing.assert_array_equal(
        np.asarray(flat[np.asarray(keys).reshape(-1)]),
        np.asarray(x.reshape(-1, 3)))
    # the leading-stack builder produces the identical layout (it exists to
    # avoid the 128x trailing-1 tile padding of jnp.stack(..., -1) at scale)
    y2 = pp.stack_tile_major([x[..., f] for f in range(3)], shape)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y))


def test_scatter_matches_table_engine():
    """P2G sums + SDF from the pallas pass A == table engine's pass A."""
    sim_t = make_sim("table")
    cfg_t = sim_t.cfg
    state = sim_t.state

    from flipviscosity3d_tpu.ops.buckets import build_buckets
    from flipviscosity3d_tpu.ops import particle_grid as pg

    table = build_buckets(
        state.pos,
        (state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
         state.vel[:, 0], state.vel[:, 1], state.vel[:, 2]),
        cfg_t.dx, cfg_t.grid_shape, cfg_t.bucket_capacity,
    )
    phi_t, sums_t = pg.p2g_and_sdf(
        table, cfg_t.grid_shape, cfg_t.dx, cfg_t.particle_radius,
        state.solid.center_phi,
        (cfg_t.u_shape, cfg_t.v_shape, cfg_t.w_shape),
    )

    stream = pp.tiled_sort(state.pos, state.vel, cfg_t.dx, cfg_t.grid_shape)
    sums, tbl = pp.scatter_p2g_table(
        stream.plan.tabs, stream.plan.lockeys, stream.payload,
        cfg_t.grid_shape, cfg_t.dx, cfg_t.bucket_capacity)
    fields = pp.table_fields(tbl, cfg_t.grid_shape, cfg_t.bucket_capacity)
    phi_p = pp.liquid_sdf_from_fields(
        fields, cfg_t.grid_shape, cfg_t.dx, cfg_t.particle_radius,
        state.solid.center_phi)
    p2g_p = pp.p2g_combine(
        sums, cfg_t.grid_shape, (cfg_t.u_shape, cfg_t.v_shape, cfg_t.w_shape))

    np.testing.assert_allclose(
        np.asarray(phi_p), np.asarray(phi_t), rtol=1e-5, atol=1e-6)
    for (vp, wp), (vt, wt) in zip(p2g_p, sums_t):
        np.testing.assert_allclose(
            np.asarray(wp), np.asarray(wt), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(vp), np.asarray(vt), rtol=1e-4, atol=1e-5)


def test_gather_rows_matches_take():
    shape = (16, 16, 16)
    rng = np.random.default_rng(2)
    n = 3000
    pos = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    vel = jnp.zeros((n, 3), jnp.float32)
    stream = pp.tiled_sort(pos, vel, 1.0 / 16, shape)
    cols_std = jnp.asarray(
        rng.standard_normal((*shape, 54)).astype(np.float32))
    cols = pp.stack_tile_major_fw(
        [cols_std[..., f] for f in range(54)], shape)
    rows = pp.gather_rows(
        stream.plan.tabs, stream.plan.lockeys, cols, n)[:, :54]
    want = np.asarray(cols_std).reshape(-1, 54)[
        np.asarray(stream.key)]  # standard flat == decode order
    # cols_std flat index is i-major; stream.key is tile-major -> map
    i, j, k = pp.decode_key(stream.key, shape)
    std_key = (np.asarray(i) * shape[1] + np.asarray(j)) * shape[2] \
        + np.asarray(k)
    want = np.asarray(cols_std).reshape(-1, 54)[std_key]
    np.testing.assert_allclose(np.asarray(rows), want, rtol=1e-6, atol=1e-6)


def test_plan_visits_invariants():
    """Every tile is first-visited exactly once (so every scatter block is
    zero-initialized), tile indices never revisit a flushed block, and each
    chunk's visits are consecutive."""
    shape = (16, 16, 16)
    rng = np.random.default_rng(7)
    n = 5000
    # clustered positions -> plenty of empty tiles
    pos = jnp.asarray(
        (rng.random((n, 3), np.float32) * 0.3 + 0.1).astype(np.float32))
    key_s = jnp.sort(pp.key_of_position(pos, 1.0 / 16, shape))
    plan = pp.plan_visits(key_s, n, shape)
    nv = plan.lockeys.shape[1] // pp.C
    packed, cv = np.asarray(plan.tabs).reshape(2, nv)
    tv = packed & pp.TV_MASK
    first_t = (packed & pp.FLAG_TILE) != 0
    first_c = (packed & pp.FLAG_CHUNK) != 0

    n_tiles = (16 * 16 * 16) // pp.W
    # each tile index zeroed exactly once
    zeroed = tv[first_t]
    assert sorted(zeroed.tolist()) == list(range(n_tiles))
    # a tile never reappears after a different tile followed it, except the
    # trailing pad region which must repeat the final written tile
    seen, last = set(), None
    for t in tv:
        if t != last and t in seen:
            raise AssertionError(f"tile {t} revisited after flush")
        seen.add(t)
        last = t
    # chunk visits consecutive and nondecreasing
    assert (np.diff(cv) >= 0).all()
    # localized keys of valid visits match the sorted keys
    lk = np.asarray(plan.lockeys).reshape(nv, pp.C)
    ks = np.asarray(key_s)
    got = {}
    for v in range(nv):
        for p in range(pp.C):
            if lk[v, p] >= 0:
                gidx = cv[v] * pp.C + p
                got[gidx] = tv[v] * pp.W + lk[v, p]
    assert len(got) == n
    np.testing.assert_array_equal(
        np.array([got[i] for i in range(n)]), ks)


def test_gather_mac_matches_unfused():
    """Fused gather_mac == gather_rows + combine_mac_samples (its oracle)."""
    shape = (16, 16, 16)
    dx = 1.0 / 16
    rng = np.random.default_rng(3)
    n = 3000
    pos = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    vel = jnp.zeros((n, 3), jnp.float32)
    stream = pp.tiled_sort(pos, vel, dx, shape)
    spx, spy, spz = stream.sorted[0], stream.sorted[1], stream.sorted[2]

    grids = [jnp.asarray(rng.standard_normal(shape).astype(np.float32))
             for _ in range(6)]
    cols = pp.build_mac_columns(grids[0:2], grids[2:4], grids[4:6], shape)

    rows = pp.gather_rows(stream.plan.tabs, stream.plan.lockeys, cols, n)
    want = pp.combine_mac_samples(
        rows, spx, spy, spz, stream.key, dx, shape, 2)

    pay = jnp.concatenate(
        [stream.payload[0:3], stream.payload[7:10]], axis=0)
    gm = pp.gather_mac(
        stream.plan.tabs, stream.plan.lockeys, pay, cols, n, dx, 2)
    for comp in range(3):
        for g in range(2):
            # grid-major output rows: g*3 + comp
            np.testing.assert_allclose(
                np.asarray(gm[g * 3 + comp]),
                np.asarray(want[comp][g]), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gm[6:]), 0.0)


def test_gather_mac_bf16_cols_close_to_f32():
    """bf16 column image (pallas_gather_dtype="bf16"): gather_mac output
    matches the f32 image's to bf16 sampling tolerance. The trilinear
    combine stays f32 — only the stored samples round."""
    shape = (16, 16, 16)
    dx = 1.0 / 16
    rng = np.random.default_rng(7)
    n = 2000
    pos = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    vel = jnp.zeros((n, 3), jnp.float32)
    stream = pp.tiled_sort(pos, vel, dx, shape)
    grids = [jnp.asarray(rng.standard_normal(shape).astype(np.float32))
             for _ in range(6)]
    pay = jnp.concatenate(
        [stream.payload[0:3], stream.payload[7:10]], axis=0)

    cols32 = pp.build_mac_columns(grids[0:2], grids[2:4], grids[4:6], shape)
    cols16 = pp.build_mac_columns(
        grids[0:2], grids[2:4], grids[4:6], shape, dtype=jnp.bfloat16)
    assert cols16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(cols16, np.float32), np.asarray(cols32),
        rtol=2 ** -8, atol=1e-6)

    gm32 = pp.gather_mac(
        stream.plan.tabs, stream.plan.lockeys, pay, cols32, n, dx, 2)
    gm16 = pp.gather_mac(
        stream.plan.tabs, stream.plan.lockeys, pay, cols16, n, dx, 2)
    # each sample is a convex-ish combo of 8 bf16-rounded nodes: the
    # error bound is the node magnitude x 2^-8 (weights are exact f32)
    np.testing.assert_allclose(
        np.asarray(gm16[:6]), np.asarray(gm32[:6]), rtol=0, atol=2e-2)


def test_midpoint_plan_matches_sorted_gather():
    """gather_mac through plan_midpoint_visits == the sort-then-gather path
    (its oracle), for covered particles; coverage is exhaustive at a
    generous budget."""
    shape = (16, 16, 16)
    dx = 1.0 / 16
    rng = np.random.default_rng(11)
    n = 4000
    pos = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    vel = jnp.zeros((n, 3), jnp.float32)
    stream = pp.tiled_sort(pos, vel, dx, shape)
    spx, spy, spz = stream.sorted[0], stream.sorted[1], stream.sorted[2]

    # midpoints: jitter positions by up to 2.5 cells (the CFL-5 bound)
    jit_ = rng.uniform(-2.5 * dx, 2.5 * dx, (n, 3)).astype(np.float32)
    mx = spx + jnp.asarray(jit_[:, 0])
    my = spy + jnp.asarray(jit_[:, 1])
    mz = spz + jnp.asarray(jit_[:, 2])
    key_m = pp.key_of_position(jnp.stack([mx, my, mz], axis=1), dx, shape)

    grids = [jnp.asarray(rng.standard_normal(shape).astype(np.float32))
             for _ in range(3)]
    cols = pp.build_mac_columns(grids[0:1], grids[1:2], grids[2:3], shape)

    # oracle: re-sort by the midpoint key, gather, un-sort
    order = jnp.argsort(key_m, stable=True)
    key_b, sorted_b, plan_b = pp.sort_by_key(
        key_m, (mx, my, mz), shape)
    pay_b = pp.gather_payload(sorted_b[0], sorted_b[1], sorted_b[2],
                              key_b, shape)
    gm_sorted = pp.gather_mac(
        plan_b.tabs, plan_b.lockeys, pay_b, cols, n, dx, 1)
    want = np.zeros((3, n), np.float32)
    want[:, np.asarray(order)] = np.asarray(gm_sorted[:3])

    # midpoint plan over the pass-A ordering
    plan_m = pp.plan_midpoint_visits(key_m, n, shape, budget=27,
                                     factor=27.0)
    pay_m = pp.gather_payload(mx, my, mz, key_m, shape)
    gm_plan = pp.gather_mac(
        plan_m.tabs, plan_m.lockeys, pay_m, cols, n, dx, 1)

    cov = np.asarray(plan_m.covered)
    assert cov.all()  # generous budget -> exhaustive coverage
    np.testing.assert_allclose(
        np.asarray(gm_plan[:3]), want, rtol=1e-5, atol=1e-6)


def test_midpoint_plan_budget_fallback():
    """A tight budget marks excess-tile particles uncovered, never covered-
    but-wrong: covered particles still gather exactly."""
    shape = (16, 16, 16)
    dx = 1.0 / 16
    rng = np.random.default_rng(13)
    n = 2000
    pos = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    # scatter midpoints wildly so chunks touch many tiles
    m = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    key_m = pp.key_of_position(m, dx, shape)

    cols = pp.build_mac_columns(
        [jnp.asarray(rng.standard_normal(shape).astype(np.float32))],
        [jnp.zeros(shape, jnp.float32)], [jnp.zeros(shape, jnp.float32)],
        shape)
    plan_m = pp.plan_midpoint_visits(key_m, n, shape, budget=2, factor=1.5)
    cov = np.asarray(plan_m.covered)
    assert 0 < cov.sum() < n  # wild midpoints must overflow budget=2

    pay_m = pp.gather_payload(m[:, 0], m[:, 1], m[:, 2], key_m, shape)
    gm_plan = pp.gather_mac(
        plan_m.tabs, plan_m.lockeys, pay_m, cols, n, dx, 1)

    # oracle via the exhaustive plan
    plan_full = pp.plan_midpoint_visits(key_m, n, shape, budget=27,
                                        factor=27.0)
    gm_full = pp.gather_mac(
        plan_full.tabs, plan_full.lockeys, pay_m, cols, n, dx, 1)
    np.testing.assert_allclose(
        np.asarray(gm_plan[0])[cov], np.asarray(gm_full[0])[cov],
        rtol=1e-5, atol=1e-6)


def test_gather_rows8_matches_row_gather():
    """Packed 8-wide gather == the XLA row gather it replaces, for any
    visit plan (here: a midpoint-style plan over unsorted keys)."""
    from flipviscosity3d_tpu.ops import stream_transfers as st
    from flipviscosity3d_tpu.ops.stream import rows_at_cells

    shape = (16, 16, 16)
    dx = 1.0 / 16
    rng = np.random.default_rng(17)
    n = 3000
    pos = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    key = pp.key_of_position(pos, dx, shape)
    plan = pp.plan_midpoint_visits(key, n, shape, budget=27, factor=27.0)
    assert bool(plan.covered.all())

    phi_node = jnp.asarray(
        rng.standard_normal((17, 17, 17)).astype(np.float32))
    cols = st.node_corner_columns(phi_node, shape)
    cols_tm = pp.to_tile_major(jnp.stack(
        [c.reshape(shape) for c in cols], axis=-1))
    rows8 = pp.gather_rows8(
        plan.tabs, plan.lockeys, pp.pack_cols8(cols_tm), n)

    # oracle keyed by the i-major cell id
    i, j, k = pp.decode_key(key, shape)
    std_key = (i * shape[1] + j) * shape[2] + k
    want = rows_at_cells(cols, std_key)
    for f in range(8):
        np.testing.assert_allclose(
            np.asarray(rows8[f]), np.asarray(want[f]),
            rtol=1e-6, atol=1e-6)


def test_full_advance_kernel_pushback_matches_gather():
    """particle_engine=pallas with pallas_pushback=kernel reproduces the
    default gather pushback end-to-end."""
    sim_g = make_sim("pallas")
    sim_k = make_sim("pallas", pallas_pushback="kernel")
    for _ in range(2):
        diag_g = sim_g.advance(0.01)
        diag_k = sim_k.advance(0.01)
        assert int(diag_g.substeps) == int(diag_k.substeps)
        assert int(diag_k.bucket_overflow) == int(diag_g.bucket_overflow)
    np.testing.assert_allclose(
        np.asarray(sim_g.state.pos), np.asarray(sim_k.state.pos),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("frames", [3])
def test_full_advance_matches_table_engine(frames):
    sim_t = make_sim("table")
    sim_p = make_sim("pallas")
    np.testing.assert_array_equal(
        np.asarray(sim_t.state.pos), np.asarray(sim_p.state.pos))

    for _ in range(frames):
        dt_ = 0.01
        diag_t = sim_t.advance(dt_)
        diag_p = sim_p.advance(dt_)
        assert int(diag_t.substeps) == int(diag_p.substeps)

    # same particles in a possibly different order: compare sorted sets
    pt = np.sort(
        np.asarray(sim_t.state.pos).round(5).view(np.float32), axis=0)
    ppos = np.sort(
        np.asarray(sim_p.state.pos).round(5).view(np.float32), axis=0)
    np.testing.assert_allclose(pt, ppos, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(sim_t.state.u), np.asarray(sim_p.state.u),
        rtol=2e-3, atol=2e-4)
    com_t = np.asarray(sim_t.state.pos).mean(0)
    com_p = np.asarray(sim_p.state.pos).mean(0)
    np.testing.assert_allclose(com_t, com_p, rtol=1e-4, atol=1e-5)


def _multiset_rows(a):
    a = np.asarray(a)
    return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]


def test_stale_scatter_matches_sorted_scatter():
    """plan_pass_a + in-kernel ranks over an UNSORTED stream must reproduce
    the sorted scatter: identical P2G sums (mod f32 order), identical SDF
    table per cell as a slot multiset, and an exact count lane."""
    shape = (16, 16, 16)
    dx = 1.0 / 16
    cap = 4
    rng = np.random.default_rng(11)
    n = 2500
    pos = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    vel = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    stream = pp.tiled_sort(pos, vel, dx, shape)
    sums_s, tbl_s = pp.scatter_p2g_table(
        stream.plan.tabs, stream.plan.lockeys, stream.payload,
        shape, dx, cap)

    key = pp.key_of_position(pos, dx, shape)
    gplan, splan = pp.plan_pass_a(key, n, shape, budget=8, factor=3.0)
    # 16^3 has 8 tiles total and budget=8 -> full coverage by construction
    assert bool(jnp.all(gplan.covered))
    payload = pp.stale_payload(pos, vel, key, shape)
    sums_t, tbl_t = pp.scatter_p2g_table(
        splan.tabs, splan.lockeys, payload, shape, dx, cap,
        inkernel_rank=True)

    np.testing.assert_allclose(
        np.asarray(sums_t), np.asarray(sums_s), rtol=1e-4, atol=1e-5)

    # table: per-cell slot multisets must match exactly (rank ORDER may
    # differ between the streams; the SDF min doesn't care)
    f_s = np.stack([np.asarray(f) for f in pp.table_fields(
        tbl_s, shape, cap)], axis=-1)          # (cap, n_cells, 3)
    f_t = np.stack([np.asarray(f) for f in pp.table_fields(
        tbl_t, shape, cap)], axis=-1)
    np.testing.assert_allclose(
        np.sort(f_s, axis=0), np.sort(f_t, axis=0), atol=1e-6)

    # count lanes: exact per-cell histogram, overflow = sum max(cnt-cap, 0)
    ijk = np.asarray(jnp.stack(pp.decode_key(key, shape), axis=1))
    std = (ijk[:, 0] * shape[1] + ijk[:, 1]) * shape[2] + ijk[:, 2]
    hist = np.bincount(std, minlength=shape[0] * shape[1] * shape[2])
    want_of = int(np.maximum(hist - cap, 0).sum())
    got_of = int(pp.table_rank_overflow(tbl_t, shape, cap))
    assert got_of == want_of


def test_step_pallas_stale_matches_sort():
    """A full substep with pallas_pass_a='stale' (substep_idx=1: NO sort,
    plans over the raw seeding order) must reproduce the sort engine's
    substep as a particle multiset."""
    sim_a = make_sim("pallas", pallas_pass_a="stale",
                     pallas_passa_budget=8)
    sim_b = make_sim("pallas")
    state = sim_a.state
    dt = jnp.float32(0.005)

    new_a, diag_a = step_mod.step(
        state, dt, sim_a.cfg, substep_idx=jnp.int32(1))
    new_b, diag_b = step_mod.step(
        state, dt, sim_b.cfg, substep_idx=jnp.int32(1))

    assert int(diag_a["bucket_overflow"]) == 0
    np.testing.assert_allclose(
        _multiset_rows(new_a.pos), _multiset_rows(new_b.pos),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_a.u), np.asarray(new_b.u), rtol=1e-4, atol=1e-5)
    assert int(diag_a["pressure_iterations"]) == int(
        diag_b["pressure_iterations"])


def test_step_pallas_split_gather_matches_fused():
    """pallas_split_gather=True (two 54-lane pass-A images, the >=256^3
    memory shape) must reproduce the fused 108-lane gather exactly."""
    sim_a = make_sim("pallas", pallas_split_gather=True)
    sim_b = make_sim("pallas", pallas_split_gather=False)
    state = sim_a.state
    dt = jnp.float32(0.005)
    new_a, diag_a = step_mod.step(state, dt, sim_a.cfg)
    new_b, diag_b = step_mod.step(state, dt, sim_b.cfg)
    np.testing.assert_allclose(
        np.asarray(new_a.pos), np.asarray(new_b.pos), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(new_a.vel), np.asarray(new_b.vel), rtol=1e-6, atol=1e-6)


def test_p2g_combine_slabbed_matches_fused():
    """The i-slab-chunked combine (the 256^3 memory shape) must equal the
    fused path bit-exactly (disjoint row pastes, 1-row halo), for both the
    4D (I,J,K,108) view and the scatter kernel's K-folded 3D form."""
    shape = (16, 16, 16)
    fs = ((17, 16, 16), (16, 17, 16), (16, 16, 17))
    rng = np.random.default_rng(5)
    sums = jnp.asarray(rng.standard_normal((*shape, 108)).astype(np.float32))
    a = pp.p2g_combine(sums, shape, fs, i_slabs=1)
    b = pp.p2g_combine(sums, shape, fs, i_slabs=4)
    folded = sums.reshape(shape[0], shape[1], -1)
    c = pp.p2g_combine(folded, shape, fs, i_slabs=4)
    for (va, wa), (vb, wb), (vc, wc) in zip(a, b, c):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vc))
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wc))


def test_scatter_fold_sums_matches_unfolded():
    """fold_sums=True (the >= 2^24-cell memory shape: K-folded
    (I, J, K*SUML) sums, Mosaic-padded capl) must reproduce the standard
    4D sums and the identical SDF table — for both the sorted stream and
    the stale in-kernel-rank path."""
    shape = (16, 16, 16)
    dx = 1.0 / 16
    cap = 4
    rng = np.random.default_rng(13)
    n = 2500
    pos = jnp.asarray(rng.random((n, 3), np.float32) * 0.9 + 0.05)
    vel = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    stream = pp.tiled_sort(pos, vel, dx, shape)
    sums4, tbl4 = pp.scatter_p2g_table(
        stream.plan.tabs, stream.plan.lockeys, stream.payload,
        shape, dx, cap, fold_sums=False)
    sumsf, tblf = pp.scatter_p2g_table(
        stream.plan.tabs, stream.plan.lockeys, stream.payload,
        shape, dx, cap, fold_sums=True)
    assert sumsf.shape == (shape[0], shape[1], shape[2] * pp.SUML)
    got = sumsf.reshape(*shape, pp.SUML)
    np.testing.assert_allclose(
        np.asarray(got[..., :108]), np.asarray(sums4), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got[..., 108:]), 0.0)
    np.testing.assert_array_equal(np.asarray(tblf), np.asarray(tbl4))

    # stale path: padded capl + in-kernel rank computed from the padded
    # count lane, under fold_sums
    key = pp.key_of_position(pos, dx, shape)
    gplan, splan = pp.plan_pass_a(key, n, shape, budget=8, factor=3.0)
    assert bool(jnp.all(gplan.covered))
    payload = pp.stale_payload(pos, vel, key, shape)
    sums_t, tbl_t = pp.scatter_p2g_table(
        splan.tabs, splan.lockeys, payload, shape, dx, cap,
        inkernel_rank=True, fold_sums=True)
    got_t = sums_t.reshape(*shape, pp.SUML)[..., :108]
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(sums4), rtol=1e-4, atol=1e-5)
    f_s = np.stack([np.asarray(f) for f in pp.table_fields(
        tbl4, shape, cap)], axis=-1)
    f_t = np.stack([np.asarray(f) for f in pp.table_fields(
        tbl_t, shape, cap)], axis=-1)
    np.testing.assert_allclose(
        np.sort(f_s, axis=0), np.sort(f_t, axis=0), atol=1e-6)
    # the padded capl keeps the count lane at cap*4: overflow still exact
    ijk = np.asarray(jnp.stack(pp.decode_key(key, shape), axis=1))
    std = (ijk[:, 0] * shape[1] + ijk[:, 1]) * shape[2] + ijk[:, 2]
    hist = np.bincount(std, minlength=shape[0] * shape[1] * shape[2])
    assert int(pp.table_rank_overflow(tbl_t, shape, cap)) == int(
        np.maximum(hist - cap, 0).sum())
