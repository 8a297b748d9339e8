"""Time the ACTUAL Pallas particle-engine stages at bench scale on hardware.

Unlike gather_perf_probe*.py (isolated kernel variants), this drives the
shipped functions in ops/pallas_particles.py on the bench distribution
(128^3 pool, ~4.1M particles) and prints a per-stage table, so the
particle-work total can be compared directly against the table engine's
~350-400 ms and the roofline floors in docs/DESIGN.md.

Usage:  python scripts/pallas_engine_probe.py [N] [RES]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/flip3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from flipviscosity3d_tpu.ops import pallas_particles as pp

RES = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_100_000
CAP = 16
SHAPE = (RES, RES, RES)
DX = 1.0 / RES


def timed(name, fn, *args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()  # force sync
    t1 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].ravel()[0].item()
    t2 = time.perf_counter()
    ms = (t2 - t1) / reps * 1e3
    print(f"{name:28s} first {t1 - t0:7.1f}s  warm {ms:9.2f} ms", flush=True)
    return out, ms


def main():
    # ALL test data is generated ON-DEVICE (jax.random): the axon tunnel
    # uploads at ~0.3 MB/s (measured round 4 — 146 s for one 49 MB array),
    # so numpy+jnp.asarray data setup costs minutes per operand and looks
    # like a hang. Download (~20 MB/s) is fine for small verification pulls.
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    # bench-like pool: bottom quarter of the box, ~2 particles/cell avg
    lo = jnp.array([0.02, 0.02, 0.02], jnp.float32)
    hi = jnp.array([0.98, 0.27, 0.98], jnp.float32)
    pos_j = jax.random.uniform(k[0], (N, 3), jnp.float32) * (hi - lo) + lo
    vel_j = jax.random.normal(k[1], (N, 3), jnp.float32) * 0.1
    pos_j.ravel()[0].item()
    print(f"N={N} res={RES} backend={jax.default_backend()}", flush=True)

    total = 0.0

    sort_fn = jax.jit(
        lambda p, v: pp.tiled_sort(p, v, DX, SHAPE))
    stream, ms = timed("tiled_sort+plan (pass A)", sort_fn, pos_j, vel_j)
    total += ms

    # alternative pass-A sort: 2-operand (key, idx) sort + one (N, 6) row
    # gather of the payload — wins if a row gather beats 5 sort operands
    def sort_idx(p, v):
        import jax.numpy as jnp_
        key = pp.key_of_position(p, DX, SHAPE)
        key_s, idx_s = jax.lax.sort(
            (key, jnp_.arange(key.shape[0], dtype=jnp_.int32)), num_keys=1)
        rows = jnp_.concatenate([p, v], axis=1)[idx_s]
        return key_s, rows
    _, ms_alt = timed("  alt: sort(key,idx)+take", jax.jit(sort_idx),
                      pos_j, vel_j)

    scat_fn = jax.jit(lambda t, lk, pay: pp.scatter_p2g_table(
        t, lk, pay, SHAPE, DX, CAP))
    (sums, tbl), ms = timed("scatter (sums direct 4D)", scat_fn,
                            stream.plan.tabs, stream.plan.lockeys,
                            stream.payload)
    total += ms

    split_fn = jax.jit(lambda o: pp.table_fields(o, SHAPE, CAP))
    fields, ms = timed("table_fields (64-lane relayout)", split_fn, tbl)
    total += ms

    solid_phi = jnp.full(SHAPE, 1.0, jnp.float32)
    sdf_fn = jax.jit(lambda f: pp.liquid_sdf_from_fields(
        f, SHAPE, DX, 0.5 * DX, solid_phi))
    _, ms = timed("liquid_sdf_from_fields", sdf_fn, fields)
    total += ms

    fsh = ((RES + 1, RES, RES), (RES, RES + 1, RES), (RES, RES, RES + 1))
    comb_fn = jax.jit(lambda s: pp.p2g_combine(s, SHAPE, fsh))
    _, ms = timed("p2g_combine", comb_fn, sums)
    total += ms

    grids = [jax.random.normal(jax.random.fold_in(k[2], i), SHAPE,
                               jnp.float32) for i in range(6)]
    cols_fn = jax.jit(lambda g0, g1, g2, g3, g4, g5: pp.build_mac_columns(
        [g0, g1], [g2, g3], [g4, g5], SHAPE))
    cols_a, ms = timed("build+tile cols (A, 108)", cols_fn, *grids)
    total += ms

    pay_a = jnp.concatenate(
        [stream.payload[0:3], stream.payload[7:10]], axis=0)
    gm_fn = jax.jit(lambda t, lk, p, c: pp.gather_mac(
        t, lk, p, c, N, DX, 2))
    gm, ms = timed("gather_mac (A, 2 grids)", gm_fn,
                   stream.plan.tabs, stream.plan.lockeys, pay_a, cols_a)
    total += ms

    # pass B: midpoint shift <= 2.5 cells
    mid_j = jnp.clip(
        pos_j + jax.random.uniform(
            k[3], (N, 3), jnp.float32, -2.5 * DX, 2.5 * DX),
        0.001, 0.999)
    sortb_fn = jax.jit(lambda m, px, py, pz: pp.sort_by_key(
        pp.key_of_position(m, DX, SHAPE),
        (m[:, 0], m[:, 1], m[:, 2], px, py, pz,
         px * 0.1, py * 0.1, pz * 0.1), SHAPE))
    (key_b, sorted_b, plan_b), ms = timed(
        "sort_by_key+plan (pass B)", sortb_fn, mid_j,
        stream.sorted[0], stream.sorted[1], stream.sorted[2])
    total += ms

    colsb_fn = jax.jit(lambda g0, g1, g2: pp.build_mac_columns(
        [g0], [g1], [g2], SHAPE))
    cols_b, ms = timed("build+tile cols (B, 54)", colsb_fn, *grids[0:3])
    total += ms

    payb_fn = jax.jit(lambda x, y, z, k: pp.gather_payload(
        x, y, z, k, SHAPE))
    pay_b, _ = timed("gather_payload (B)", payb_fn,
                     sorted_b[0], sorted_b[1], sorted_b[2], key_b)

    gmb_fn = jax.jit(lambda t, lk, p, c: pp.gather_mac(
        t, lk, p, c, N, DX, 1))
    _, ms = timed("gather_mac (B, 1 grid)", gmb_fn,
                  plan_b.tabs, plan_b.lockeys, pay_b, cols_b)
    total += ms

    # ---- pass B WITHOUT the sort: midpoint visit plan over pass-A order.
    # The midpoints here must follow the pass-A ORDERING (sorted positions
    # + jitter), unlike the sort path above which re-orders them itself.
    midA_j = jnp.clip(
        jnp.stack([stream.sorted[a] for a in range(3)], axis=1)
        + jax.random.uniform(
            k[4], (N, 3), jnp.float32, -2.5 * DX, 2.5 * DX),
        0.001, 0.999)
    planm_fn = jax.jit(lambda m: pp.plan_midpoint_visits(
        pp.key_of_position(m, DX, SHAPE), N, SHAPE))
    plan_m, ms_plan = timed("plan_midpoint_visits (B')", planm_fn, midA_j)
    cov = float(jnp.mean(plan_m.covered.astype(jnp.float32)).item())
    nv_m = plan_m.lockeys.shape[1] // pp.C
    nv_b = plan_b.lockeys.shape[1] // pp.C
    print(f"    coverage {cov:.6f}  visits {nv_m} (sort path {nv_b})",
          flush=True)
    paym_fn = jax.jit(lambda m: pp.gather_payload(
        m[:, 0], m[:, 1], m[:, 2],
        pp.key_of_position(m, DX, SHAPE), SHAPE))
    pay_m, _ = timed("gather_payload (B')", paym_fn, midA_j)
    _, ms_gm = timed("gather_mac (B', 1 grid)", gmb_fn,
                     plan_m.tabs, plan_m.lockeys, pay_m, cols_b)
    print(f"{'pass-B plan vs sort':28s} {'':14s} "
          f"{ms_plan + ms_gm:9.2f} ms vs sort-path total above", flush=True)

    # ---- stale pass A: budget plans + in-kernel-rank scatter vs the sort.
    # Positions drift from the sorted order like one substep of real flow
    # (<= cfl/2 cells of jitter); coverage and per-stage deltas tell
    # whether pallas_pass_a="stale" beats re-sorting every substep.
    posA_j = jnp.clip(
        jnp.stack([stream.sorted[a] for a in range(3)], axis=1)
        + jax.random.uniform(
            k[6], (N, 3), jnp.float32, -2.5 * DX, 2.5 * DX),
        0.001, 0.999)
    plana_fn = jax.jit(lambda p: pp.plan_pass_a(
        pp.key_of_position(p, DX, SHAPE), N, SHAPE))
    (gplan, splan), ms_pa = timed("plan_pass_a (stale, 2 plans)",
                                  plana_fn, posA_j)
    cov_a = float(jnp.mean(gplan.covered.astype(jnp.float32)).item())
    print(f"    pass-A coverage {cov_a:.6f}  visits "
          f"{splan.lockeys.shape[1] // pp.C}", flush=True)
    paysta_fn = jax.jit(lambda p, v: pp.stale_payload(
        p, v, pp.key_of_position(p, DX, SHAPE), SHAPE))
    pay_st, ms_pp = timed("stale_payload", paysta_fn, posA_j, vel_j)
    scats_fn = jax.jit(lambda t, lk, pay: pp.scatter_p2g_table(
        t, lk, pay, SHAPE, DX, CAP, inkernel_rank=True))
    (sums2, tbl2), ms_sc2 = timed("scatter (in-kernel rank)", scats_fn,
                                  splan.tabs, splan.lockeys, pay_st)
    pay_a2 = jnp.concatenate([pay_st[0:3], pay_st[7:10]], axis=0)
    _, ms_gm2 = timed("gather_mac (A, stale plan)", gm_fn,
                      gplan.tabs, gplan.lockeys, pay_a2, cols_a)
    # the sort path's pass-A ordering cost it replaces: tiled_sort+plan;
    # stale replaces it with plans+payload and pays kernel deltas
    print(f"{'stale pass-A total':28s} {'':14s} "
          f"{ms_pa + ms_pp + ms_sc2 + ms_gm2:9.2f} ms "
          f"(sort path: sort+scatter+gather above)", flush=True)

    # ---- pushback A/B: XLA (N, 8) row gather vs packed-row kernel ----
    from flipviscosity3d_tpu.ops import stream_transfers as st
    from flipviscosity3d_tpu.ops.buckets import cell_of_position

    phi_node = jax.random.normal(
        k[5], (RES + 1, RES + 1, RES + 1), jnp.float32)
    cp = jnp.stack([stream.sorted[0], stream.sorted[1], stream.sorted[2]],
                   axis=1)
    pbg_fn = jax.jit(lambda p, ph: st.solid_pushback_at(
        p[:, 0], p[:, 1], p[:, 2],
        cell_of_position(p, DX, SHAPE), ph, DX, SHAPE))
    _, ms_g = timed("pushback: XLA row gather", pbg_fn, cp, phi_node)

    def pb_kernel(p, ph):
        key_k = pp.key_of_position(p, DX, SHAPE)
        plan_k = pp.plan_midpoint_visits(key_k, N, SHAPE)
        cols_n = pp.pack_cols8(pp.stack_tile_major(
            [c.reshape(SHAPE)
             for c in st.node_corner_columns(ph, SHAPE)], SHAPE))
        rows8 = pp.gather_rows8(plan_k.tabs, plan_k.lockeys, cols_n, N)
        ki, kj, kk = pp.decode_key(key_k, SHAPE)
        return st.pushback_from_corners(
            [rows8[f] for f in range(8)],
            p[:, 0] / DX - ki.astype(jnp.float32),
            p[:, 1] / DX - kj.astype(jnp.float32),
            p[:, 2] / DX - kk.astype(jnp.float32))
    pbk_fn = jax.jit(pb_kernel)
    _, ms_k = timed("pushback: packed kernel", pbk_fn, cp, phi_node)
    print(f"    pushback A/B: gather {ms_g:.2f} ms vs kernel {ms_k:.2f} ms",
          flush=True)

    # exactness spot-check of the scatter on hardware: weight-sum column
    # conservation (each particle contributes kernel weights summing to
    # whatever the XLA combine reproduces; here just check finiteness + a
    # random table slot against numpy)
    s = np.asarray(sums[..., :1])
    assert np.isfinite(s).all(), "non-finite scatter sums"
    print(f"{'TOTAL particle work':28s} {'':14s} {total:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
