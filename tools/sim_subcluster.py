"""Sub-cluster gating simulator — bound the win of VERDICT r4 item 1b.

The v2 drain is per-ROW exact: a (row of 128 rays) x (cluster of T tris)
dense phase runs iff >= 1 lane's slab test passed.  The residual waste is
WITHIN the phase: lanes that never needed the cluster still execute its
T MT tests (tri/ray 375 executed vs 7.1 exact at 1M, BENCH_r03/r4).

A finer drain would split the cluster's slab into S sub-slabs of T/S
triangles, slab-test each sub-AABB against the row, and run only the
sub-phases with a set bit.  This sim measures (host-side numpy, real
scenes + real camera/random rays) how many sub-phases of each size
actually fire, turning that into a predicted issue-time ratio via the
measured v2 cost model:

    row phase (T=64):   ~0.45 us   (PERF.md r4: 0.37-0.51 measured)
    sub phase (T=16):   ~0.45 * (16+8)/(64+8) us  (issue ~ vreg rows)
    sub-gate overhead:  4 sub slab tests + mask pack ~= 0.10 us/row

Usage: python tools/sim_subcluster.py [--scene 99k|1m] [--rays cam|rand]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from sim_cluster import bench_scene_tris, cluster_cut  # noqa: E402


def simulate_sub(tris, tcap, sub, srows, n_tiles, ray_mode, seed=5):
    import messyerraytracer_tpu as mrt
    from messyerraytracer_tpu.accel.bvh import build_bvh
    from messyerraytracer_tpu.dispatch.morton import (
        raster_block_permutation,
        sort_perm_6d,
    )
    from messyerraytracer_tpu.core.types import Rays
    from messyerraytracer_tpu.kernels.wide import _collapse8
    import jax.numpy as jnp

    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    bvh = build_bvh(v0, v1, v2)
    host = bvh.host
    amin, amax = host["aabb_min"], host["aabb_max"]
    lf, cnt = host["left_first"], host["count"]
    order = host["tri_order"]
    pv0 = v0[order]
    pe1 = v1[order] - v0[order]
    pe2 = v2[order] - v0[order]

    roots, cfirst, ccnt = cluster_cut(lf, cnt, tcap)
    C = len(roots)

    # sub-slab AABBs: bounds of each cluster's k-th group of ``sub`` tris
    nsub = tcap // sub
    sub_min = np.full((C, nsub, 3), np.inf, np.float32)
    sub_max = np.full((C, nsub, 3), -np.inf, np.float32)
    for c in range(C):
        s0, nc = cfirst[c], ccnt[c]
        for k in range(nsub):
            a, b = k * sub, min((k + 1) * sub, nc)
            if a >= nc:
                continue
            pts = np.concatenate([
                pv0[s0 + a:s0 + b],
                pv0[s0 + a:s0 + b] + pe1[s0 + a:s0 + b],
                pv0[s0 + a:s0 + b] + pe2[s0 + a:s0 + b],
            ])
            sub_min[c, k] = pts.min(0)
            sub_max[c, k] = pts.max(0)

    ucnt = np.where(np.isin(np.arange(len(cnt)), roots), 1, 0).astype(
        np.int32)
    children, _ = _collapse8(amin, amax, lf, ucnt)
    cluster_of = np.full(len(cnt), -1)
    cluster_of[roots] = np.arange(C)
    wide_of = np.full(len(cnt), -1)
    internal_ids = children[children >= 0]
    internal_ids = internal_ids[ucnt[internal_ids] == 0]
    wide_of[0] = 0
    wide_of[internal_ids] = np.arange(1, len(internal_ids) + 1)

    tile = srows * 128
    if ray_mode == "cam":
        w, h = 1024, 768
        cam = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0),
                                       fov_degrees=60.0)
        rays = mrt.generate_rays(cam, w, h)
        perm = raster_block_permutation(w, h, 32)
        o = np.asarray(rays.origin)[perm]
        d = np.asarray(rays.direction)[perm]
    else:
        rng = np.random.default_rng(seed)
        n = n_tiles * tile * 4
        o = rng.uniform(-18, 18, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rr = Rays(origin=jnp.asarray(o), direction=jnp.asarray(d),
                  t_min=jnp.full((n,), 1e-3, jnp.float32),
                  t_max=jnp.full((n,), 3e38, jnp.float32))
        sp = np.asarray(sort_perm_6d(rr, jnp.asarray(amin[0]),
                                     jnp.asarray(amax[0])))
        o, d = o[sp], d[sp]

    total_tiles = len(o) // tile
    pick = np.linspace(0, total_tiles - 1, n_tiles).astype(int)

    agg = np.zeros(5)  # drains64, subphases, subrow_gates, pops, rays
    for tidx in pick:
        ro = o[tidx * tile:(tidx + 1) * tile]
        rd = d[tidx * tile:(tidx + 1) * tile]
        inv = np.where(np.abs(rd) < 1e-9,
                       1e9 * np.sign(rd + 1e-30), 1.0 / rd)
        best = np.full(tile, np.inf, np.float32)
        pops = drains = subph = 0
        stack = [0]
        while stack:
            wn = stack.pop()
            pops += 1
            kids = children[wn]
            entries = []
            for b in kids:
                if b < 0:
                    continue
                t1 = (amin[b] - ro) * inv
                t2 = (amax[b] - ro) * inv
                tn = np.minimum(t1, t2).max(axis=1)
                tf = np.maximum(t1, t2).min(axis=1)
                hit = (tf >= np.maximum(tn, 0.0)) & (tn <= best)
                if hit.any():
                    entries.append((tn[hit].min(), b, hit))
            entries.sort(key=lambda e: -e[0])
            for _, b, hit in entries:
                if ucnt[b] > 0:
                    c = cluster_of[b]
                    rowhit = hit.reshape(srows, 128)
                    rows_on = np.nonzero(rowhit.any(axis=1))[0]
                    drains += len(rows_on)
                    s0, nc = cfirst[c], ccnt[c]
                    # per fired row: which sub-slabs does ANY lane hit?
                    for r in rows_on:
                        sl = slice(r * 128, (r + 1) * 128)
                        rob, rdb = ro[sl], inv[sl]
                        bb = best[sl]
                        for k in range(nsub):
                            if k * sub >= nc:
                                break
                            t1 = (sub_min[c, k] - rob) * rdb
                            t2 = (sub_max[c, k] - rob) * rdb
                            tn = np.minimum(t1, t2).max(axis=1)
                            tf = np.maximum(t1, t2).min(axis=1)
                            if ((tf >= np.maximum(tn, 0.0))
                                    & (tn <= bb)).any():
                                subph += 1
                    # dense MT over the full cluster (exact kernel math)
                    tv0 = pv0[s0:s0 + nc]
                    te1 = pe1[s0:s0 + nc]
                    te2 = pe2[s0:s0 + nc]
                    pvv = np.cross(rd[:, None, :], te2[None])
                    det = (te1[None] * pvv).sum(-1)
                    ok = np.abs(det) >= 1e-8
                    idet = 1.0 / np.where(ok, det, 1.0)
                    tvv = ro[:, None, :] - tv0[None]
                    u = (tvv * pvv).sum(-1) * idet
                    qv = np.cross(tvv, te1[None])
                    vv = (rd[:, None, :] * qv).sum(-1) * idet
                    tt = (te2[None] * qv).sum(-1) * idet
                    val = (ok & (u >= 0) & (u <= 1) & (vv >= 0)
                           & (u + vv <= 1) & (tt >= 1e-3)
                           & (tt < best[:, None]))
                    tt = np.where(val, tt, np.inf)
                    # kernel applies updates only to fired rows; for the
                    # sim's best-t evolution use the full-tile min (the
                    # kernel's rowmask is push-time conservative, so this
                    # only makes the sim slightly OPTIMISTIC about caps)
                    best = np.minimum(best, tt.min(axis=1))
                else:
                    stack.append(wide_of[b])
        agg += (drains, subph, drains, pops, tile)

    drains, subph, _, pops, rays_n = agg
    # measured v2 cost model (PERF.md r4)
    row_us = 0.45
    sub_us = row_us * (sub + 8) / (tcap + 8)
    gate_us = 0.10
    t_now = drains * row_us
    t_sub = drains * gate_us + subph * sub_us
    return dict(
        clusters=C,
        pops=int(pops), drains64=int(drains), subphases=int(subph),
        subs_per_drain=round(subph / max(drains, 1), 2),
        tests_now=int(drains * tcap * 128),
        tests_sub=int(subph * sub * 128),
        tri_ray_now=round(drains * tcap / rays_n * srows, 1),
        tri_ray_sub=round(subph * sub / rays_n * srows, 1),
        dense_us_now=round(t_now, 0), dense_us_sub=round(t_sub, 0),
        dense_speedup=round(t_now / max(t_sub, 1e-9), 2),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="99k")
    ap.add_argument("--rays", default="cam", choices=["cam", "rand"])
    ap.add_argument("--tcap", type=int, default=64)
    ap.add_argument("--subs", default="8,16,32")
    ap.add_argument("--srows", type=int, default=16)
    ap.add_argument("--tiles", type=int, default=8)
    args = ap.parse_args()

    tris = bench_scene_tris(args.scene)
    print(f"scene={args.scene} tris={len(tris)} rays={args.rays} "
          f"T={args.tcap}")
    for sub in [int(x) for x in args.subs.split(",")]:
        t0 = time.time()
        r = simulate_sub(tris, args.tcap, sub, args.srows, args.tiles,
                         args.rays)
        print(f"sub={sub:3d} {r}  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
