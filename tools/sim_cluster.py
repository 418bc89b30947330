"""Footprint simulator for the round-3 MXU cluster-traversal design.

Before building the Pallas cluster kernel, measure (host-side, numpy) what
the packet traversal's *cluster footprint* will be on the bench scenes:
for each candidate cluster cap T, cut the binary BVH at subtree-size <= T,
collapse the upper tree to 8-wide, and simulate the shared-stack packet
traversal over real camera tiles — counting node pops and cluster visits
per tile.  Those two numbers × a measured cost model (pop ~1 us serial
latency, visit ~dense MXU/VPU time) predict Mrays/s and select T.

Usage: python tools/sim_cluster.py [--scene 99k|1m] [--srows 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_scene_tris(which: str) -> np.ndarray:
    from messyerraytracer_tpu.utils import meshes

    if which == "1m":
        g = meshes.plane(40.0, y=0.0, subdiv=710)
        g[:, :, 1] = (np.sin(g[:, :, 0] * 0.7) * np.cos(g[:, :, 2] * 0.6)) * 1.5
        return g
    g = meshes.plane(40.0, y=0.0, subdiv=158)
    g[:, :, 1] = (np.sin(g[:, :, 0] * 0.6) * np.cos(g[:, :, 2] * 0.5)) * 1.5
    sphere = meshes.uv_sphere(4.0, 112, 112, center=(0, 6, 0))
    rng = np.random.default_rng(7)
    boxes = []
    for _ in range(2000):
        c = rng.uniform(-18, 18, 2)
        h = rng.uniform(0.5, 4.0)
        boxes.append(
            meshes.box(
                (rng.uniform(0.5, 2), h, rng.uniform(0.5, 2)),
                center=(c[0], h / 2, c[1]),
            )
        )
    return np.concatenate([g, sphere] + boxes)


def tree_aux(lf, cnt):
    """parent / depth / subtree count / subtree first-slot, all vectorized
    (children of DFS-preorder node i are i+1 and lf[i]; parent < child)."""
    m = len(cnt)
    is_leaf = cnt > 0
    par = np.full(m, -1, np.int64)
    internal = np.nonzero(~is_leaf)[0]
    par[internal + 1] = internal
    par[lf[internal]] = internal

    depth = np.zeros(m, np.int32)
    frontier = np.array([0], np.int64)
    levels = []
    d = 0
    while frontier.size:
        levels.append(frontier)
        depth[frontier] = d
        f_int = frontier[~is_leaf[frontier]]
        frontier = np.concatenate([f_int + 1, lf[f_int]]) if f_int.size else \
            np.empty(0, np.int64)
        d += 1

    sub_cnt = np.where(is_leaf, cnt, 0).astype(np.int64)
    sub_first = np.where(is_leaf, lf, 0).astype(np.int64)
    for lvl in reversed(levels):
        li = lvl[~is_leaf[lvl]]
        if li.size:
            sub_cnt[li] = sub_cnt[li + 1] + sub_cnt[lf[li]]
            sub_first[li] = sub_first[li + 1]
    return par, depth, sub_cnt, sub_first, is_leaf


def cluster_cut(lf, cnt, tcap):
    par, depth, sub_cnt, sub_first, is_leaf = tree_aux(lf, cnt)
    mark = sub_cnt <= tcap
    pm = np.ones(len(cnt), bool)
    pm[1:] = ~mark[par[1:]]  # parent not already a cluster
    roots = np.nonzero(mark & pm)[0]
    return roots, sub_first[roots], sub_cnt[roots]


def simulate(tris, tcap, srows, n_tiles, cam_cfg):
    import messyerraytracer_tpu as mrt
    from messyerraytracer_tpu.accel.bvh import build_bvh
    from messyerraytracer_tpu.dispatch.morton import raster_block_permutation
    from messyerraytracer_tpu.kernels.wide import _collapse8

    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    bvh = build_bvh(v0, v1, v2)
    host = bvh.host
    amin, amax = host["aabb_min"], host["aabb_max"]
    lf, cnt = host["left_first"], host["count"]
    order = host["tri_order"]
    pv0, pe1, pe2 = v0[order], v1[order] - v0[order], v2[order] - v0[order]

    roots, cfirst, ccnt = cluster_cut(lf, cnt, tcap)
    C = len(roots)
    fill = ccnt.sum() / (C * tcap)

    # upper 8-wide tree: cluster roots become leaves
    ucnt = np.where(np.isin(np.arange(len(cnt)), roots), 1, 0).astype(np.int32)
    # _collapse8 treats cnt>0 as leaf
    children, axes = _collapse8(amin, amax, lf, ucnt)
    nw = len(children)

    cluster_of = np.full(len(cnt), -1)
    cluster_of[roots] = np.arange(C)

    # camera rays, block-swizzled like bench.py
    w, h = 1024, 768
    cam = mrt.CameraParams.look_at(cam_cfg[0], cam_cfg[1], fov_degrees=60.0)
    rays = mrt.generate_rays(cam, w, h)
    perm = raster_block_permutation(w, h, 32)
    o = np.asarray(rays.origin)[perm]
    d = np.asarray(rays.direction)[perm]

    tile = srows * 128
    total_tiles = (w * h) // tile
    pick = np.linspace(0, total_tiles - 1, n_tiles).astype(int)

    wide_of = np.full(len(cnt), -1)
    internal_ids = children[children >= 0]
    internal_ids = internal_ids[ucnt[internal_ids] == 0]
    wide_of[0] = 0
    wide_of[internal_ids] = np.arange(1, len(internal_ids) + 1)

    stats = []
    for tidx in pick:
        ro = o[tidx * tile:(tidx + 1) * tile]
        rd = d[tidx * tile:(tidx + 1) * tile]
        inv = np.where(np.abs(rd) < 1e-9, 1e9 * np.sign(rd + 1e-30), 1.0 / rd)
        best = np.full(tile, np.inf, np.float32)
        pops = 0
        visits = 0
        stack = [0]  # wide node ids
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
                    entries.append((tn[hit].min(), b))
            entries.sort(reverse=True)  # far first -> near pops first
            for _, b in entries:
                if ucnt[b] > 0:  # cluster
                    visits += 1
                    c = cluster_of[b]
                    s0, nc = cfirst[c], ccnt[c]
                    tv0 = pv0[s0:s0 + nc]
                    te1 = pe1[s0:s0 + nc]
                    te2 = pe2[s0:s0 + nc]
                    # vectorized MT (R, T)
                    pvv = np.cross(rd[:, None, :], te2[None, :, :])
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
                    best = np.minimum(best, tt.min(axis=1))
                else:
                    stack.append(wide_of[b])
        stats.append((pops, visits))
    stats = np.array(stats)
    return dict(
        C=C, nw=nw, fill=round(float(fill), 3),
        pops_mean=round(float(stats[:, 0].mean()), 1),
        pops_max=int(stats[:, 0].max()),
        visits_mean=round(float(stats[:, 1].mean()), 1),
        visits_max=int(stats[:, 1].max()),
        tri_per_ray=round(float(stats[:, 1].mean() * tcap), 0),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="99k")
    ap.add_argument("--srows", type=int, default=16)
    ap.add_argument("--tiles", type=int, default=12)
    ap.add_argument("--tcaps", default="32,64,128,256")
    args = ap.parse_args()

    tris = bench_scene_tris(args.scene)
    cam_cfg = ((0, 14, 30), (0, 2, 0))
    print(f"scene={args.scene} tris={len(tris)} srows={args.srows}")
    for tcap in [int(x) for x in args.tcaps.split(",")]:
        t0 = time.time()
        r = simulate(tris, tcap, args.srows, args.tiles, cam_cfg)
        # cost model: pop ~1.0 us serial; visit ~ (srows/16)*(tcap/64)*1.5 us
        visit_us = (args.srows / 16) * (tcap / 64) * 1.5
        t_tile = r["pops_mean"] * 1.0 + r["visits_mean"] * visit_us
        mrays = args.srows * 128 / t_tile
        print(f"T={tcap:4d} {r} est_tile_us={t_tile:.0f} "
              f"est_Mrays={mrays:.0f}  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
