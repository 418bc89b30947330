"""Host-walk the 2M upper tree for the failing ray (drill_2m.py):
simulate the kernel's f32 slab tests over the wide8 tree and report
where the path to the hit cluster breaks."""

import sys

import numpy as np

sys.path.insert(0, ".")

import messyerraytracer_tpu as mrt
from messyerraytracer_tpu.core.types import INV_DIR_EPS
from messyerraytracer_tpu.kernels.cluster import cluster_cut, cluster_tcap_for
from messyerraytracer_tpu.kernels.wide import _collapse8, WIDE8_CAP
from messyerraytracer_tpu.accel.bvh import build_bvh
from messyerraytracer_tpu.utils import meshes


def main():
    g2m = meshes.plane(40.0, y=0.0, subdiv=1004)
    g2m[:, :, 1] = (np.sin(g2m[:, :, 0] * 0.7)
                    * np.cos(g2m[:, :, 2] * 0.6)) * 1.5
    tri = np.asarray(g2m, np.float32)
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    bvh = build_bvh(v0, v1, v2)
    host = bvh.host
    amin, amax = host["aabb_min"], host["aabb_max"]
    lf, cnt = host["left_first"], host["count"]
    perm = host["tri_order"]
    tcap = cluster_tcap_for(len(v0))
    roots, cfirst, ccnt = cluster_cut(lf, cnt, tcap)
    C = len(roots)
    print(f"tris={len(v0)} m={len(cnt)} C={C} tcap={tcap}", flush=True)

    # locate the missed triangle's cluster
    pid_tgt = 274838
    slot = int(np.nonzero(perm == pid_tgt)[0][0])
    ci = int(np.searchsorted(cfirst, slot, side="right") - 1)
    assert cfirst[ci] <= slot < cfirst[ci] + ccnt[ci], "slot range"
    print(f"pid {pid_tgt} -> slot {slot} -> cluster {ci} "
          f"(root binary node {roots[ci]})", flush=True)
    tv = tri[pid_tgt]
    print("tri verts:", tv, flush=True)
    rb = roots[ci]
    print("cluster box:", amin[rb], amax[rb], flush=True)

    # wide tree (upper): leaves = cluster roots
    is_cluster = np.zeros(len(cnt), bool)
    is_cluster[roots] = True
    cluster_of = np.full(len(cnt), -1, np.int32)
    cluster_of[roots] = np.arange(C, dtype=np.int32)
    ucnt = np.where(is_cluster, 1, 0).astype(np.int32)
    children, waxes = _collapse8(amin, amax, lf, ucnt)
    children = np.asarray(children, np.int32)
    nw = children.shape[0]
    order = children[children >= 0]
    internal_kids = order[ucnt[order] == 0]
    wide_of = np.full(len(cnt), -1, np.int32)
    wide_of[0] = 0
    wide_of[internal_kids] = np.arange(1, len(internal_kids) + 1,
                                       dtype=np.int32)
    print(f"wide nodes nw={nw}", flush=True)

    # global reachability: every cluster appears exactly once as a leaf?
    leaf_ids = order[ucnt[order] == 1]
    cl = cluster_of[leaf_ids]
    print(f"leaf enc count={len(cl)} unique={len(np.unique(cl))} "
          f"missing={sorted(set(range(C)) - set(cl.tolist()))[:5]}",
          flush=True)
    # internal wide reachability
    print(f"internal kids={len(internal_kids)} vs nw-1={nw - 1}",
          flush=True)

    # binary ancestors of the cluster root
    m = len(cnt)
    par = np.full(m, -1, np.int64)
    internal = np.nonzero(cnt == 0)[0]
    par[internal + 1] = internal
    par[lf[internal]] = internal
    chain = []
    x = rb
    while x != -1:
        chain.append(int(x))
        x = par[x]
    chain.reverse()
    print("binary ancestor chain len:", len(chain), flush=True)

    # f32 slab test exactly as the kernel computes it
    o = np.float32([0.0, 14.0, 30.0])
    d64 = np.array([-0.56593716, -0.5795887, -0.586338])
    d = (d64 / np.linalg.norm(d64)).astype(np.float32)

    def safe_inv(x):
        x = np.float32(x)
        if abs(x) < INV_DIR_EPS:
            return np.float32(np.sign(x) if x != 0 else 1.0) / np.float32(
                INV_DIR_EPS)
        return np.float32(1.0) / x

    inv = np.array([safe_inv(d[a]) for a in range(3)], np.float32)

    def slab(bmin, bmax, cap=np.float32(3.0e38)):
        tn = np.float32(-3.0e38)
        tf = np.float32(3.0e38)
        for a in range(3):
            t1 = np.float32((bmin[a] - o[a]) * inv[a])
            t2 = np.float32((bmax[a] - o[a]) * inv[a])
            tn = max(tn, min(t1, t2))
            tf = min(tf, max(t1, t2))
        return (tf >= max(tn, np.float32(0.0))) and (tn <= cap), tn, tf

    for x in chain:
        okx, tn, tf = slab(amin[x], amax[x])
        tag = ("CLUSTER" if is_cluster[x] else
               f"wide={wide_of[x]}" if wide_of[x] >= 0 else "collapsed")
        if not okx or x in (chain[0], chain[-1]):
            print(f"  binary {x} [{tag}]: ok={okx} tn={tn:.4f} "
                  f"tf={tf:.4f}", flush=True)
        if not okx:
            print("  ^^^ BINARY SLAB FAILS HERE", flush=True)

    # wide walk: does the kernel's tree reach the cluster?
    target_enc = 2 * ci + 1
    hit_nodes = []
    stack = [0]
    found = False
    while stack:
        w = stack.pop()
        row = children[w]
        for k in range(WIDE8_CAP):
            b = row[k]
            if b < 0:
                continue
            okx, tn, tf = slab(amin[b], amax[b])
            if not okx:
                continue
            if is_cluster[b]:
                if cluster_of[b] == ci:
                    found = True
                    hit_nodes.append((w, k, b))
            else:
                stack.append(int(wide_of[b]))
    print(f"wide walk reaches cluster {ci}: {found} via {hit_nodes}",
          flush=True)

    # if not reached: find which wide ancestor pruned it
    if not found:
        wchain = [x for x in chain if wide_of[x] >= 0 or x == 0]
        print("wide-visible chain:", wchain, flush=True)
        for x in chain:
            if wide_of[x] >= 0 or is_cluster[x]:
                okx, tn, tf = slab(amin[x], amax[x])
                print(f"  node {x} wide={wide_of[x]} "
                      f"clu={is_cluster[x]} ok={okx} "
                      f"box={amin[x]}..{amax[x]} tn={tn} tf={tf}",
                      flush=True)


if __name__ == "__main__":
    main()
