"""Compare device tables for the 2M miss: wide node 1474's gathered row
(boxes + enc) and cluster 15488's A-block slab vs host truth."""

import sys

import numpy as np

sys.path.insert(0, ".")

import messyerraytracer_tpu as mrt
from messyerraytracer_tpu.kernels.cluster import cluster_cut, cluster_tcap_for
from messyerraytracer_tpu.kernels.wide import (
    _collapse8, WIDE8_CAP, NODE8_STRIDE,
)
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes

W_TGT = 1474     # wide node holding the cluster leaf (drill_2m_walk)
C_TGT = 15488    # cluster id
PID = 274838


def main():
    g2m = meshes.plane(40.0, y=0.0, subdiv=1004)
    g2m[:, :, 1] = (np.sin(g2m[:, :, 0] * 0.7)
                    * np.cos(g2m[:, :, 2] * 0.6)) * 1.5
    scene = build_scene_from_tri_array(g2m)
    cs = scene.cluster
    host = scene.bvh.host
    amin, amax = host["aabb_min"], host["aabb_max"]
    lf, cnt = host["left_first"], host["count"]
    tcap = cs.tcap
    roots, cfirst, ccnt = cluster_cut(lf, cnt, tcap)
    is_cluster = np.zeros(len(cnt), bool)
    is_cluster[roots] = True
    cluster_of = np.full(len(cnt), -1, np.int32)
    cluster_of[roots] = np.arange(len(roots), dtype=np.int32)
    ucnt = np.where(is_cluster, 1, 0).astype(np.int32)
    children, waxes = _collapse8(amin, amax, lf, ucnt)
    children = np.asarray(children, np.int32)

    # ---- device node row for W_TGT --------------------------------------
    from messyerraytracer_tpu.kernels.traverse_pallas import _to_columnar
    import jax.numpy as jnp

    nodes_col = np.asarray(
        _to_columnar(cs.nodes, NODE8_STRIDE, NODE8_STRIDE))
    print("nodes_col shape", nodes_col.shape, flush=True)
    blk, lane = W_TGT >> 7, W_TGT & 127
    col = nodes_col.reshape(-1, NODE8_STRIDE, 128)[blk][:, lane]
    row = children[W_TGT]
    print("host children:", row, flush=True)
    for k in range(WIDE8_CAP):
        b = row[k]
        dev_box = col[6 * k: 6 * k + 6]
        dev_enc = col[48 + k]
        if b >= 0:
            exp_enc = 2 * (cluster_of[b] if is_cluster[b] else -99) + 1 \
                if is_cluster[b] else None
            hb = np.concatenate([amin[b], amax[b]])
            ok = np.allclose(dev_box, hb)
            print(f"  k={k} bin={b} clu={is_cluster[b]} box_ok={ok} "
                  f"enc_dev={dev_enc} "
                  f"(cluster_of={cluster_of[b]})", flush=True)
            if not ok:
                print("    dev:", dev_box, "\n    host:", hb, flush=True)
        else:
            print(f"  k={k} absent enc_dev={dev_enc} box={dev_box[:3]}",
                  flush=True)
    print("axis dev:", col[56], "host:", waxes[W_TGT], flush=True)

    # ---- A-block slab of C_TGT ------------------------------------------
    br = tcap + 8
    ab = np.asarray(cs.ablocks[C_TGT * br:(C_TGT + 1) * br])
    anchor = ab[tcap, 0:3]
    count = ab[tcap, 3]
    print("ablock anchor", anchor, "count", count, flush=True)
    # find PID's row
    pid_lane = ab[:tcap, 16]
    rows = np.nonzero(pid_lane == PID)[0]
    print("rows with pid:", rows, flush=True)
    if len(rows):
        k = rows[0]
        # MT solve exactly as the kernel: lanes 0:16 of row k
        r = ab[k]
        o = np.float32([0.0, 14.0, 30.0])
        d64 = np.array([-0.56593716, -0.5795887, -0.586338])
        d = (d64 / np.linalg.norm(d64)).astype(np.float32)
        ax, ay, az = anchor
        invdd = np.float32(1.0)
        tau = (d[0] * (ax - o[0]) + d[1] * (ay - o[1])
               + d[2] * (az - o[2])) * invdd
        oc = o + tau * d - anchor
        mm = np.cross(oc, d) * -1.0  # m = oc x d? kernel: m=(ocy*dz-...)
        mx = oc[1] * d[2] - oc[2] * d[1]
        my = oc[2] * d[0] - oc[0] * d[2]
        mz = oc[0] * d[1] - oc[1] * d[0]
        nn = r[0:3]
        c2 = r[3:6]
        e2 = r[6:9]
        c1 = r[9:12]
        e1 = r[12:15]
        tw = r[15]
        det = nn @ d
        un = c2 @ d + e2 @ np.array([mx, my, mz], np.float32)
        vn = c1 @ d + e1 @ np.array([mx, my, mz], np.float32)
        tn = -(nn @ oc) + tw
        idet = 1.0 / det
        print(f"det={det} u={un * idet} v={vn * idet} "
              f"t={tn * idet + tau}", flush=True)


if __name__ == "__main__":
    main()
