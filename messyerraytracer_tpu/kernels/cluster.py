"""MXU cluster-traversal layout + kernel — the round-3 dense-phase design.

The packet megakernel (traverse_pallas.py) is bound by its serial pop
chain: every 4-triangle leaf batch pays a vector->scalar reduction + SMEM
round trip, capping the VPU at ~23% of peak (PERF.md roofline).  This
module replaces the *lower* tree levels with dense MXU phases:

  * The binary SAH BVH is cut at subtrees of <= T triangles ("clusters",
    T = 64 default).  The upper tree over clusters is collapsed 8-wide
    (2-3 levels deep at 100K tris) and traversed with the existing
    shared-SMEM-stack packet scheme — but it now has ~50x fewer nodes, so
    pops per tile drop from ~70 to ~10.
  * A cluster visit intersects ALL rays in the tile against ALL T
    triangles as ONE matmul per ray row: the Moller-Trumbore numerators
    and determinant are bilinear in (ray, triangle), so with rays packed
    as Plucker-style vectors r = [d, m=o'xd, o', 1] and triangles as a
    precomputed (4T, 16) matrix A (rows det/u/v/t x T), the whole
    (ray, tri) pair grid is A @ P — an MXU contraction — followed by a
    short dense VPU epilogue (divide, range tests, min-reduce).  This is
    the reference GPU's per-node child-batch testing
    (src/gpu/shaders/cwbvh_traverse.comp.glsl:260-323) recast as matmuls.
  * Conditioning: the raw Plucker moment m = o x d amplifies rounding by
    |o| / |hit offset|.  Each cluster stores an anchor a (its AABB
    center); rays are re-anchored per visit at their closest approach to
    a (tau = d.(a - o), o' = o + tau d - a) and triangles are built with
    v0' = v0 - a, so all matmul operands are O(cluster size) and the
    recovered t = tau + t_local keeps ~1e-7 relative accuracy (verified
    against float64 ground truth; better than sequential f32 MT on far
    clusters).
  * Cluster A-blocks are NOT VMEM-resident: each is DMA'd from HBM when
    its cluster is pushed onto the drain queue — the queue doubles as a
    prefetch pipeline, so the fetch latency hides under earlier drains.
    Capacity is therefore HBM-bound (works unchanged at 2M+ triangles,
    retiring the old streaming tier's 55x cliff).

Math derivation (scalar triple product identities, verified numerically):
    det   = e1.(d x e2)        = d.(e2 x e1)        = -d.n
    u_num = (o-v0).(d x e2)    = e2.m + d.(v0 x e2)
    v_num = d.((o-v0) x e1)    = -e1.m - d.(v0 x e1)
    t_num = (o-v0).n           = o.n - v0.n
with n = e1 x e2, m = o x d; u = u_num/det etc., identical hit semantics
to core/geometry.py::moller_trumbore (same det epsilon, same ranges).

Reference parity targets: RayScene cast semantics (ray_scene.h:96-131),
per-leaf filter-during-traversal layer masking (ray_scene.h:124), NaN
dummy-node sentinel (gpu_ray_caster.cpp:263-268).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import BVH
from ..core.types import (
    INV_DIR_EPS,
    MT_DET_EPS,
    NO_HIT,
    T_MAX_DEFAULT,
    Hits,
    Rays,
    RayStats,
)
from ..utils.struct import pytree_dataclass
from .wide import NODE8_STRIDE, NODES8_PER_ROW, WIDE8_CAP, _collapse8, _pack_idx

TCAP_DEFAULT = 64       # triangles per cluster (A-matrix column count / 4)
QCAP = 16               # drain-queue ring depth = in-flight prefetch slots
KSTACK = 64             # upper-tree DFS stack depth
MAX_ITERS = 1 << 20     # runaway guard (bvh_traverse.comp.glsl:158)
_BIG = 3.0e38


# ---------------------------------------------------------------------------
# host-side: cluster cut over the binary DFS BVH
# ---------------------------------------------------------------------------

def _tree_levels(lf: np.ndarray, cnt: np.ndarray):
    """Vectorized per-depth node index lists for the DFS binary tree
    (children of internal preorder node i are i+1 and lf[i])."""
    is_leaf = cnt > 0
    levels = []
    frontier = np.array([0], np.int64)
    while frontier.size:
        levels.append(frontier)
        f_int = frontier[~is_leaf[frontier]]
        frontier = (np.concatenate([f_int + 1, lf[f_int]])
                    if f_int.size else np.empty(0, np.int64))
    return levels, is_leaf


def cluster_cut(lf: np.ndarray, cnt: np.ndarray, tcap: int):
    """Cut the tree at maximal subtrees holding <= tcap triangles.

    Returns (roots, first, count): cluster root node ids in DFS order and
    each cluster's contiguous triangle-slot range (DFS subtrees own
    contiguous slot ranges by construction, accel/bvh.py::emit).
    """
    m = len(cnt)
    levels, is_leaf = _tree_levels(lf, cnt)
    sub_cnt = np.where(is_leaf, cnt, 0).astype(np.int64)
    sub_first = np.where(is_leaf, lf, 0).astype(np.int64)
    for lvl in reversed(levels):
        li = lvl[~is_leaf[lvl]]
        if li.size:
            sub_cnt[li] = sub_cnt[li + 1] + sub_cnt[lf[li]]
            sub_first[li] = sub_first[li + 1]
    par = np.full(m, -1, np.int64)
    internal = np.nonzero(~is_leaf)[0]
    par[internal + 1] = internal
    par[lf[internal]] = internal
    mark = sub_cnt <= tcap
    root_flag = mark.copy()
    root_flag[1:] &= ~mark[par[1:]]
    roots = np.nonzero(root_flag)[0]
    return (roots.astype(np.int64), sub_first[roots].astype(np.int64),
            sub_cnt[roots].astype(np.int64))


# ---------------------------------------------------------------------------
# device layout
# ---------------------------------------------------------------------------

@pytree_dataclass(meta_fields=("tcap", "dummy_enc", "num_clusters"))
class ClusterScene:
    """Device arrays for the MXU cluster kernel.

    nodes      (NR, 128) f32 — upper-tree 8-wide rows, wide8 layout
               (kernels/wide.py): child boxes at 6k, enc at 48+k (leaf bit
               set => cluster id), sort axis at 56.
    ablocks    (G8*BR, 128) f32 — Plucker A-matrix blocks, 8 clusters per
               128-lane group.  Group g rows [g*BR, (g+1)*BR); cluster c
               occupies lanes [16*(c%8), 16*(c%8)+16) of group c//8.
               Rows 0..4T-1: A rows grouped [det | u | v | t] x T.
               Row 4T: lanes 0:3 = anchor, lane 3.. wait lane 3 = real-tri
               count (f32).  Rows 4T+1..BR-1: zero pad (BR = 4T+8).
    slot_*     (C*T,) hit metadata per padded slot (slot = c*T + k).
    node_idx / node_const — gather tables for device refresh after refit
               (same contract as kernels/wide.py).
    croots / cfirst / ccnt / cvalid — cluster tables for the device-side
               A-block (re)build.
    """

    nodes: jnp.ndarray
    ablocks: jnp.ndarray
    slot_prim_id: jnp.ndarray
    slot_layers: jnp.ndarray
    slot_normal: jnp.ndarray
    slot_tri: jnp.ndarray
    node_idx: jnp.ndarray
    node_const: jnp.ndarray
    croots: jnp.ndarray        # (C,) int32 binary-node id per cluster
    slot_map: jnp.ndarray      # (C*T,) int32 tri slot per padded slot
    cvalid: jnp.ndarray        # (C*T,) bool padded-slot validity
    tcap: int
    dummy_enc: int
    num_clusters: int

    @property
    def block_rows(self) -> int:
        return 4 * self.tcap + 8


def _upper_node_tables(amin, amax, lf, cnt, is_cluster, cluster_of, tcap):
    """8-wide node gather tables for the upper tree (cluster roots are the
    leaves).  Mirrors kernels/wide.py::build_wide8_scene's node packing;
    enc leaf payload = cluster id."""
    m = amin.shape[0]
    ucnt = np.where(is_cluster, 1, 0).astype(np.int32)
    children, waxes = _collapse8(amin, amax, lf, ucnt)
    children = np.asarray(children, np.int32)
    nw = children.shape[0]
    num_wide = nw + 1  # + NaN dummy

    wide_of = np.full(m, -1, np.int32)
    order = children[children >= 0]
    internal_kids = order[ucnt[order] == 0]
    wide_of[0] = 0
    wide_of[internal_kids] = np.arange(1, len(internal_kids) + 1,
                                       dtype=np.int32)

    cb = 6 * m
    zero_pos = cb + 9 * num_wide
    nan_pos = zero_pos + 1
    nidx = np.full((num_wide, NODE8_STRIDE), zero_pos, np.int32)
    nidx[-1, 0:48] = nan_pos

    axes = np.arange(3, dtype=np.int32)
    enc = np.full((num_wide, WIDE8_CAP), 2.0 * nw, np.float32)
    present = children >= 0
    ck = np.where(present, children, 0)
    ptr = np.where(is_cluster[ck], cluster_of[ck], wide_of[ck])
    enc[:nw] = np.where(present, 2.0 * ptr + is_cluster[ck], 2.0 * nw)
    for k in range(WIDE8_CAP):
        col = np.where(present[:, k], ck[:, k], 0).astype(np.int32)
        bmin = 3 * col[:, None] + axes[None, :]
        bmax = 3 * m + 3 * col[:, None] + axes[None, :]
        pm = present[:, k: k + 1]
        nidx[:nw, 6 * k: 6 * k + 3] = np.where(pm, bmin, nan_pos)
        nidx[:nw, 6 * k + 3: 6 * k + 6] = np.where(pm, bmax, nan_pos)
        nidx[:nw, 48 + k] = cb + WIDE8_CAP * np.arange(nw, dtype=np.int32) + k
    nidx[:nw, 56] = cb + 8 * num_wide + np.arange(nw, dtype=np.int32)
    node_const = np.concatenate(
        [enc.reshape(-1), np.asarray(waxes, np.float32),
         np.float32([0.0, 0.0, np.nan])]
    )
    node_idx = _pack_idx(nidx, NODES8_PER_ROW, NODE8_STRIDE, zero_pos)
    return node_idx, node_const, nw


def build_cluster_scene(bvh: BVH, tris, _np=None,
                        tcap: int = TCAP_DEFAULT) -> ClusterScene:
    """Build the cluster layout from a binary BVH + slot-ordered triangles.

    Host work: cluster cut + upper-tree index tables (small).  The A-matrix
    blocks are materialized ON DEVICE by ``refresh_cluster_scene`` (pure
    reshapes/transposes over the triangle SoA already in HBM), the same
    pass refits reuse — so per-frame geometry updates never leave the TPU.
    """
    host = getattr(bvh, "host", None)
    if host is not None:
        amin, amax = host["aabb_min"], host["aabb_max"]
        lf, cnt = host["left_first"], host["count"]
    else:
        amin = np.asarray(bvh.aabb_min)
        amax = np.asarray(bvh.aabb_max)
        lf = np.asarray(bvh.left_first)
        cnt = np.asarray(bvh.count)
    m = amin.shape[0]

    if _np is not None:
        _, _, _, nrm, pid, lay = (np.asarray(a) for a in _np)
    else:
        nrm = np.asarray(tris.normal)
        pid = np.asarray(tris.prim_id)
        lay = np.asarray(tris.layers)
    t = int(pid.shape[0])

    roots, cfirst, ccnt = cluster_cut(lf, cnt, tcap)
    if ccnt.max(initial=0) > tcap:
        raise ValueError("cluster_cut produced an oversized cluster")
    C = len(roots)
    is_cluster = np.zeros(m, bool)
    is_cluster[roots] = True
    cluster_of = np.full(m, -1, np.int32)
    cluster_of[roots] = np.arange(C, dtype=np.int32)

    node_idx, node_const, nw = _upper_node_tables(
        amin, amax, lf, cnt, is_cluster, cluster_of, tcap
    )

    # padded slot tables: slot = c*tcap + k
    ks = np.arange(tcap, dtype=np.int64)[None, :]
    slots = np.clip(cfirst[:, None] + ks, 0, max(t - 1, 0))   # (C, T)
    valid = ks < ccnt[:, None]
    slot_map = np.where(valid, slots, 0).astype(np.int32).reshape(-1)
    slot_pid = np.where(valid, pid[slots], -1).astype(np.int32).reshape(-1)
    slot_lay = np.where(valid, lay[slots], 0).astype(np.int32).reshape(-1)

    skeleton = ClusterScene(
        nodes=jnp.zeros((1, 1), jnp.float32),      # materialized on device
        ablocks=jnp.zeros((1, 1), jnp.float32),
        slot_prim_id=jnp.asarray(slot_pid),
        slot_layers=jnp.asarray(slot_lay),
        slot_normal=jnp.zeros((1, 3), jnp.float32),
        slot_tri=jnp.asarray(slot_map),
        node_idx=jnp.asarray(node_idx),
        node_const=jnp.asarray(node_const),
        croots=jnp.asarray(roots.astype(np.int32)),
        slot_map=jnp.asarray(slot_map),
        cvalid=jnp.asarray(valid.reshape(-1)),
        tcap=tcap,
        dummy_enc=2 * nw,
        num_clusters=C,
    )
    return refresh_cluster_scene(skeleton, bvh, tris)


def _arrange_ablocks(rows16, anchors, counts, tcap):
    """Arrange per-cluster A rows into the lane-packed block layout.

    rows16:  (C, 4T, 16) f32 — A rows per cluster
    anchors: (C, 3) f32, counts: (C,) f32
    returns (G8*BR, 128) f32 with a trailing all-zero dummy cluster.
    """
    c = rows16.shape[0]
    br = 4 * tcap + 8
    g8 = -(-(c + 1) // 8)
    pad = g8 * 8 - c
    rows16 = jnp.concatenate(
        [rows16, jnp.zeros((pad, 4 * tcap, 16), jnp.float32)]
    )
    meta = jnp.zeros((c, 16), jnp.float32)
    meta = meta.at[:, 0:3].set(anchors).at[:, 3].set(counts)
    meta = jnp.concatenate([meta, jnp.zeros((pad, 16), jnp.float32)])
    # (G8, 8, 4T, 16) -> (G8, 4T, 8, 16) -> (G8, 4T, 128)
    body = rows16.reshape(g8, 8, 4 * tcap, 16).transpose(0, 2, 1, 3)
    body = body.reshape(g8, 4 * tcap, 128)
    mrow = meta.reshape(g8, 1, 128)
    zpad = jnp.zeros((g8, 7, 128), jnp.float32)
    return jnp.concatenate([body, mrow, zpad], axis=1).reshape(g8 * br, 128)


@jax.jit
def refresh_cluster_scene(cs: ClusterScene, bvh: BVH, tris) -> ClusterScene:
    """(Re)build nodes + A-blocks from current BVH/triangle data — fully on
    device, so refits never round-trip to host (scene_tlas.h:180-196)."""
    tcap, c = cs.tcap, cs.num_clusters
    node_src = jnp.concatenate(
        [bvh.aabb_min.reshape(-1), bvh.aabb_max.reshape(-1), cs.node_const]
    )
    nodes = node_src[cs.node_idx]

    anchors = 0.5 * (bvh.aabb_min[cs.croots] + bvh.aabb_max[cs.croots])
    vmask = cs.cvalid[:, None]
    v0 = jnp.where(vmask, tris.v0[cs.slot_map], 0.0).reshape(c, tcap, 3)
    e1 = jnp.where(vmask, tris.edge1[cs.slot_map], 0.0).reshape(c, tcap, 3)
    e2 = jnp.where(vmask, tris.edge2[cs.slot_map], 0.0).reshape(c, tcap, 3)
    v0c = v0 - anchors[:, None, :]
    n = jnp.cross(e1, e2)
    z = jnp.zeros((c, tcap, 1), jnp.float32)
    z3 = jnp.zeros((c, tcap, 3), jnp.float32)

    def row(a, b, cpart, dpart):
        # lanes [d(0:3) | m(3:6) | o(6:9) | 1(9) | pad]
        return jnp.concatenate(
            [a, b, cpart, dpart, jnp.zeros((c, tcap, 6), jnp.float32)],
            axis=-1,
        )

    det_r = row(-n, z3, z3, z)
    u_r = row(jnp.cross(v0c, e2), e2, z3, z)
    v_r = row(-jnp.cross(v0c, e1), -e1, z3, z)
    t_r = row(z3, z3, n, -jnp.sum(v0c * n, axis=-1, keepdims=True))
    rows16 = jnp.concatenate([det_r, u_r, v_r, t_r], axis=1)  # (C, 4T, 16)
    counts = jnp.sum(cs.cvalid.reshape(c, tcap), axis=1).astype(jnp.float32)
    ablocks = _arrange_ablocks(rows16, anchors, counts, tcap)

    slot_nrm = jnp.where(vmask, tris.normal[cs.slot_map], 0.0)
    return cs.replace(nodes=nodes, ablocks=ablocks, slot_normal=slot_nrm)


@functools.partial(jax.jit, static_argnames=("query_mask",))
def _mask_ablocks(cs: ClusterScene, query_mask: int) -> jnp.ndarray:
    """Zero the A rows of layer-masked slots so the dense MT rejects them
    (det = 0) — filter-during-traversal semantics (ray_scene.h:124)."""
    tcap, c = cs.tcap, cs.num_clusters
    ok = ((cs.slot_layers & query_mask) != 0).reshape(c, tcap)
    fac = jnp.broadcast_to(
        ok.astype(jnp.float32)[:, None, :, None], (c, 4, tcap, 16)
    ).reshape(c, 4 * tcap, 16)
    ones = jnp.ones((c,), jnp.float32)
    anchors1 = jnp.ones((c, 3), jnp.float32)
    factor = _arrange_ablocks(fac, anchors1, ones, tcap)
    return cs.ablocks * factor
