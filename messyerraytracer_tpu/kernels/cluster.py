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
    triangles as dense (T,1)x(1,128) broadcast arithmetic: the
    Moller-Trumbore numerators and determinant are bilinear in (ray
    Plucker coordinates [d, m=o'xd, o', 1]) x (16 precomputed per-
    triangle fields), so each quantity is a handful of full-width VPU
    ops over the (T, 128-ray) pair grid — no serial reductions, no
    scalar extracts, no per-4-tri batches.  This is the reference GPU's
    per-node child-batch testing (cwbvh_traverse.comp.glsl:260-323)
    recast as dense pair-grid phases.  (An MXU A@P formulation of the
    same bilinear forms was built and measured SLOWER: K=16 against the
    128-wide systolic array caps utilization at 12.5% and f32 emulation
    multiplies passes 3-6x — see PERF.md round-3 notes.)
  * Conditioning: the raw Plucker moment m = o x d amplifies rounding by
    |o| / |hit offset|.  Each cluster stores an anchor a (its AABB
    center); rays are re-anchored per visit at their closest approach to
    a (tau = d.(a - o), o' = o + tau d - a) and triangles are built with
    v0' = v0 - a, so all matmul operands are O(cluster size) and the
    recovered t = tau + t_local keeps ~1e-7 relative accuracy (verified
    against f64 ground truth; better than sequential f32 MT on far
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
    MT_BARY_EPS,
    MT_DET_EPS,
    NO_HIT,
    T_MAX_DEFAULT,
    Hits,
    Rays,
    RayStats,
)
from ..utils.struct import pytree_dataclass
from .wide import NODE8_STRIDE, NODES8_PER_ROW, WIDE8_CAP, _collapse8, _pack_idx

TCAP_DEFAULT = 64       # triangles per cluster (field-slab row count - 8)


def cluster_tcap_for(num_tris: int) -> int:
    """Density-routed cluster size (measured, PERF.md r3): T=32 wins at
    ~100K scenes (48.1 vs 45.6 Mrays/s — less dense-phase waste), T=64
    at 1M+ (T=32's upper tree doubles the pop count there)."""
    return 32 if num_tris <= 300_000 else 64
LOCAL_BITS = 13         # instanced enc payload: inst << 13 | local cluster
LOCAL_MASK = (1 << LOCAL_BITS) - 1   # => <= 8192 clusters/mesh, <= 1024 inst
QCAP = 16               # drain-queue ring depth = in-flight prefetch slots
KSTACK = 64             # upper-tree DFS stack floor (scenes size it up
#                         from their build-time worst case, _kstack_for)
MAX_ITERS = 1 << 20     # runaway guard (bvh_traverse.comp.glsl:158)
_BIG = 3.0e38

# ``probe=`` kernel modes intentionally CORRUPT results (timing probes
# that skip DMA waits / pushes / reductions).  They are gated off the
# public cast signature: tools/ profilers flip this module flag
# explicitly; anything else passing probe= raises (VERDICT r4 weak #7).
ALLOW_PROBES = False


def _check_probe(probe: str) -> None:
    if probe and not ALLOW_PROBES:
        raise ValueError(
            f"probe={probe!r} modes return intentionally corrupted hits "
            "and are for tools/ profiling only; set "
            "messyerraytracer_tpu.kernels.cluster.ALLOW_PROBES = True "
            "to acknowledge"
        )


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

@pytree_dataclass(meta_fields=("tcap", "dummy_enc", "num_clusters",
                               "stack_need"))
class ClusterScene:
    """Device arrays for the MXU cluster kernel.

    nodes      (NR, 128) f32 — upper-tree 8-wide rows, wide8 layout
               (kernels/wide.py): child boxes at 6k, enc at 48+k (leaf bit
               set => cluster id), sort axis at 56.
    ablocks    ((C+1)*BR, 128) f32 — per-cluster field slabs, one
               cluster per contiguous BR-row slab (BR = T + 8; each
               prefetch DMA is one contiguous 512*BR-byte read, 128-lane
               aligned as Mosaic DMA requires).  Cluster c, row k (tri
               k), lanes: [0:3]=-n, [3:6]=v0'xe2, [6:9]=e2,
               [9:12]=-(v0'xe1), [12:15]=-e1, [15]=-v0'.n  (v0' = v0
               relative to the cluster anchor; n = e1 x e2); lanes
               16/17/18 = prim id / layers lo 16 bits / layers hi 16
               bits as EXACT float integers (selected in kernel so the
               cast epilogue needs no XLA gathers).  Row T: lanes 0:3 =
               anchor, lane 3 = real-tri count (f32), lanes 4:10 =
               cluster AABB.  Rows T+1..T+6: AABB min/max pre-broadcast
               across lanes (vector operands for the drain row cull).
               The last slab is the all-zero dummy cluster.
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
    stack_need: int = KSTACK   # build-time worst-case DFS stack bound

    @property
    def block_rows(self) -> int:
        return self.tcap + 8


def _kstack_for(stack_need: int, popn: int = 1) -> int:
    """Static SMEM stack size for a cast: the scene's build-time
    worst-case DFS bound (``_wide_stack_need``) plus transient slack for
    multi-pop iterations (each extra pop can push up to WIDE8_CAP
    children before the next aliveness check), floored at the historical
    KSTACK so small scenes keep byte-identical scratch."""
    return max(KSTACK, int(stack_need) + WIDE8_CAP * max(popn - 1, 0) + 2)


def _wide_stack_need(children, internal_kid):
    """Worst-case transient DFS stack depth of the wide8 upper tree,
    counted the way the kernels push (all internal children of a popped
    node land on the stack before the next pop).

    ``children``: (nw, WIDE8_CAP) binary-node ids (-1 absent), row w =
    wide node w; ``internal_kid``: same-shape bool, True where the child
    is an internal wide node (row index = position of the child id in
    row-major order over internal kids, matching ``wide_of``).

    Bound: when wide node ``w`` is processed with ``d`` entries beneath
    it, the transient peak is ``d + k(w)``; each of its internal kids is
    later processed with at most ``d + k(w) - 1`` entries beneath (popped
    first, every sibling still stacked) — conservative over BOTH
    direction-sign push orders.  The reference never drops pushes either
    (tiny_bvh.h Intersect loops until the stack empties); sizing the
    kernel stack from this bound is the TPU equivalent (VERDICT r4 #1)."""
    import numpy as _n

    kid_rows = children[internal_kid]           # binary ids, row-major
    wide_row_of = {int(b): i + 1 for i, b in enumerate(kid_rows)}
    kcnt = internal_kid.sum(axis=1).astype(_n.int64)
    need = 1                                     # root entry at init
    work = [(0, 0)]
    while work:
        w, d = work.pop()
        k = int(kcnt[w])
        if d + k > need:
            need = d + k
        if k:
            row = children[w]
            for j in range(row.shape[0]):
                if internal_kid[w, j]:
                    work.append((wide_row_of[int(row[j])], d + k - 1))
    return int(need)


def _upper_node_tables(amin, amax, lf, cnt, is_cluster, cluster_of, tcap):
    """8-wide node gather tables for the upper tree (cluster roots are the
    leaves).  Mirrors kernels/wide.py::build_wide8_scene's node packing;
    enc leaf payload = cluster id.  Returns (node_idx, node_const, nw,
    stack_need) — stack_need is the build-time worst-case DFS stack bound
    used to size the kernel SMEM stack statically (VERDICT r4 #1)."""
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
    internal_kid = present & ~is_cluster[ck]
    stack_need = _wide_stack_need(children, internal_kid)
    return node_idx, node_const, nw, stack_need


def build_cluster_scene(bvh: BVH, tris, _np=None,
                        tcap: int = TCAP_DEFAULT,
                        host_arrange: bool = False) -> ClusterScene:
    """Build the cluster layout from a binary BVH + slot-ordered triangles.

    Host work: cluster cut + upper-tree index tables (small).  The A-matrix
    blocks are materialized ON DEVICE by ``refresh_cluster_scene`` (pure
    reshapes/transposes over the triangle SoA already in HBM), the same
    pass refits reuse — so per-frame geometry updates never leave the TPU.

    ``host_arrange=True`` (requires ``_np`` + a host-built BVH) arranges
    nodes/ablocks in numpy instead: zero XLA compiles.  Used by the
    instanced TLAS build, whose per-MESH slabs are small but whose mesh
    shapes would each trigger a fresh ~20 s remote compile of the device
    refresh (the round-3 83.9 s cold-build pathology, VERDICT r3 weak #4).
    The numpy ops mirror ``_refresh_cluster_jit`` exactly (same f32 IEEE
    mul/add/cross), so slabs are bit-identical either way.
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

    if pid.max(initial=0) >= (1 << 24):
        raise ValueError("prim ids >= 2^24 not exactly representable in "
                         "the cluster slab metadata lanes")
    roots, cfirst, ccnt = cluster_cut(lf, cnt, tcap)
    if ccnt.max(initial=0) > tcap:
        raise ValueError("cluster_cut produced an oversized cluster")
    C = len(roots)
    is_cluster = np.zeros(m, bool)
    is_cluster[roots] = True
    cluster_of = np.full(m, -1, np.int32)
    cluster_of[roots] = np.arange(C, dtype=np.int32)

    node_idx, node_const, nw, stack_need = _upper_node_tables(
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
        stack_need=stack_need,
    )
    if host_arrange:
        if host is None or _np is None:
            raise ValueError("host_arrange requires a host BVH and _np")
        return _host_refresh(skeleton, amin, amax, _np, roots,
                             slots, valid, slot_pid, slot_lay,
                             node_idx, node_const)
    return refresh_cluster_scene(skeleton, bvh, tris)


def _host_refresh(cs: ClusterScene, amin, amax, _np, roots,
                  slots, valid, slot_pid, slot_lay,
                  node_idx, node_const) -> ClusterScene:
    """Numpy mirror of ``_refresh_cluster_jit`` for the initial build
    (same f32 operations, bit-identical slabs, zero device compiles).

    slots/valid are the (C, T) padded slot tables from the cluster cut;
    _np = (v0, e1, e2, normal, prim_id, layers) in BVH slot order.
    node_idx/node_const are the HOST numpy gather tables (reading them
    back off cs costs two device->host transfers that measured 238 s
    EACH on the tunneled device — 696 s of the round-5 cold build).
    """
    tcap, c = cs.tcap, cs.num_clusters
    pv0, pe1, pe2, pnrm = (np.asarray(a, np.float32) for a in _np[:4])

    node_src = np.concatenate(
        [amin.astype(np.float32).reshape(-1),
         amax.astype(np.float32).reshape(-1),
         np.asarray(node_const, np.float32)]
    )
    nodes = node_src[np.asarray(node_idx)]

    anchors = (0.5 * (amin[roots] + amax[roots])).astype(np.float32)
    vmask = valid.reshape(c, tcap, 1)
    v0 = np.where(vmask, pv0[slots], 0.0).astype(np.float32)
    e1 = np.where(vmask, pe1[slots], 0.0).astype(np.float32)
    e2 = np.where(vmask, pe2[slots], 0.0).astype(np.float32)
    v0c = v0 - anchors[:, None, :]
    n = np.cross(e1, e2)
    pid_f = np.maximum(slot_pid, 0).astype(np.float32).reshape(c, tcap, 1)
    lay = slot_lay.astype(np.uint32)
    lay_lo = (lay & 0xFFFF).astype(np.float32).reshape(c, tcap, 1)
    lay_hi = (lay >> 16).astype(np.float32).reshape(c, tcap, 1)
    rows16 = np.concatenate(
        [-n, np.cross(v0c, e2), e2, -np.cross(v0c, e1), -e1,
         -np.sum(v0c * n, axis=-1, keepdims=True),
         pid_f, lay_lo, lay_hi], axis=-1,
    ).astype(np.float32)                          # (C, T, 19)
    counts = valid.reshape(c, tcap).sum(axis=1).astype(np.float32)
    cmin = amin[roots].astype(np.float32)
    cmax = amax[roots].astype(np.float32)

    br = tcap + 8
    slabs = np.zeros((c + 1, br, 128), np.float32)
    slabs[:c, :tcap, :rows16.shape[2]] = rows16
    meta = np.concatenate([anchors, counts[:, None], cmin, cmax], axis=1)
    slabs[:c, tcap, :meta.shape[1]] = meta
    slabs[:c, tcap + 1: tcap + 7, :] = np.concatenate(
        [cmin, cmax], axis=1)[:, :, None]
    ablocks = slabs.reshape((c + 1) * br, 128)

    slot_nrm = np.where(vmask.reshape(-1, 1), pnrm[slots.reshape(-1)],
                        0.0).astype(np.float32)
    return cs.replace(
        nodes=jnp.asarray(nodes),
        ablocks=jnp.asarray(ablocks),
        slot_normal=jnp.asarray(slot_nrm),
    )


def _arrange_ablocks(rows16, anchors, counts, tcap, cmin=None, cmax=None):
    """Arrange per-cluster triangle fields into the contiguous slab layout.

    rows16:  (C, T, 16) f32 — per-triangle field rows per cluster
    anchors: (C, 3) f32, counts: (C,) f32
    cmin/cmax: (C, 3) f32 cluster AABB (meta lanes 4:7 / 7:10)
    returns ((C+1)*BR, 128) f32 with a trailing all-zero dummy cluster.
    """
    c = rows16.shape[0]
    br = tcap + 8
    nf = rows16.shape[2]
    # Assemble via jnp.pad, NOT concat-with-zeros: XLA spends ~100 s in a
    # pathological pass on the zeros-concat formulation at 1M-tri shapes
    # (measured tools/prof_arrange_variants.py: 96 s -> 1.2 s compile).
    body = jnp.pad(rows16, ((0, 0), (0, 0), (0, 128 - nf)))
    if cmin is None:
        meta_sm = jnp.concatenate([anchors, counts[:, None]], axis=1)
        bc = jnp.ones((c, 6, 128), jnp.float32)    # mask-factor identity
    else:
        meta_sm = jnp.concatenate(
            [anchors, counts[:, None], cmin, cmax], axis=1
        )
        # rows T+1..T+6: cluster AABB min/max pre-broadcast across lanes
        # so the drain's row-cull slab test reads (1,128) vector operands
        # with zero scalar extracts
        bc = jnp.broadcast_to(
            jnp.concatenate([cmin, cmax], axis=1)[:, :, None], (c, 6, 128)
        )
    meta = jnp.pad(meta_sm, ((0, 0), (0, 128 - meta_sm.shape[1])))
    meta = meta[:, None, :]
    zpad = jnp.zeros((c, 1, 128), jnp.float32)
    slabs = jnp.concatenate([body, meta, bc, zpad], axis=1)  # (C, BR, 128)
    slabs = slabs.reshape(c * br, 128)
    return jnp.pad(slabs, ((0, br), (0, 0)))               # dummy cluster


def refresh_cluster_scene(cs: ClusterScene, bvh: BVH, tris) -> ClusterScene:
    """(Re)build nodes + A-blocks from current BVH/triangle data — fully on
    device, so refits never round-trip to host (scene_tlas.h:180-196).

    The incoming nodes/ablocks are replaced wholesale; stripping them to
    placeholder shapes before the jit keeps ONE cache entry for both the
    initial build (skeleton cs) and later refits (full cs)."""
    z = jnp.zeros((1, 1), jnp.float32)
    return _refresh_cluster_jit(cs.replace(nodes=z, ablocks=z), bvh, tris)


@jax.jit
def _refresh_cluster_jit(cs: ClusterScene, bvh: BVH, tris) -> ClusterScene:
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
    # Metadata lanes as EXACT float integers (bitcast storage is unsafe:
    # XLA flushes subnormals / canonicalizes NaNs on some paths).  prim
    # ids are exact in f32 up to 2^24 (guarded in build_cluster_scene);
    # 32-bit layer masks split into two 16-bit halves.
    pid_f = jnp.maximum(cs.slot_prim_id, 0).astype(jnp.float32)
    lay = cs.slot_layers.astype(jnp.uint32)
    lay_lo = (lay & 0xFFFF).astype(jnp.float32)
    lay_hi = jax.lax.shift_right_logical(
        lay, jnp.uint32(16)).astype(jnp.float32)
    rows16 = jnp.concatenate(
        [-n, jnp.cross(v0c, e2), e2, -jnp.cross(v0c, e1), -e1,
         -jnp.sum(v0c * n, axis=-1, keepdims=True),
         pid_f.reshape(c, tcap, 1), lay_lo.reshape(c, tcap, 1),
         lay_hi.reshape(c, tcap, 1)],   # lanes 16..18
        axis=-1,
    )  # (C, T, 19)
    counts = jnp.sum(cs.cvalid.reshape(c, tcap), axis=1).astype(jnp.float32)
    ablocks = _arrange_ablocks(
        rows16, anchors, counts, tcap,
        cmin=bvh.aabb_min[cs.croots], cmax=bvh.aabb_max[cs.croots],
    )

    slot_nrm = jnp.where(vmask, tris.normal[cs.slot_map], 0.0)
    return cs.replace(nodes=nodes, ablocks=ablocks, slot_normal=slot_nrm)


@functools.partial(jax.jit, static_argnames=("query_mask",))
def _mask_ablocks(cs: ClusterScene, query_mask: int) -> jnp.ndarray:
    """Zero the A rows of layer-masked slots so the dense MT rejects them
    (det = 0) — filter-during-traversal semantics (ray_scene.h:124)."""
    tcap, c = cs.tcap, cs.num_clusters
    ok = ((cs.slot_layers & query_mask) != 0).reshape(c, tcap)
    fac = jnp.concatenate(
        [jnp.broadcast_to(ok.astype(jnp.float32)[:, :, None],
                          (c, tcap, 16)),
         jnp.ones((c, tcap, 3), jnp.float32)],   # pid/lay lanes keep
        axis=2,
    )
    ones = jnp.ones((c,), jnp.float32)
    anchors1 = jnp.ones((c, 3), jnp.float32)
    factor = _arrange_ablocks(fac, anchors1, ones, tcap,
                              cmin=anchors1, cmax=anchors1)
    return cs.ablocks * factor


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _cluster_kernel(
    *refs,
    any_hit: bool, dummy_enc: int, srows: int, tcap: int,
    num_tiles: int, qd: int, inner: int = 1, n_inst: int = 0,
    gr: int = 4, probe: str = "", kstack: int = KSTACK,
):
    # refs (in order): rays_hbm (TILES*8*srows,128) f32 field-major/tile;
    # nodes_hbm upper tree (VMEM-staged); ablk_hbm field slabs (HBM);
    # [instanced: islab (1,Ni) i32 slab row base per instance, iinv
    # (Ni,16) f32 inverse transforms, both SMEM]; outputs fout/iout/pops;
    # scratch ray_buf/fbuf/ibuf/stack/queue/nodes/qland/sems.
    if n_inst:
        (rays_hbm, nodes_hbm, ablk_hbm, islab, iinv, ifwd,
         fout_hbm, iout_hbm, pops_out,
         ray_buf, fbuf, ibuf, stack_ref, queue_ref, qmask_ref, nodes_ref,
         qland, colbc_ref, sems) = refs
    else:
        (rays_hbm, nodes_hbm, ablk_hbm,
         fout_hbm, iout_hbm, pops_out,
         ray_buf, fbuf, ibuf, stack_ref, queue_ref, qmask_ref, nodes_ref,
         qland, colbc_ref, sems) = refs
        islab = iinv = ifwd = None
    """Packet traversal of the (small) upper tree + dense MXU cluster
    drains, single invocation over all ray tiles.

    Pipeline: the drain queue IS the prefetch pipeline — a cluster's
    A-block DMA starts the moment the pop pushes it, and its drain (>= 1
    iteration later, usually several) waits the per-slot semaphore.  Ray
    tiles and result tiles double-buffer through HBM like the packet
    megakernel (traverse_pallas.py::_mega_kernel).
    """
    npr = NODES8_PER_ROW
    nstride = NODE8_STRIDE
    rrows = 8 * srows
    frows = 6 * srows    # t, u, v, -nx, -ny, -nz
    irows = 4 * srows    # prim_id, layers, tri_tests, instance
    br = tcap + 8
    dummy_node = dummy_enc >> 1
    qmask = QCAP - 1

    def _ray_in(g, pb):
        return pltpu.make_async_copy(
            rays_hbm.at[pl.ds(g * rrows, rrows), :],
            ray_buf.at[pl.ds(pb * rrows, rrows), :], sems.at[2 + pb],
        )

    def _f_out(g, pb):
        return pltpu.make_async_copy(
            fbuf.at[pl.ds(pb * frows, frows), :],
            fout_hbm.at[pl.ds(g * frows, frows), :], sems.at[4 + pb],
        )

    def _i_out(g, pb):
        return pltpu.make_async_copy(
            ibuf.at[pl.ds(pb * irows, irows), :],
            iout_hbm.at[pl.ds(g * irows, irows), :], sems.at[6 + pb],
        )

    def _ablk_copy(c, slot):
        # one contiguous 512*BR-byte slab per cluster.  Instanced mode:
        # c is a gid (inst << LOCAL_BITS | local); slabs are per-MESH and
        # shared by every instance of the mesh (memory ~ meshes, the
        # SceneTLAS contract, scene_tlas.h:203-251)
        if n_inst:
            srow = (islab[0, jax.lax.shift_right_logical(c, LOCAL_BITS)]
                    + (c & LOCAL_MASK) * br)
        else:
            srow = c * br
        return pltpu.make_async_copy(
            ablk_hbm.at[pl.ds(srow, br), :],
            qland.at[pl.ds(slot * br, br), :], sems.at[8 + slot],
        )

    c1 = pltpu.make_async_copy(nodes_hbm, nodes_ref, sems.at[0])
    c1.start()
    _ray_in(0, 0).start()
    c1.wait()

    def safe_inv(x):
        small = jnp.abs(x) < INV_DIR_EPS
        sign = jnp.where(x < 0.0, -1.0, 1.0)
        return jnp.where(small, sign / INV_DIR_EPS,
                         1.0 / jnp.where(small, 1.0, x))

    def group_body(g, pops_total):
        pb = g & 1
        _ray_in(g, pb).wait()

        @pl.when(g + 1 < num_tiles)
        def _():
            _ray_in(g + 1, 1 - pb).start()

        base = pb * rrows
        O = tuple(ray_buf[pl.ds(base + f * srows, srows), :]
                  for f in range(3))
        D = tuple(ray_buf[pl.ds(base + (3 + f) * srows, srows), :]
                  for f in range(3))
        INV = tuple(safe_inv(x) for x in D)
        TMIN = ray_buf[pl.ds(base + 6 * srows, srows), :]
        TMAX = ray_buf[pl.ds(base + 7 * srows, srows), :]
        # Front-to-back consensus over VALID rays only: padding rays
        # (t_max < t_min) carry a fixed +z direction that would bias the
        # child ordering of ragged tiles toward worse drain order.
        LIVE = TMAX >= TMIN
        SGN = tuple(jnp.sum(jnp.where(LIVE, D[a], 0.0)) >= 0.0
                    for a in range(3))
        stack_ref[0, 0] = jnp.int32(0)   # root node index

        def drain_one(li, slot_idx, st, real=None, rowmask_in=None):
            """Dense intersection of the whole tile vs cluster ``li``
            whose field slab was prefetched into queue slot ``slot_idx``.

            Carried per-ray state stays as (srows,128) arrays — the
            loop/cond machinery repackages every carried leaf per
            iteration, and many small row arrays measured ~5x the
            per-iteration overhead of few big ones.  Rows are read by
            slicing and rebuilt by one concatenate per quantity at drain
            end (Mosaic has no dynamic_update_slice on values).

            All hit metadata (prim id, layer bits, unnormalized normal,
            instance id) is selected IN KERNEL by single-hot sum-selects
            over the winning triangle row, so the cast needs NO per-ray
            XLA gathers afterwards (those gathers measured ~30 ms of the
            ~49 ms 99K-tri frame — the dominant cost of the whole cast).
            """
            (cap, best, uu, vv, tt, nx, ny, nz, pid, lay, ii) = st

            def rows(a):
                return [a[i:i + 1, :] for i in range(srows)]

            best, uu, vv, tt = rows(best), rows(uu), rows(vv), rows(tt)
            nx, ny, nz = rows(nx), rows(ny), rows(nz)
            pid, lay, ii = rows(pid), rows(lay), rows(ii)

            def repack(capv):
                def cc(xs):
                    return jnp.concatenate(xs, axis=0)
                return (capv, cc(best), cc(uu), cc(vv), cc(tt),
                        cc(nx), cc(ny), cc(nz), cc(pid), cc(lay), cc(ii))

            if probe == "notouch":
                # timing probe: skip the DMA wait AND the slab read
                # (garbage results; isolates queue/cond/loop overhead.
                # The unbalanced semaphores make this probe single-use.)
                tt = [x + 1 for x in tt]
                return repack(cap)
            if probe in ("nodma", "nopush", "spin", "noqueue", "noout"):
                pass  # timing probe: DMA never started (garbage slab data)
            elif real is None:
                _ablk_copy(li, slot_idx).wait()
            else:
                @pl.when(real)
                def _():
                    _ablk_copy(li, slot_idx).wait()
            ab = qland[pl.ds(slot_idx * br, tcap), :]   # (T, 128)
            mrot = qland[pl.ds(slot_idx * br + tcap, 1), :]
            ax, ay, az = mrot[0, 0], mrot[0, 1], mrot[0, 2]
            cnt = mrot[0, 3]

            if probe == "nodrain":
                tt = [x + cnt.astype(jnp.int32) for x in tt]
                return repack(cap)

            if n_inst:
                # object-space ray transform ONCE per drain over the
                # full (srows,128) tile: M^-1 = [R|t] row-major from
                # SMEM; direction NOT renormalized so t stays
                # world-parameterized (blas_instance.h:48-59)
                inst = jax.lax.shift_right_logical(li, LOCAL_BITS)
                mm = [iinv[inst, j] for j in range(12)]
                OO = (mm[0] * O[0] + mm[1] * O[1] + mm[2] * O[2] + mm[3],
                      mm[4] * O[0] + mm[5] * O[1] + mm[6] * O[2] + mm[7],
                      mm[8] * O[0] + mm[9] * O[1] + mm[10] * O[2] + mm[11])
                DD = (mm[0] * D[0] + mm[1] * D[1] + mm[2] * D[2],
                      mm[4] * D[0] + mm[5] * D[1] + mm[6] * D[2],
                      mm[8] * D[0] + mm[9] * D[1] + mm[10] * D[2])
                DINV = tuple(safe_inv(x) for x in DD)
                # |d'| != 1 under scaling: closest-approach tau needs
                # /|d'|^2 (any tau is CORRECT — t = tau + t_local is an
                # identity — this keeps conditioning optimal)
                IDD = 1.0 / (DD[0] * DD[0] + DD[1] * DD[1]
                             + DD[2] * DD[2])
            else:
                OO, DD, DINV = O, D, INV
                IDD = None  # unit directions

            # Per-ray-row cull.  srows <= 16 (production tiles): the pop
            # already slab-tested this cluster's AABB per row — its
            # packed row bitmask rode the queue, so the drain does NO
            # geometry retest (push-time cap instead of drain-time cap:
            # strictly more rows may run, never fewer — parity safe).
            # Wider tiles recompute the mask from the pre-broadcast AABB
            # rows T+1..T+6 of the slab.
            if srows <= 16 and rowmask_in is not None:
                rowmask = rowmask_in
            else:
                bcr = slot_idx * br + tcap + 1
                cbx = qland[pl.ds(bcr, 1), :]
                cby = qland[pl.ds(bcr + 1, 1), :]
                cbz = qland[pl.ds(bcr + 2, 1), :]
                cBx = qland[pl.ds(bcr + 3, 1), :]
                cBy = qland[pl.ds(bcr + 4, 1), :]
                cBz = qland[pl.ds(bcr + 5, 1), :]
                t1 = (cbx - OO[0]) * DINV[0]
                t2 = (cBx - OO[0]) * DINV[0]
                rn = jnp.minimum(t1, t2)
                rf = jnp.maximum(t1, t2)
                t1 = (cby - OO[1]) * DINV[1]
                t2 = (cBy - OO[1]) * DINV[1]
                rn = jnp.maximum(rn, jnp.minimum(t1, t2))
                rf = jnp.minimum(rf, jnp.maximum(t1, t2))
                t1 = (cbz - OO[2]) * DINV[2]
                t2 = (cBz - OO[2]) * DINV[2]
                rn = jnp.maximum(rn, jnp.minimum(t1, t2))
                rf = jnp.minimum(rf, jnp.maximum(t1, t2))
                # cap is world-t; rn/rf are world-parameterized too (the
                # object direction is NOT renormalized)
                rhit = (rf >= jnp.maximum(rn, 0.0)) & (rn <= cap)
                rowany = jnp.max(rhit.astype(jnp.int32), axis=1,
                                 keepdims=True)           # (srows,1)
                wbit = jax.lax.broadcasted_iota(
                    jnp.int32, (srows, 1), 0)
                rowmask = jnp.sum(rowany << wbit)         # ONE reduction

            # (T,1) field columns; every bilinear form below is a lane-
            # broadcast (T,1)x(1,128) op over the full pair grid
            def colf(c):
                return ab[:, c:c + 1]

            nnx, nny, nnz = colf(0), colf(1), colf(2)     # -n
            c2x, c2y, c2z = colf(3), colf(4), colf(5)     # v0' x e2
            e2x, e2y, e2z = colf(6), colf(7), colf(8)     # e2
            c1x, c1y, c1z = colf(9), colf(10), colf(11)   # -(v0' x e1)
            e1x, e1y, e1z = colf(12), colf(13), colf(14)  # -e1
            tw = colf(15)                                 # -v0'.n
            ks = jax.lax.broadcasted_iota(jnp.int32, (tcap, 128), 0)

            def row_phase(i, rst):
                    (bestr, uur, vvr, ttr, nxr, nyr, nzr, pidr, layr,
                     iir) = rst
                    oxr = OO[0][i:i + 1, :]
                    oyr = OO[1][i:i + 1, :]
                    ozr = OO[2][i:i + 1, :]
                    dxr = DD[0][i:i + 1, :]
                    dyr = DD[1][i:i + 1, :]
                    dzr = DD[2][i:i + 1, :]
                    invdd = 1.0 if IDD is None else IDD[i:i + 1, :]
                    # re-anchor at closest approach to the cluster
                    # anchor: tau = d.(a-o)/|d|^2; o' = o + tau d - a
                    # (keeps every operand O(cluster size) — see module
                    # docstring)
                    tau = (dxr * (ax - oxr) + dyr * (ay - oyr)
                           + dzr * (az - ozr)) * invdd
                    ocx = oxr + tau * dxr - ax
                    ocy = oyr + tau * dyr - ay
                    ocz = ozr + tau * dzr - az
                    mx = ocy * dzr - ocz * dyr
                    my = ocz * dxr - ocx * dzr
                    mz = ocx * dyr - ocy * dxr
                    det = nnx * dxr + nny * dyr + nnz * dzr
                    un = (c2x * dxr + c2y * dyr + c2z * dzr
                          + e2x * mx + e2y * my + e2z * mz)
                    vn = (c1x * dxr + c1y * dyr + c1z * dzr
                          + e1x * mx + e1y * my + e1z * mz)
                    # t_num = (o'-v0').n = -(o'.(-n)) - v0'.n
                    tn = -(nnx * ocx + nny * ocy + nnz * ocz) + tw
                    ok = jnp.abs(det) >= MT_DET_EPS
                    idet = 1.0 / jnp.where(ok, det, 1.0)
                    u = un * idet
                    v = vn * idet
                    t = tn * idet + tau
                    # -MT_BARY_EPS: watertight shared edges for the
                    # anchored formulation (core/types.py::MT_BARY_EPS)
                    valid = (
                        ok
                        & (u >= -MT_BARY_EPS) & (u <= 1.0 + MT_BARY_EPS)
                        & (v >= -MT_BARY_EPS)
                        & (u + v <= 1.0 + MT_BARY_EPS)
                        & (t >= TMIN[i:i + 1, :]) & (t <= TMAX[i:i + 1, :])
                        & (t < bestr)
                    )
                    if probe == "noredux":
                        # fold validity into best so nothing is DCE'd,
                        # skip the min/index reductions (timing probe)
                        bestr = jnp.minimum(
                            bestr,
                            jnp.max(jnp.where(valid, t, _BIG), axis=0,
                                    keepdims=True),
                        )
                        return (bestr, uur, vvr,
                                ttr + cnt.astype(jnp.int32),
                                nxr, nyr, nzr, pidr, layr, iir)
                    score = jnp.where(valid, t, _BIG)
                    tb = jnp.min(score, axis=0, keepdims=True)  # (1,128)
                    better = tb < bestr
                    # (Gating the selects below behind a "did any lane
                    # improve" cond measured a 1.55x REGRESSION — the
                    # gate's own vector->scalar reduction serializes the
                    # drain's issue stream; see PERF.md round-3.)
                    sel = (score == tb) & valid
                    kb = jnp.min(jnp.where(sel, ks, tcap), axis=0,
                                 keepdims=True)
                    selk = sel & (ks == kb)
                    ub = jnp.max(jnp.where(selk, u, -_BIG), axis=0,
                                 keepdims=True)
                    vb = jnp.max(jnp.where(selk, v, -_BIG), axis=0,
                                 keepdims=True)
                    # Single-hot metadata selects: selk has at most
                    # one true row per lane, so a masked SUM returns the
                    # winner's value exactly — works for f32 fields and
                    # exact float-integer lanes.
                    def sel_f(col):
                        return jnp.sum(jnp.where(selk, col, 0.0), axis=0,
                                       keepdims=True)

                    nxb = sel_f(nnx)          # -n of winner (unnormalized)
                    nyb = sel_f(nny)
                    nzb = sel_f(nnz)
                    pidb = sel_f(colf(16)).astype(jnp.int32)
                    layb = (sel_f(colf(17)).astype(jnp.int32)
                            | (sel_f(colf(18)).astype(jnp.int32) << 16))
                    if n_inst:
                        # object->world normal via the inverse-transpose
                        # basis from SMEM (blas_instance.h:62-70)
                        fw = [ifwd[inst, j] for j in range(9)]
                        nxb, nyb, nzb = (
                            fw[0] * nxb + fw[1] * nyb + fw[2] * nzb,
                            fw[3] * nxb + fw[4] * nyb + fw[5] * nzb,
                            fw[6] * nxb + fw[7] * nyb + fw[8] * nzb,
                        )
                        iib = jnp.where(better, inst.astype(jnp.int32),
                                        iir)
                    else:
                        iib = iir
                    return (
                        jnp.where(better, tb, bestr),
                        jnp.where(better, ub, uur),
                        jnp.where(better, vb, vvr),
                        ttr + cnt.astype(jnp.int32),
                        jnp.where(better, nxb, nxr),
                        jnp.where(better, nyb, nyr),
                        jnp.where(better, nzb, nzr),
                        jnp.where(better, pidb, pidr),
                        jnp.where(better, layb, layr),
                        iib,
                    )

            # Dense phases in groups of ``gr`` ray rows behind ONE cond
            # each: per-row conds cost ~as much executed-false as taken
            # (the branch+merge dominates), so coarser groups keep the
            # skip benefit where whole spans of the tile miss the
            # cluster.  At sub-pixel triangle density (1M+) clusters
            # touch 1-2 rows and finer groups win — sweepable knob.
            GR = gr
            NF = 10
            for g0 in range(0, srows, GR):
                hi_r = min(g0 + GR, srows)
                gmask = (1 << (hi_r - g0)) - 1
                gbit = (jax.lax.shift_right_logical(rowmask, g0)
                        & gmask) > 0

                def do_grp(gst, g0=g0, hi_r=hi_r):
                    out = []
                    for idx, i in enumerate(range(g0, hi_r)):
                        out.extend(
                            row_phase(i, gst[idx * NF: idx * NF + NF])
                        )
                    return tuple(out)

                gin = tuple(x for i in range(g0, hi_r)
                            for x in (best[i], uu[i], vv[i], tt[i],
                                      nx[i], ny[i], nz[i], pid[i],
                                      lay[i], ii[i]))
                gout = jax.lax.cond(gbit, do_grp, lambda s: s, gin)
                for idx, i in enumerate(range(g0, hi_r)):
                    (best[i], uu[i], vv[i], tt[i], nx[i], ny[i], nz[i],
                     pid[i], lay[i],
                     ii[i]) = gout[idx * NF: idx * NF + NF]
            bestc = jnp.concatenate(best, axis=0)
            best = rows(bestc)
            # dead lanes keep cap = -_BIG (see init): min(best, TMAX)
            # would raise them back to -1, re-opening enclosing-box hits
            return repack(jnp.where(LIVE, jnp.minimum(bestc, TMAX),
                                    -_BIG))

        def step_fn(st):
            (sp, qh, qt, cap, best, uu, vv, tt, nx, ny, nz, pid, lay,
             ii, pops, iters) = st
            iters = iters + 1
            # ---- drain up to qd prefetched clusters ---------------------
            qlen = qt - qh
            for j in range(qd):  # qd=0 compiles the drains out entirely
                li = queue_ref[0, (qh + j) & qmask]
                qm = (qmask_ref[0, (qh + j) & qmask] if srows <= 16
                      else None)
                st11 = (cap, best, uu, vv, tt, nx, ny, nz, pid, lay, ii)
                if probe == "nocond":
                    # timing probe: drain unconditionally (garbage data on
                    # empty queue — wrong results, isolates cond cost)
                    st11 = drain_one(li, (qh + j) & qmask, st11,
                                     real=j < qlen, rowmask_in=qm)
                else:
                    st11 = jax.lax.cond(
                        j < qlen,
                        functools.partial(drain_one, li, (qh + j) & qmask,
                                          rowmask_in=qm),
                        lambda s: s, st11,
                    )
                (cap, best, uu, vv, tt, nx, ny, nz, pid, lay, ii) = st11
            qh = qh + jnp.minimum(qlen, qd)

            # ---- one upper-tree pop (branch-free dummy fallback) --------
            room = (qt - qh) <= QCAP - WIDE8_CAP
            active = (sp > 0) & room
            nidx = jnp.where(active, stack_ref[0, jnp.maximum(sp - 1, 0)],
                             jnp.int32(dummy_node))
            sp = jnp.where(active, sp - 1, sp)
            pops = pops + active.astype(jnp.int32)
            # Columnar node fetch: fields run down lane nidx&127 of
            # block nidx>>7; one roll + ONE lane broadcast staged
            # through VMEM scratch makes every box field a (1,128)
            # vector operand — no per-field vector->scalar extracts
            # (the measured dominant pop cost; traverse_pallas.py
            # columnar mode, PERF.md round-2).
            block = nodes_ref[nidx >> 7]
            rot = pltpu.roll(block, -(nidx & 127), axis=1)
            colbc_ref[0:nstride, :] = jnp.broadcast_to(
                rot[:, 0:1], (nstride, 128)
            )

            def vget(k):
                return colbc_ref[k:k + 1, :]

            def slab_hit(b0):
                lox, hix = vget(b0), vget(b0 + 3)
                loy, hiy = vget(b0 + 1), vget(b0 + 4)
                loz, hiz = vget(b0 + 2), vget(b0 + 5)
                t1 = (lox - O[0]) * INV[0]
                t2 = (hix - O[0]) * INV[0]
                tn_ = jnp.minimum(t1, t2)
                tf = jnp.maximum(t1, t2)
                t1 = (loy - O[1]) * INV[1]
                t2 = (hiy - O[1]) * INV[1]
                tn_ = jnp.maximum(tn_, jnp.minimum(t1, t2))
                tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                t1 = (loz - O[2]) * INV[2]
                t2 = (hiz - O[2]) * INV[2]
                tn_ = jnp.maximum(tn_, jnp.minimum(t1, t2))
                tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                return (tf >= jnp.maximum(tn_, 0.0)) & (tn_ <= cap)

            if srows <= 16:
                # 8 child tests -> per-child ROW bitmasks packed two
                # children per int32 (4 packed scalar reductions).  The
                # masks ride the queue so drains skip the cluster-AABB
                # retest entirely (its ~27 vector ops + 1 reduction were
                # a measured chunk of the drain's fixed cost, PERF.md
                # r3); anyk falls out of the mask for free.  Bit
                # (16*half + r) is set by exactly one (row, child), so
                # int32 wraparound at bit 31 is harmless.
                rowbit = jax.lax.broadcasted_iota(
                    jnp.int32, (srows, 1), 0)
                packed = []
                for pair in range(WIDE8_CAP // 2):
                    a = slab_hit(6 * (2 * pair))
                    b = slab_hit(6 * (2 * pair + 1))
                    acc = (jnp.max(a.astype(jnp.int32), axis=1,
                                   keepdims=True) << rowbit)
                    acc = acc + (jnp.max(b.astype(jnp.int32), axis=1,
                                         keepdims=True)
                                 << (rowbit + 16))
                    packed.append(jnp.sum(acc))
                rowmasks = [
                    jax.lax.shift_right_logical(
                        packed[k // 2], 16 * (k % 2)) & 0xFFFF
                    for k in range(WIDE8_CAP)
                ]
                anyk = [rm > 0 for rm in rowmasks]
            else:
                # wide tiles: masks don't fit an int32 half; keep the
                # two packed any-reductions (CWBVH two-4-child-batch
                # move, cwbvh_traverse.comp.glsl:260-323) and let the
                # drain compute its own row cull
                lo = hi = None
                for k in range(WIDE8_CAP):
                    hk = slab_hit(6 * k)
                    col = jnp.max(hk.astype(jnp.int32), axis=0,
                                  keepdims=True)
                    term = col * (1 << (8 * (k % 4)))
                    if k < 4:
                        lo = term if lo is None else lo + term
                    else:
                        hi = term if hi is None else hi + term
                m_lo = jnp.sum(lo)
                m_hi = jnp.sum(hi)
                anyk = [
                    (jax.lax.shift_right_logical(
                        m_lo if k < 4 else m_hi, 8 * (k % 4)) & 255) > 0
                    for k in range(WIDE8_CAP)
                ]
                rowmasks = [jnp.int32(0)] * WIDE8_CAP
            encs = [rot[48 + k, 0].astype(jnp.int32)
                    for k in range(WIDE8_CAP)]
            axis = rot[56, 0].astype(jnp.int32)
            fwd = jnp.where(
                axis == 0, SGN[0], jnp.where(axis == 1, SGN[1], SGN[2])
            )
            order = tuple(
                (jnp.where(fwd, encs[j], encs[WIDE8_CAP - 1 - j]),
                 jnp.where(fwd, anyk[j], anyk[WIDE8_CAP - 1 - j]),
                 jnp.where(fwd, rowmasks[j], rowmasks[WIDE8_CAP - 1 - j]))
                for j in range(WIDE8_CAP - 1, -1, -1)
            )

            # Route children: clusters -> queue (+ START their A-block
            # DMA), internals -> stack.  Untaken writes land in the
            # sacrificial lane (queue QCAP / stack KSTACK).
            for e_j, h_j, rm_j in order:
                isleaf = (e_j & 1) == 1
                tgt = jax.lax.shift_right_logical(e_j, 1)
                wq = h_j & isleaf
                if probe in ("nopush", "spin", "noqueue", "noout"):
                    wq = wq & (qt < 0)  # never true: pure pop-loop probe
                if probe != "noqueue":
                    queue_ref[0, jnp.where(wq, qt & qmask, QCAP)] = tgt
                    if srows <= 16:
                        qmask_ref[0, jnp.where(wq, qt & qmask, QCAP)] = rm_j

                if probe not in ("nodma", "nopush", "spin", "noqueue",
                                 "noout"):
                    @pl.when(wq)
                    def _(tgt=tgt, qt=qt):
                        _ablk_copy(tgt, qt & qmask).start()

                qt = qt + wq.astype(jnp.int32)
                # kstack is sized from the build-time worst case
                # (ClusterScene.stack_need), so this guard never fires
                ws = h_j & jnp.logical_not(isleaf) & (sp < kstack)
                stack_ref[0, jnp.where(ws, sp, kstack)] = tgt
                sp = sp + ws.astype(jnp.int32)
            return (sp, qh, qt, cap, best, uu, vv, tt, nx, ny, nz, pid,
                    lay, ii, pops, iters)

        shape = (srows, 128)
        init = (
            jnp.int32(1), jnp.int32(0), jnp.int32(0),
            # cap: DEAD lanes (tmax < tmin) get -_BIG, not raw tmax —
            # ``tn <= cap`` with cap = -1 still passes for boxes
            # enclosing the stale origin, so dead rays would traverse
            # the whole tree (measured 78 ms for a 307K wave with 8K
            # live rays, PERF.md r4)
            jnp.where(LIVE,
                      jnp.minimum(jnp.full(shape, _BIG, jnp.float32),
                                  TMAX), -_BIG),
            jnp.full(shape, _BIG, jnp.float32),                     # best
            jnp.zeros(shape, jnp.float32),                          # u
            jnp.zeros(shape, jnp.float32),                          # v
            jnp.zeros(shape, jnp.int32),                            # tt
            jnp.zeros(shape, jnp.float32),                          # -n x
            jnp.zeros(shape, jnp.float32),                          # -n y
            jnp.zeros(shape, jnp.float32),                          # -n z
            jnp.full(shape, -1, jnp.int32),                         # pid
            jnp.zeros(shape, jnp.int32),                            # lay
            jnp.full(shape, -1, jnp.int32),                         # inst
            jnp.int32(0),
            jnp.int32(0),
        )

        def cond(c):
            st, done = c
            if probe == "spin":
                return st[10] < 20000   # timing probe: fixed trip count
            alive = ((st[0] > 0) | (st[2] > st[1])) & (st[15] < MAX_ITERS)
            if any_hit:
                alive = alive & jnp.logical_not(done)
            return alive

        # A data-dependent while-condition serializes the scalar unit's
        # run-ahead: every trip exposes the full reduction->scalar->
        # branch latency (~5 us measured; with an independent counter
        # the same body runs at ~0.9 us).  Amortize it: run INNER
        # iterations per aliveness check — the body is dummy-safe by
        # design (empty stack pops the NaN dummy node, empty queue
        # drains nothing), so overshoot iterations are cheap no-ops.
        def body(c):
            st, done = c
            st = jax.lax.fori_loop(
                0, inner, lambda _, s: step_fn(s), st, unroll=True
            )
            if any_hit:
                done = jnp.min(st[11]) >= 0
            return (st, done)

        st, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(False)))
        (sp, qh, qt, cap, best, uu, vv, tt, nx, ny, nz, pid, lay, ii,
         pops, iters) = st

        if any_hit:
            # early exit can abandon queued prefetches; balance their sems
            def clean(j, qh_c):
                @pl.when(qh_c < qt)
                def _():
                    li = queue_ref[0, qh_c & qmask]
                    _ablk_copy(li, qh_c & qmask).wait()
                return qh_c + 1

            jax.lax.fori_loop(0, QCAP, clean, qh)

        if probe != "noout":
            @pl.when(g >= 2)
            def _():
                _f_out(g - 2, pb).wait()
                _i_out(g - 2, pb).wait()

            found = pid >= 0
            fb = pb * frows
            ib = pb * irows
            fbuf[pl.ds(fb, srows), :] = jnp.where(found, best,
                                                  T_MAX_DEFAULT)
            fbuf[pl.ds(fb + srows, srows), :] = jnp.where(found, uu, 0.0)
            fbuf[pl.ds(fb + 2 * srows, srows), :] = jnp.where(found, vv,
                                                              0.0)
            fbuf[pl.ds(fb + 3 * srows, srows), :] = nx
            fbuf[pl.ds(fb + 4 * srows, srows), :] = ny
            fbuf[pl.ds(fb + 5 * srows, srows), :] = nz
            ibuf[pl.ds(ib, srows), :] = pid
            ibuf[pl.ds(ib + srows, srows), :] = lay
            ibuf[pl.ds(ib + 2 * srows, srows), :] = tt
            ibuf[pl.ds(ib + 3 * srows, srows), :] = ii
            _f_out(g, pb).start()
            _i_out(g, pb).start()
        else:
            # timing probe: outputs never written/copied (garbage fout)
            pops = pops + jnp.sum(best[0:1, 0:1]).astype(jnp.int32) * 0
        return (pops_total[0] + pops, pops_total[1] + iters)

    pops_total = jax.lax.fori_loop(
        0, num_tiles, group_body, (jnp.int32(0), jnp.int32(0))
    )
    if probe != "noout":
        for g in range(max(num_tiles - 2, 0), num_tiles):
            _f_out(g, g & 1).wait()
            _i_out(g, g & 1).wait()
    pops_out[0, 0] = pops_total[0]
    pops_out[0, 1] = pops_total[1]


def _call_cluster(rays_packed, nodes, ablocks, *, any_hit, interpret,
                  num_tiles, dummy_enc, srows, tcap, qd, inner=1,
                  gr=4, probe="", islab=None, iinv=None, ifwd=None,
                  kstack=KSTACK):
    from .traverse_pallas import _to_columnar

    # upper tree -> columnar blocks (NB, stride, 128): node fields run
    # down a lane column; tiny tables, converted on device per cast
    nodes = _to_columnar(nodes, NODE8_STRIDE, NODE8_STRIDE)
    rrows = 8 * srows
    frows = 6 * srows
    irows = 4 * srows
    br = tcap + 8
    n_inst = 0 if islab is None else int(islab.shape[1])
    kern = functools.partial(
        _cluster_kernel, any_hit=any_hit, dummy_enc=dummy_enc,
        srows=srows, tcap=tcap, num_tiles=num_tiles, qd=qd, inner=inner,
        gr=gr, probe=probe, n_inst=n_inst, kstack=kstack,
    )
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    extra_in = [smem, smem, smem] if n_inst else []
    extra_args = [islab, iinv, ifwd] if n_inst else []
    cp = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        compiler_params=cp,
        in_specs=[hbm, hbm, hbm] + extra_in,
        out_specs=(hbm, hbm, pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * frows, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * irows, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * rrows, 128), jnp.float32),   # ray grp (dbuf)
            pltpu.VMEM((2 * frows, 128), jnp.float32),   # f32 out (dbuf)
            pltpu.VMEM((2 * irows, 128), jnp.int32),     # i32 out (dbuf)
            pltpu.SMEM((1, kstack + 1), jnp.int32),      # + sacrificial
            pltpu.SMEM((1, QCAP + 1), jnp.int32),        # ring + sacrificial
            pltpu.SMEM((1, QCAP + 1), jnp.int32),        # per-entry rowmasks
            pltpu.VMEM(nodes.shape, jnp.float32),        # upper tree (columnar)
            pltpu.VMEM((QCAP * br, 128), jnp.float32),   # field-slab landings
            pltpu.VMEM((NODE8_STRIDE, 128), jnp.float32),  # node broadcast
            # 0 nodes; 2+pb ray-in; 4+pb f-out; 6+pb i-out; 8+slot qland
            pltpu.SemaphoreType.DMA((8 + QCAP,)),
        ],
        interpret=interpret,
    )(rays_packed, nodes, ablocks, *extra_args)


def _pack_kernel(*refs, srows):
    out = refs[-1]
    for f in range(8):
        out[pl.ds(f * srows, srows), :] = refs[f][...]


def _pack_rays(rfields, num_tiles, srows, interpret):
    """Interleave 8 ray-field planes into per-tile field-major groups.

    As pure XLA (jnp.stack) this interleave measured 5.8 ms per 786K-ray
    frame — a noticeable slice of the cast; as a trivial pallas copy
    kernel over the tile grid it is HBM-bandwidth bound (~0.2 ms)."""
    grid = (num_tiles,)
    blk = lambda: pl.BlockSpec((srows, 128), lambda g: (g, 0))
    return pl.pallas_call(
        functools.partial(_pack_kernel, srows=srows),
        grid=grid,
        in_specs=[blk() for _ in range(8)],
        out_specs=pl.BlockSpec((8 * srows, 128), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((num_tiles * 8 * srows, 128),
                                       jnp.float32),
        interpret=interpret,
    )(*rfields)


def _hits_from_buffers(fout, iout, rays, num_tiles, srows, n):
    """Gather-free hit assembly: every per-ray field (incl. prim id,
    layers, and the unnormalized winner normal) comes straight out of the
    kernel buffers; the only remaining math is elementwise.  (The old
    slot-metadata gathers measured ~30 ms of a ~49 ms 99K frame.)"""
    f4 = fout.reshape(num_tiles, 6, srows * 128)
    i4 = iout.reshape(num_tiles, 4, srows * 128)
    t = f4[:, 0].reshape(-1)[:n]
    u = f4[:, 1].reshape(-1)[:n]
    v = f4[:, 2].reshape(-1)[:n]
    nn = jnp.stack(
        [f4[:, 3].reshape(-1)[:n], f4[:, 4].reshape(-1)[:n],
         f4[:, 5].reshape(-1)[:n]], axis=-1,
    )
    pid = i4[:, 0].reshape(-1)[:n]
    lay = i4[:, 1].reshape(-1)[:n]
    tt = i4[:, 2].reshape(-1)[:n]

    found = pid >= 0
    # kernel emits -n (unnormalized geometric normal) of the winner
    nrm = -nn
    ln = jnp.sqrt(jnp.sum(nrm * nrm, axis=-1, keepdims=True))
    nrm = nrm / jnp.where(ln > 0.0, ln, 1.0)
    hits = Hits(
        t=jnp.where(found, t, T_MAX_DEFAULT),
        position=jnp.where(
            found[:, None], rays.origin + rays.direction * t[:, None], 0.0
        ),
        normal=jnp.where(found[:, None], nrm, 0.0),
        u=u,
        v=v,
        prim_id=jnp.where(found, pid, NO_HIT),
        hit_layers=jnp.where(found, lay, 0),
    )
    return hits, found, tt


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


CLUSTER_SROWS = 16   # ray-tile height (srows x 128 rays per tile)
CLUSTER_QD = 2       # cluster drains per traversal iteration
CLUSTER_INNER = 1    # iterations per aliveness check (1 = plain while;
#                      >1 measured NO win — the while-cond dependence is
#                      not the binding cost; see PERF.md round-3 notes)
CLUSTER_GR = 4       # ray rows per dense-phase cond group


def cast_rays_cluster(
    rays: Rays,
    cs: ClusterScene,
    query_mask: int = -1,
    any_hit: bool = False,
    interpret: bool | None = None,
    srows: int = CLUSTER_SROWS,
    qd: int = CLUSTER_QD,
    inner: int = CLUSTER_INNER,
    gr: int = CLUSTER_GR,
    probe: str = "",
    return_per_ray: bool = False,
) -> tuple[Hits, RayStats, jnp.ndarray]:
    """Closest-hit / any-hit cast through the dense cluster kernel.

    Single jitted computation end-to-end (one device dispatch per cast).
    Exact f32 pair math (same error class as the sequential oracle).
    Returns (hits, stats, occluded); with ``return_per_ray`` appends a
    dict of per-ray counters ({"tri_tests": (N,) int32} — the exact
    dense-test work the kernel performed for each ray, the reference's
    per-ray cost heatmap signal, stats.h:20-55) at zero extra cost.
    """
    _check_probe(probe)
    if interpret is None:
        interpret = not _on_tpu()
    out = _cast_rays_cluster_jit(
        rays, cs, query_mask=int(query_mask), any_hit=any_hit,
        interpret=interpret, srows=srows, qd=qd, inner=inner, gr=gr,
        probe=probe,
    )
    if probe:
        return out
    hits, stats, found, tt = out
    if return_per_ray:
        return hits, stats, found, {"tri_tests": tt}
    return hits, stats, found


@functools.partial(
    jax.jit,
    static_argnames=("query_mask", "any_hit", "interpret", "srows",
                     "qd", "inner", "gr", "probe"),
)
def _cast_rays_cluster_jit(
    rays: Rays,
    cs: ClusterScene,
    *,
    query_mask: int,
    any_hit: bool,
    interpret: bool,
    srows: int,
    qd: int,
    inner: int,
    gr: int,
    probe: str,
) -> tuple[Hits, RayStats, jnp.ndarray]:
    n = rays.count
    step = srows * 128
    num_tiles = -(-n // step)
    # pow2-ish bucketing: nearby batch sizes reuse the compiled kernel
    b = 1
    while b < num_tiles:
        b *= 2
    if num_tiles > b // 2 and num_tiles <= 3 * b // 4 and b >= 4:
        b = 3 * b // 4
    num_tiles = b
    pad = num_tiles * step - n

    def fld(x, fillv):
        x = (jnp.concatenate([x, jnp.full((pad,), fillv, x.dtype)])
             if pad else x)
        return x.reshape(num_tiles * srows, 128)

    rfields = (
        fld(rays.origin[:, 0], 0.0), fld(rays.origin[:, 1], 0.0),
        fld(rays.origin[:, 2], 0.0),
        fld(rays.direction[:, 0], 0.0), fld(rays.direction[:, 1], 0.0),
        fld(rays.direction[:, 2], 1.0),
        fld(rays.t_min, 0.0), fld(rays.t_max, -1.0),  # pads never hit
    )
    packed = _pack_rays(rfields, num_tiles, srows, interpret)

    ablocks = cs.ablocks
    if query_mask != -1:
        ablocks = _mask_ablocks(cs, query_mask)

    fout, iout, pops_tot = _call_cluster(
        packed, cs.nodes, ablocks,
        any_hit=any_hit, interpret=interpret, num_tiles=num_tiles,
        dummy_enc=cs.dummy_enc, srows=srows, tcap=cs.tcap, qd=qd,
        inner=inner, gr=gr, probe=probe,
        kstack=_kstack_for(cs.stack_need),
    )
    hits, found, tt = _hits_from_buffers(fout, iout, rays, num_tiles,
                                         srows, n)
    stats = RayStats(
        rays_cast=jnp.int32(n),
        tri_tests=jnp.sum(tt.astype(jnp.float32)),
        bvh_nodes_visited=jnp.sum(pops_tot[0, 0][None]),
        hits=jnp.sum(found.astype(jnp.int32)),
    )
    if probe:
        return hits, stats, found, pops_tot[0, 1]
    # tt is the kernel's EXACT per-ray triangle-test count (the dense
    # work actually performed for that ray's row groups) — the
    # production-backend cost signal for HEATMAP/OVERHEAT
    # (raytracer_debug.cpp:607-618) at frame scale, with zero overhead
    # (the lane rides the existing i32 output slab).
    return hits, stats, found, tt
