"""Wide-node (dual-AABB) device layout for the Pallas traversal kernel.

TPU-native analogue of the reference GPU backend's Aila-Laine conversion
(src/gpu/gpu_ray_caster.cpp:219-312): each *internal* BVH node becomes a
"wide node" storing BOTH children's AABBs plus child pointers, so one row
fetch per traversal step yields everything needed to test and push both
children (the reference gets the same effect with a single 64B node fetch).

Lane-packing: TPU VMEM rows are 128 lanes, and the only efficient dynamic
lane access is a whole-row load + dynamic rotate (``pltpu.roll``).  So:

  * ``nodes``:     (NR, 128) f32 — 8 wide nodes per row, 16 lanes each:
                   [Lmin.xyz, Lmax.xyz, Rmin.xyz, Rmax.xyz, Lenc, Renc,
                    split_axis, 0]
                   enc = 2*ptr + is_leaf, float-encoded (exact, ptr < 2^23);
                   ptr = wide-node index (internal) or leaf index (leaf).
                   A trailing dummy node has NaN boxes (never hit — the
                   reference's NaN sentinel, gpu_ray_caster.cpp:263-268).
  * ``leaf_tris``: (LR, 128) f32 — 2 leaves per row, 64 lanes each:
                   4 tris x 9 fields [v0.xyz, e1.xyz, e2.xyz] at lane
                   9k+f, lane 36 = real tri count; padding tris have zero
                   edges so Moller-Trumbore rejects them via the
                   determinant epsilon — the kernel needs no count checks
  * ``slot_*``:    per padded slot (4 * num_leaves) metadata gathered
                   after the kernel: prim_id, layers, normal

**Index-based packing.** Both lane-packed arrays are materialized as a
gather ``src[idx]`` where ``src`` concatenates the narrow-BVH AABB arrays /
triangle arrays with a small constant tail.  The index arrays are computed
once at build (host, numpy); ``refresh_wide_scene`` then re-runs the same
gather *on device* after a refit, so per-frame geometry updates never leave
the TPU (SURVEY.md north star; reference refit scene_tlas.h:180-196).

Leaves are emitted in DFS discovery order for memory coherence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Triangles
from ..utils.struct import pytree_dataclass
from ..accel.bvh import BVH

NODES_PER_ROW = 8     # 16 lanes each (binary dual-AABB nodes)
NODE_STRIDE = 16
LEAVES_PER_ROW = 2    # 64 lanes each
LEAF_STRIDE = 64
LEAF_CAP = 4          # MAX_LEAF_SIZE

# 8-wide nodes (the CWBVH-class layout, tiny_bvh.h BVH8 + Ylitie'17 shape):
# one row fetch tests EIGHT children, collapsing ~3 binary levels per pop.
# Lanes per node: [child k box at 6k..6k+5 (min.xyz,max.xyz), k<8] +
# [enc_k at 48+k] + [sort axis at 56] + pad.  Missing children have NaN
# boxes (never hit).  Children are sorted along the axis of maximum
# centroid spread for front-to-back ordering by tile direction consensus.
NODES8_PER_ROW = 2
NODE8_STRIDE = 64
WIDE8_CAP = 8


@pytree_dataclass(meta_fields=("dummy_enc", "dummy_leaf", "stream_leaves",
                               "stream_nodes", "branching"))
class WideScene:
    """Device arrays consumed by the Pallas traversal kernel."""

    nodes: jnp.ndarray         # (NR, 128) f32
    leaf_tris: jnp.ndarray     # (LR, 128) f32
    slot_prim_id: jnp.ndarray  # (4L,) int32
    slot_layers: jnp.ndarray   # (4L,) int32
    slot_normal: jnp.ndarray   # (4L, 3) f32
    slot_tri: jnp.ndarray      # (4L,) int32 tri slot per padded slot (0 if pad)
    node_idx: jnp.ndarray      # (NR, 128) int32 gather indices (device refresh)
    leaf_idx: jnp.ndarray      # (LR, 128) int32
    node_const: jnp.ndarray    # (...,) f32 constant tail for node gather
    leaf_const: jnp.ndarray    # (...,) f32 constant tail for leaf gather
    dummy_enc: int             # stack encoding of the never-hit dummy node
    dummy_leaf: int            # index of the all-zero dummy leaf (no-op MT)
    stream_leaves: bool = False  # leaf rows stay in HBM, DMA'd per pop
    stream_nodes: bool = False   # node rows too (very large scenes)
    branching: int = 2           # node arity: 2 (dual-AABB) or 8 (wide8)

    @property
    def num_leaves(self) -> int:
        return self.slot_prim_id.shape[0] // LEAF_CAP


def _pack_idx(rows: np.ndarray, per_row: int, stride: int, fill: int):
    """Pack per-node index rows into (NR, 128) with pad entries = ``fill``.

    Fills only the pad region (np.empty + partial writes): np.full on a
    fresh 100MB-class array costs seconds of first-touch page faults at
    1M-triangle scale (measured), and most of it is immediately
    overwritten."""
    n, w = rows.shape
    assert stride * per_row == 128 and w <= stride
    nr = -(-n // per_row)
    nr_pad = max(-(-nr // 8) * 8, 8)  # sublane multiple
    buf = np.empty((nr_pad * per_row, stride), rows.dtype)
    buf[:n, :w] = rows
    if w < stride:
        buf[:n, w:] = fill
    buf[n:] = fill
    return buf.reshape(nr_pad, 128)


def build_wide_scene(bvh: BVH, tris: Triangles, _np=None,
                     stream_leaves: bool = False,
                     stream_nodes: bool = False) -> WideScene:
    """Convert a DFS narrow-node BVH + slot-ordered triangles to the wide
    lane-packed layout.  Host-side (numpy), runs once per topology (re)build;
    per-frame geometry updates use ``refresh_wide_scene`` instead.

    ``_np`` optionally provides host copies (v0, e1, e2, normal, prim_id,
    layers) to skip device->host readbacks of ``tris``.
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
        v0, e1, e2, nrm, pid, lay = (np.asarray(a) for a in _np)
    else:
        v0 = np.asarray(tris.v0)
        e1 = np.asarray(tris.edge1)
        e2 = np.asarray(tris.edge2)
        nrm = np.asarray(tris.normal)
        pid = np.asarray(tris.prim_id)
        lay = np.asarray(tris.layers)
    t = v0.shape[0]

    is_leaf = cnt > 0
    internal = np.nonzero(~is_leaf)[0]
    leaves = np.nonzero(is_leaf)[0]
    wide_of = np.cumsum(~is_leaf) - 1   # valid where internal
    leaf_of = np.cumsum(is_leaf) - 1    # valid where leaf

    # trailing dummy node: NaN boxes never hit -> no-op pop target
    num_wide = max(len(internal), 1) + 1
    num_leaf = len(leaves)

    # --- node gather indices ------------------------------------------
    # node src = [amin.flat (3M), amax.flat (3M), node_const]
    # node_const = [Lenc (W,), Renc (W,), axis (W,), 0.0, NaN]
    cb = 6 * m
    lenc = np.zeros(num_wide, np.float32)
    renc = np.zeros(num_wide, np.float32)
    waxis = np.zeros(num_wide, np.float32)
    zero_pos = cb + 3 * num_wide
    nan_pos = zero_pos + 1
    nidx = np.full((num_wide, NODE_STRIDE), zero_pos, np.int32)
    nidx[-1, 0:12] = nan_pos  # dummy node

    axes = np.arange(3)
    if len(internal) == 0:
        # Root is a leaf: synthesize one wide node, left = leaf 0, right =
        # never-hit NaN box.
        nidx[0, 0:3] = 3 * 0 + axes
        nidx[0, 3:6] = 3 * m + 3 * 0 + axes
        nidx[0, 6:12] = nan_pos
        nidx[0, 12] = cb + 0
        nidx[0, 13] = cb + num_wide + 0
        nidx[0, 14] = cb + 2 * num_wide + 0
        lenc[0] = 1.0  # leaf 0
        renc[0] = 1.0
    else:
        ni = len(internal)
        l = internal + 1
        r = lf[internal]
        w = np.arange(ni)
        nidx[:ni, 0:3] = 3 * l[:, None] + axes[None, :]
        nidx[:ni, 3:6] = 3 * m + 3 * l[:, None] + axes[None, :]
        nidx[:ni, 6:9] = 3 * r[:, None] + axes[None, :]
        nidx[:ni, 9:12] = 3 * m + 3 * r[:, None] + axes[None, :]
        nidx[:ni, 12] = cb + w
        nidx[:ni, 13] = cb + num_wide + w
        nidx[:ni, 14] = cb + 2 * num_wide + w
        waxis[:ni] = (host["split_axis"] if host is not None
                      else np.asarray(bvh.split_axis))[internal].astype(np.float32)
        # child meta packed to ONE float each: enc = 2*ptr + is_leaf
        # (exact for ptr < 2^23)
        lptr = np.where(is_leaf[l], leaf_of[l], wide_of[l])
        rptr = np.where(is_leaf[r], leaf_of[r], wide_of[r])
        lenc[:ni] = 2.0 * lptr + is_leaf[l]
        renc[:ni] = 2.0 * rptr + is_leaf[r]

    node_const = np.concatenate(
        [lenc, renc, waxis, [0.0], [np.nan]]
    ).astype(np.float32)
    node_idx = _pack_idx(nidx, NODES_PER_ROW, NODE_STRIDE, zero_pos)

    # --- leaf gather indices ------------------------------------------
    # leaf src = [v0.flat (3T), e1.flat (3T), e2.flat (3T), leaf_const]
    # leaf_const = [counts (L,), 0.0]
    first = lf[leaves][:, None]                       # (L, 1)
    c = cnt[leaves][:, None]
    ks = np.arange(LEAF_CAP)[None, :]
    slots = np.clip(first + ks, 0, max(t - 1, 0))     # (L, 4)
    valid = ks < c
    cb2 = 9 * t
    zero2 = cb2 + num_leaf
    lidx = np.full((max(num_leaf, 1), LEAF_STRIDE), zero2, np.int32)
    for k in range(LEAF_CAP):
        b = 9 * k
        s3 = 3 * slots[:, k : k + 1] + axes[None, :]
        vm = valid[:, k : k + 1]
        lidx[:num_leaf, b : b + 3] = np.where(vm, s3, zero2)
        lidx[:num_leaf, b + 3 : b + 6] = np.where(vm, 3 * t + s3, zero2)
        lidx[:num_leaf, b + 6 : b + 9] = np.where(vm, 6 * t + s3, zero2)
    lidx[:num_leaf, 36] = cb2 + np.arange(num_leaf)
    leaf_const = np.concatenate(
        [cnt[leaves].astype(np.float32), [0.0]]
    ).astype(np.float32)
    # +1 all-zero dummy leaf: branch-free kernel pops fetch it when the
    # popped entry is an internal node (zero edges -> MT self-rejects)
    lidx = np.concatenate([lidx[:num_leaf],
                           np.full((1, LEAF_STRIDE), zero2, np.int32)])
    leaf_idx = _pack_idx(lidx, LEAVES_PER_ROW, LEAF_STRIDE, zero2)

    # --- materialize via the same gather the device refresh uses -------
    node_src = np.concatenate([amin.reshape(-1), amax.reshape(-1), node_const])
    leaf_src = np.concatenate(
        [v0.reshape(-1), e1.reshape(-1), e2.reshape(-1), leaf_const]
    )
    nodes = node_src[node_idx].astype(np.float32)
    leaf_rows = leaf_src[leaf_idx].astype(np.float32)

    # --- per-padded-slot metadata -------------------------------------
    slot_tri = np.where(valid, slots, 0).astype(np.int32).reshape(-1)
    slot_pid = np.where(valid, pid[slots], -1).astype(np.int32).reshape(-1)
    slot_lay = np.where(valid, lay[slots], 0).astype(np.int32).reshape(-1)
    slot_nrm = (
        np.where(valid[..., None], nrm[slots], 0.0)
        .astype(np.float32)
        .reshape(-1, 3)
    )

    return WideScene(
        nodes=jnp.asarray(nodes),
        leaf_tris=jnp.asarray(leaf_rows),
        slot_prim_id=jnp.asarray(slot_pid),
        slot_layers=jnp.asarray(slot_lay),
        slot_normal=jnp.asarray(slot_nrm),
        slot_tri=jnp.asarray(slot_tri),
        node_idx=jnp.asarray(node_idx.astype(np.int32)),
        leaf_idx=jnp.asarray(leaf_idx.astype(np.int32)),
        node_const=jnp.asarray(node_const),
        leaf_const=jnp.asarray(leaf_const),
        dummy_enc=2 * (num_wide - 1),
        dummy_leaf=num_leaf,
        stream_leaves=stream_leaves,
        stream_nodes=stream_nodes,
    )


def _collapse8(amin: np.ndarray, amax: np.ndarray, lf: np.ndarray,
               cnt: np.ndarray):
    """Collapse the binary DFS BVH into an 8-wide tree (host, vectorized).

    Greedy: starting from a node's two children, repeatedly expand the
    internal child with the largest surface area until 8 children (the
    standard BVH2->BVH8 collapse, tiny_bvh.h BVH8 conversion shape).
    Returns (children, axis): ``children`` is an (W, 8) int32 array of
    binary node ids (-1 = missing), sorted per node along ``axis`` (W,)
    by box centroid for consensus front-to-back ordering.

    Whole BFS levels expand together as (F, 8) numpy passes — the per-node
    Python loop version took ~2 s at 1M tris; this is ~50 ms.
    """
    is_leaf = cnt > 0
    ext = np.maximum(amax - amin, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]
    cent = (amin + amax) * 0.5

    if bool(is_leaf[0]):
        # degenerate: root is a leaf — one wide node holding it
        return (np.array([[0] + [-1] * 7], np.int32), np.zeros(1, np.int32))

    children_lvls: list[np.ndarray] = []
    axes_lvls: list[np.ndarray] = []
    frontier = np.array([0], np.int32)   # binary ids becoming wide nodes
    while frontier.size:
        f = frontier.size
        kids = np.full((f, WIDE8_CAP), -1, np.int32)
        kids[:, 0] = frontier + 1
        kids[:, 1] = lf[frontier]
        ncount = np.full(f, 2, np.int32)
        # greedy expansion: 6 rounds of replace-max-area-internal-child
        for _ in range(WIDE8_CAP - 2):
            present = kids >= 0
            safe = np.where(present, kids, 0)
            expandable = present & ~is_leaf[safe]
            a = np.where(expandable, area[safe], -np.inf)
            best = np.argmax(a, axis=1)                    # (F,)
            rows = np.nonzero((a[np.arange(f), best] > -np.inf)
                              & (ncount < WIDE8_CAP))[0]
            if rows.size == 0:
                break
            kd = kids[rows, best[rows]]
            kids[rows, best[rows]] = kd + 1                # replace in place
            kids[rows, ncount[rows]] = lf[kd]              # append sibling
            ncount[rows] += 1
        # sort present kids along the max-centroid-spread axis
        present = kids >= 0
        safe = np.where(present, kids, 0)
        ck = np.where(present[..., None], cent[safe], np.nan)
        spread = np.nanmax(ck, axis=1) - np.nanmin(ck, axis=1)   # (F, 3)
        ax = np.argmax(spread, axis=1)                           # (F,)
        key = np.where(present, np.take_along_axis(
            cent[safe], ax[:, None, None], axis=2)[..., 0], np.inf)
        ordr = np.argsort(key, axis=1, kind="stable")
        kids = np.take_along_axis(kids, ordr, axis=1)
        children_lvls.append(kids)
        axes_lvls.append(ax)
        flat = kids.reshape(-1)
        flat = flat[flat >= 0]
        frontier = flat[~is_leaf[flat]]                    # row-major BFS
    return (np.concatenate(children_lvls).astype(np.int32),
            np.concatenate(axes_lvls).astype(np.int32))


def build_wide8_scene(bvh: BVH, tris: Triangles, _np=None,
                      stream_leaves: bool = False,
                      stream_nodes: bool = False) -> WideScene:
    """Convert a DFS binary BVH to the 8-wide lane-packed layout.

    Same gather-based packing contract as ``build_wide_scene`` (so
    ``refresh_wide_scene`` works unchanged for refits); nodes use the
    wide8 layout (NODE8_STRIDE lanes, 2 per row), leaves are identical.

    Host work is *index construction only* (int32 numpy, ~1 s at 1M tris);
    the lane-packed node/leaf rows are materialized ON DEVICE by the same
    ``refresh_wide_scene`` gather refits use, fed by the BVH AABBs and
    triangle SoA already resident in HBM — so a build moves ~half the
    bytes of a host-side packing and none of its gather time.
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
        _, _, _, _, pid, lay = (np.asarray(a) for a in _np)
    else:
        pid = np.asarray(tris.prim_id)
        lay = np.asarray(tris.layers)
    t = int(tris.v0.shape[0])

    # ---- native fast path: one C++ pass emits the packed index arrays
    # (table-identical to the numpy path below; tested) ------------------
    from ..native import native_build_wide8_tables

    tabs = native_build_wide8_tables(amin, amax, lf, cnt, t)
    if tabs is not None:
        (node_idx, node_const, leaf_idx, leaf_const, leaf_first,
         leaf_cnt, nw, num_leaf) = tabs
        ks = np.arange(LEAF_CAP, dtype=np.int32)[None, :]
        slots = np.clip(leaf_first[:, None] + ks, 0, max(t - 1, 0))
        valid = ks < leaf_cnt[:, None]
        skeleton = WideScene(
            nodes=jnp.zeros((1, 1), jnp.float32),
            leaf_tris=jnp.zeros((1, 1), jnp.float32),
            slot_prim_id=jnp.asarray(
                np.where(valid, pid[slots], -1).astype(np.int32).reshape(-1)
            ),
            slot_layers=jnp.asarray(
                np.where(valid, lay[slots], 0).astype(np.int32).reshape(-1)
            ),
            slot_normal=jnp.zeros((1, 3), jnp.float32),
            slot_tri=jnp.asarray(
                np.where(valid, slots, 0).astype(np.int32).reshape(-1)
            ),
            node_idx=jnp.asarray(node_idx),
            leaf_idx=jnp.asarray(leaf_idx),
            node_const=jnp.asarray(node_const),
            leaf_const=jnp.asarray(leaf_const),
            dummy_enc=2 * nw,
            dummy_leaf=num_leaf,
            stream_leaves=stream_leaves,
            stream_nodes=stream_nodes,
            branching=8,
        )
        return refresh_wide_scene(skeleton, bvh, tris)

    is_leaf = cnt > 0
    leaves = np.nonzero(is_leaf)[0]
    leaf_of = (np.cumsum(is_leaf) - 1).astype(np.int32)
    num_leaf = len(leaves)

    children, waxes = _collapse8(amin, amax, lf, cnt)
    children = np.asarray(children, np.int32)
    nw = children.shape[0]
    num_wide = nw + 1  # trailing NaN dummy
    # wide id per binary node: internal children in BFS order get ids
    # nw grows exactly with queue order in _collapse8 — recompute here
    wide_of = np.full(m, -1, np.int32)
    order = children[children >= 0]
    internal_kids = order[~is_leaf[order]]
    wide_of[0] = 0
    wide_of[internal_kids] = np.arange(1, len(internal_kids) + 1,
                                       dtype=np.int32)
    assert len(internal_kids) == nw - 1, (len(internal_kids), nw)

    # --- node gather indices -------------------------------------------
    # node src = [amin.flat (3M), amax.flat (3M), node_const]
    # node_const = [enc (8W), axis (W), 0.0, NaN]
    cb = 6 * m
    zero_pos = cb + 9 * num_wide
    nan_pos = zero_pos + 1
    nidx = np.full((num_wide, NODE8_STRIDE), zero_pos, np.int32)
    nidx[-1, 0:48] = nan_pos  # dummy node: NaN boxes

    axes = np.arange(3, dtype=np.int32)
    enc = np.full((num_wide, WIDE8_CAP), 2.0 * nw, np.float32)  # dummy enc
    present = children >= 0
    ck = np.where(present, children, 0)
    ptr = np.where(is_leaf[ck], leaf_of[ck], wide_of[ck])
    enc[:nw] = np.where(present, 2.0 * ptr + is_leaf[ck], 2.0 * nw)
    for k in range(WIDE8_CAP):
        col = np.where(present[:, k], ck[:, k], 0).astype(np.int32)
        bmin = 3 * col[:, None] + axes[None, :]
        bmax = 3 * m + 3 * col[:, None] + axes[None, :]
        pm = present[:, k : k + 1]
        nidx[:nw, 6 * k : 6 * k + 3] = np.where(pm, bmin, nan_pos)
        nidx[:nw, 6 * k + 3 : 6 * k + 6] = np.where(pm, bmax, nan_pos)
        nidx[:nw, 48 + k] = cb + WIDE8_CAP * np.arange(nw, dtype=np.int32) + k
    nidx[:nw, 56] = cb + 8 * num_wide + np.arange(nw, dtype=np.int32)
    # axes padded to num_wide (dummy node's axis slot) so zero_pos /
    # nan_pos land on the documented 0.0 / NaN elements exactly
    node_const = np.concatenate(
        [enc.reshape(-1), waxes.astype(np.float32),
         np.float32([0.0, 0.0, np.nan])]
    )
    node_idx = _pack_idx(nidx, NODES8_PER_ROW, NODE8_STRIDE, zero_pos)

    # --- leaf gather indices (identical to the binary layout) -----------
    first = lf[leaves][:, None].astype(np.int32)
    c = cnt[leaves][:, None]
    ks = np.arange(LEAF_CAP, dtype=np.int32)[None, :]
    slots = np.clip(first + ks, 0, max(t - 1, 0))
    valid = ks < c
    cb2 = 9 * t
    zero2 = cb2 + num_leaf
    # empty + pad-only fill: the k-loop below assigns lanes 0..36 of every
    # real row, so np.full would write this 60MB-class array twice
    lidx = np.empty((max(num_leaf, 1) + 1, LEAF_STRIDE), np.int32)
    lidx[:, 37:] = zero2
    lidx[num_leaf:] = zero2
    for k in range(LEAF_CAP):
        b = 9 * k
        s3 = 3 * slots[:, k : k + 1] + axes[None, :]
        vm = valid[:, k : k + 1]
        lidx[:num_leaf, b : b + 3] = np.where(vm, s3, zero2)
        lidx[:num_leaf, b + 3 : b + 6] = np.where(vm, 3 * t + s3, zero2)
        lidx[:num_leaf, b + 6 : b + 9] = np.where(vm, 6 * t + s3, zero2)
    lidx[:num_leaf, 36] = cb2 + np.arange(num_leaf, dtype=np.int32)
    # trailing all-zero dummy leaf row is already zero2-filled
    leaf_const = np.concatenate(
        [cnt[leaves].astype(np.float32), np.float32([0.0])]
    )
    leaf_idx = _pack_idx(lidx, LEAVES_PER_ROW, LEAF_STRIDE, zero2)

    slot_tri = np.where(valid, slots, 0).astype(np.int32).reshape(-1)
    slot_pid = np.where(valid, pid[slots], -1).astype(np.int32).reshape(-1)
    slot_lay = np.where(valid, lay[slots], 0).astype(np.int32).reshape(-1)

    skeleton = WideScene(
        nodes=jnp.zeros((1, 1), jnp.float32),       # materialized on device
        leaf_tris=jnp.zeros((1, 1), jnp.float32),   # (below)
        slot_prim_id=jnp.asarray(slot_pid),
        slot_layers=jnp.asarray(slot_lay),
        slot_normal=jnp.zeros((1, 3), jnp.float32),
        slot_tri=jnp.asarray(slot_tri),
        node_idx=jnp.asarray(node_idx),
        leaf_idx=jnp.asarray(leaf_idx),
        node_const=jnp.asarray(node_const),
        leaf_const=jnp.asarray(leaf_const),
        dummy_enc=2 * nw,
        dummy_leaf=num_leaf,
        stream_leaves=stream_leaves,
        stream_nodes=stream_nodes,
        branching=8,
    )
    # one fused device gather builds nodes/leaf_tris/slot_normal in HBM
    return refresh_wide_scene(skeleton, bvh, tris)


@jax.jit
def refresh_wide_scene(wide: WideScene, bvh: BVH, tris: Triangles) -> WideScene:
    """Rebuild the lane-packed arrays from refit BVH/triangle data — fully
    on device (two gathers + a normal gather), so refits never round-trip
    to host.  Topology (index arrays, encs, counts) is unchanged.
    """
    node_src = jnp.concatenate(
        [bvh.aabb_min.reshape(-1), bvh.aabb_max.reshape(-1), wide.node_const]
    )
    leaf_src = jnp.concatenate(
        [
            tris.v0.reshape(-1),
            tris.edge1.reshape(-1),
            tris.edge2.reshape(-1),
            wide.leaf_const,
        ]
    )
    valid = wide.slot_prim_id >= 0
    slot_nrm = jnp.where(valid[:, None], tris.normal[wide.slot_tri], 0.0)
    return wide.replace(
        nodes=node_src[wide.node_idx],
        leaf_tris=leaf_src[wide.leaf_idx],
        slot_normal=slot_nrm,
    )
