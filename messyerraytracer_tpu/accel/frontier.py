"""Frontier caster — per-ray breadth-first traversal as dense XLA ops.

The packet Pallas kernel (kernels/traverse_pallas.py) traverses 2048-ray
tiles in lockstep against a shared stack: node fetches amortize, but every
ray pays for the whole tile's footprint (tri-tests/ray 50-350 vs a per-ray
5-20) and each pop is a serial reduction chain.  This module is the
opposite trade, and is pure jnp — no Pallas at all:

  * the wide (8-ary) BVH is descended LEVEL BY LEVEL for all rays at once:
    the frontier is a flat list of (ray, node) pairs, each level is one
    dense batch of 8-child slab tests, and the surviving pairs are
    compacted with a cumsum + scatter (classic stream compaction, the
    GPU wavefront idiom mapped to XLA);
  * leaf pairs intersect their (<=4) triangles with the same
    Moller-Trumbore arithmetic as the brute oracle (core/geometry.py) and
    fold into per-ray bests via scatter-min — per-RAY exact, no tile
    sharing;
  * closest-hit semantics match the serial reference loop
    (triangle.h:93-102): strictly-closer update, lowest-slot win on exact
    t ties — enforced here as a lexicographic (t, slot) scatter-min;
  * the per-ray best_t feeds back into the NEXT level's slab cap
    (level-lagged front-to-back culling, the dense analogue of the
    traversal early-exit at bvh_traverse.comp.glsl:251).

Because every ray advances independently, incoherent (bounce/shadow) rays
cost the same as primaries, and stats are per-ray exact — this backend is
what the OVERHEAT/HEATMAP debug modes mean (raytracer_debug.cpp:607-618).

**Layout rule:** every traversal-sized array here is flat 1-D.  TPU tiles
pad the trailing dimension to 128 lanes, so a (P, 8, 3) gather would
materialize at 21x its logical size (measured: 6 GB for 288 MB of boxes);
1-D arrays get linear T(1024) tiling with zero padding.  Scene tables and
per-pair values are therefore stored as separate x/y/z component arrays.

Capacity: frontier and leaf-pair lists are fixed-size (static shapes under
jit) with overflow flags; the wrapper retries with doubled caps, so
results are never silently truncated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import (
    ALL_LAYERS,
    INV_DIR_EPS,
    MT_DET_EPS,
    NO_HIT,
    T_MAX_DEFAULT,
    Hits,
    Rays,
    RayStats,
    Triangles,
)
from ..utils.struct import pytree_dataclass
from .bvh import BVH

_BIG = 3.0e38
_IMAX = np.iinfo(np.int32).max


@pytree_dataclass(meta_fields=("depth",))
class FrontierScene:
    """Wide-tree tables for the frontier caster (flat device arrays).

    Child slot i of wide node w lives at flat index 8*w + i.  Missing
    children carry NaN boxes (never hit — the NaN sentinel of
    gpu_ray_caster.cpp:263-268).  ``child_enc`` is 2*ptr + is_leaf
    (ptr = wide-node or leaf index).  Leaves cover tri slots
    [first, first+count) of the slot-ordered triangle SoA, whose
    coordinates are mirrored here as component arrays.
    """

    child_min_x: jnp.ndarray  # (8W,) f32   — likewise _y, _z
    child_min_y: jnp.ndarray
    child_min_z: jnp.ndarray
    child_max_x: jnp.ndarray
    child_max_y: jnp.ndarray
    child_max_z: jnp.ndarray
    child_enc: jnp.ndarray    # (8W,) int32
    leaf_first: jnp.ndarray   # (L,) int32
    leaf_count: jnp.ndarray   # (L,) int32
    tri: tuple                # 9 x (T,) f32: v0.xyz, e1.xyz, e2.xyz
    depth: int = 1            # static: number of expansion levels


def build_frontier_scene(bvh: BVH, tris: Triangles) -> FrontierScene:
    """Build the frontier tables from a binary BVH (host index math only;
    triangle components are device slices of the resident SoA).

    Reuses the 8-wide greedy collapse of kernels/wide.py so both backends
    traverse the same wide topology.
    """
    from ..kernels.wide import _collapse8

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

    is_leaf = cnt > 0
    leaves = np.nonzero(is_leaf)[0]
    leaf_of = (np.cumsum(is_leaf) - 1).astype(np.int32)
    children, _ = _collapse8(amin, amax, lf, cnt)
    children = children.astype(np.int32)
    nw = children.shape[0]

    wide_of = np.full(m, -1, np.int32)
    order = children[children >= 0]
    internal_kids = order[~is_leaf[order]]
    wide_of[0] = 0
    wide_of[internal_kids] = np.arange(1, len(internal_kids) + 1,
                                       dtype=np.int32)

    present = children >= 0
    ck = np.where(present, children, 0)
    ptr = np.where(is_leaf[ck], leaf_of[ck], wide_of[ck])
    enc = np.where(present, 2 * ptr + is_leaf[ck], 0).astype(np.int32)
    cmin = np.where(present[..., None], amin[ck], np.nan).astype(np.float32)
    cmax = np.where(present[..., None], amax[ck], np.nan).astype(np.float32)

    # tree depth: BFS over wide nodes
    depth = 0
    frontier = np.array([0], np.int32)
    while frontier.size:
        depth += 1
        kids = children[frontier].reshape(-1)
        kids = kids[kids >= 0]
        frontier = wide_of[kids[~is_leaf[kids]]]

    tri = tuple(
        arr[:, a] for arr in (tris.v0, tris.edge1, tris.edge2)
        for a in range(3)
    )
    return FrontierScene(
        child_min_x=jnp.asarray(cmin[:, :, 0].reshape(-1)),
        child_min_y=jnp.asarray(cmin[:, :, 1].reshape(-1)),
        child_min_z=jnp.asarray(cmin[:, :, 2].reshape(-1)),
        child_max_x=jnp.asarray(cmax[:, :, 0].reshape(-1)),
        child_max_y=jnp.asarray(cmax[:, :, 1].reshape(-1)),
        child_max_z=jnp.asarray(cmax[:, :, 2].reshape(-1)),
        child_enc=jnp.asarray(enc.reshape(-1)),
        leaf_first=jnp.asarray(lf[leaves].astype(np.int32)),
        leaf_count=jnp.asarray(cnt[leaves].astype(np.int32)),
        tri=tri,
        depth=depth,
    )


def _safe_inv(x):
    """Identical safe inverse to the Pallas kernel (core/ray.h:62-75)."""
    small = jnp.abs(x) < INV_DIR_EPS
    sign = jnp.where(x < 0.0, -1.0, 1.0)
    return jnp.where(small, sign / INV_DIR_EPS, 1.0 / jnp.where(small, 1.0, x))


def _compact(keep_flat, values, cap):
    """Stream compaction: scatter ``values`` where ``keep`` into a (cap,)
    array (zero-filled), returning (compacted, count).  Overflowing entries
    are dropped (the caller checks count > cap and retries)."""
    pos = jnp.cumsum(keep_flat.astype(jnp.int32)) - 1
    idx = jnp.where(keep_flat, pos, cap)
    out = [
        jnp.zeros((cap,), v.dtype).at[idx].set(v, mode="drop") for v in values
    ]
    count = jnp.sum(keep_flat.astype(jnp.int32))
    return out, count


@functools.partial(
    jax.jit,
    static_argnames=("query_mask", "any_hit", "pair_cap", "leaf_cap"),
)
def _cast_frontier_jit(
    rays: Rays,
    fs: FrontierScene,
    layers: jnp.ndarray,
    *,
    query_mask: int,
    any_hit: bool,
    pair_cap: int,
    leaf_cap: int,
):
    r = rays.count
    num_tris = fs.tri[0].shape[0]
    ox, oy, oz = (rays.origin[:, a] for a in range(3))
    dx, dy, dz = (rays.direction[:, a] for a in range(3))
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    t_min, t_max = rays.t_min, rays.t_max
    qm = jnp.int32(query_mask)
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = fs.tri

    best_t = jnp.full((r,), _BIG, jnp.float32)
    best_slot = jnp.full((r,), _IMAX, jnp.int32)
    best_u = jnp.zeros((r,), jnp.float32)
    best_v = jnp.zeros((r,), jnp.float32)
    nodes_visited = jnp.zeros((r,), jnp.int32)
    tri_tests = jnp.zeros((r,), jnp.int32)
    overflow = jnp.bool_(False)

    # level 0: every ray at the root (exact size, no padding)
    pr = jnp.arange(r, dtype=jnp.int32)
    pn = jnp.zeros((r,), jnp.int32)
    pvalid = t_max >= t_min  # degenerate rays (t_max < t_min) never start
    pcount = jnp.int32(r)

    for _lvl in range(fs.depth):
        p = pr.shape[0]
        pv = pvalid
        if _lvl:
            pv = pv & (jnp.arange(p, dtype=jnp.int32) < pcount)
        nodes_visited = nodes_visited.at[pr].add(pv.astype(jnp.int32))

        # ---- 8-child slab tests, fully flat (P*8,) ---------------------
        j = jnp.arange(p * 8, dtype=jnp.int32)
        pj = jax.lax.shift_right_logical(j, 3)   # j // 8
        kj = j & 7
        ray = pr[pj]
        fidx = pn[pj] * 8 + kj
        enc = fs.child_enc[fidx]

        rox, roy, roz = ox[ray], oy[ray], oz[ray]
        rix, riy, riz = ix[ray], iy[ray], iz[ray]
        t1 = (fs.child_min_x[fidx] - rox) * rix
        t2 = (fs.child_max_x[fidx] - rox) * rix
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2)
        t1 = (fs.child_min_y[fidx] - roy) * riy
        t2 = (fs.child_max_y[fidx] - roy) * riy
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        t1 = (fs.child_min_z[fidx] - roz) * riz
        t2 = (fs.child_max_z[fidx] - roz) * riz
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        cap_t = jnp.minimum(best_t[ray], t_max[ray])
        # NaN boxes (missing children) fail both comparisons
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= cap_t) & pv[pj]

        isleaf = (enc & 1) == 1
        cptr = jax.lax.shift_right_logical(enc, 1)

        # ---- leaf pairs: compact then dense 4-tri Moller-Trumbore ------
        (lr, lp), ln = _compact(hit & isleaf, (ray, cptr), leaf_cap)
        overflow = overflow | (ln > leaf_cap)
        lvalid = jnp.arange(leaf_cap, dtype=jnp.int32) < ln
        tri_tests = tri_tests.at[lr].add(
            jnp.where(lvalid, fs.leaf_count[lp], 0)
        )

        jj = jnp.arange(leaf_cap * 4, dtype=jnp.int32)
        lj = jax.lax.shift_right_logical(jj, 2)      # jj // 4
        kk = jj & 3
        ray4 = lr[lj]
        leaf4 = lp[lj]
        slot = jnp.clip(fs.leaf_first[leaf4] + kk, 0, num_tris - 1)
        kval = (kk < fs.leaf_count[leaf4]) & lvalid[lj]

        # Moller-Trumbore, same arithmetic as core/geometry.py
        rdx, rdy, rdz = dx[ray4], dy[ray4], dz[ray4]
        te2x, te2y, te2z = e2x[slot], e2y[slot], e2z[slot]
        pvx = rdy * te2z - rdz * te2y
        pvy = rdz * te2x - rdx * te2z
        pvz = rdx * te2y - rdy * te2x
        det = e1x[slot] * pvx + e1y[slot] * pvy + e1z[slot] * pvz
        parallel = jnp.abs(det) < MT_DET_EPS
        idet = 1.0 / jnp.where(parallel, 1.0, det)
        tvx = ox[ray4] - v0x[slot]
        tvy = oy[ray4] - v0y[slot]
        tvz = oz[ray4] - v0z[slot]
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * idet
        qvx = tvy * e1z[slot] - tvz * e1y[slot]
        qvy = tvz * e1x[slot] - tvx * e1z[slot]
        qvz = tvx * e1y[slot] - tvy * e1x[slot]
        v = (rdx * qvx + rdy * qvy + rdz * qvz) * idet
        t = (te2x * qvx + te2y * qvy + te2z * qvz) * idet
        mt_valid = (
            (~parallel)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= t_min[ray4]) & (t <= t_max[ray4])
            & kval
        )
        if query_mask != ALL_LAYERS:
            mt_valid = mt_valid & ((layers[slot] & qm) != 0)

        ft = jnp.where(mt_valid, t, _BIG)
        fslot = jnp.where(mt_valid, slot, _IMAX)

        # lexicographic (t, slot) fold — lowest slot wins exact-t ties,
        # matching the serial loop (triangle.h:93-102 + brute oracle)
        new_t = best_t.at[ray4].min(ft)
        cand = ft <= new_t[ray4]               # pairs tying the new best
        keep_old = best_t <= new_t             # previous best still ties
        if any_hit:
            best_slot = jnp.minimum(
                best_slot, best_slot.at[ray4].min(fslot)
            )
        else:
            slot_pool = jnp.where(keep_old, best_slot, _IMAX)
            new_slot = slot_pool.at[ray4].min(
                jnp.where(cand, fslot, _IMAX)
            )
            sel = cand & (fslot == new_slot[ray4]) & (fslot != _IMAX)
            tgt = jnp.where(sel, ray4, r)
            keep_uv = keep_old & (new_slot == best_slot)
            best_u = jnp.where(keep_uv, best_u, 0.0).at[tgt].set(
                u, mode="drop")
            best_v = jnp.where(keep_uv, best_v, 0.0).at[tgt].set(
                v, mode="drop")
            best_slot = new_slot
        best_t = new_t

        # ---- internal pairs -> next frontier ---------------------------
        if _lvl + 1 < fs.depth:
            (pr, pn), pcount = _compact(hit & ~isleaf, (ray, cptr), pair_cap)
            overflow = overflow | (pcount > pair_cap)
            pvalid = jnp.ones((pair_cap,), bool)

    found = best_slot != _IMAX
    gslot = jnp.where(found, best_slot, 0)
    d = rays.direction
    hits = Hits(
        t=jnp.where(found, best_t, T_MAX_DEFAULT),
        position=jnp.where(
            found[:, None],
            rays.origin + d * jnp.where(found, best_t, 0.0)[:, None],
            0.0,
        ),
        normal=jnp.zeros((r, 3), jnp.float32),  # gathered by the wrapper
        u=jnp.where(found, best_u, 0.0),
        v=jnp.where(found, best_v, 0.0),
        prim_id=jnp.where(found, gslot, NO_HIT),  # slot; wrapper maps to id
        hit_layers=jnp.zeros((r,), jnp.int32),
    )
    stats = RayStats(
        rays_cast=jnp.int32(r),
        tri_tests=jnp.sum(tri_tests.astype(jnp.float32)),
        bvh_nodes_visited=jnp.sum(nodes_visited),
        hits=jnp.sum(found.astype(jnp.int32)),
    )
    per_ray = {"tri_tests": tri_tests, "nodes_visited": nodes_visited}
    return hits, stats, found, overflow, per_ray


@jax.jit
def _finalize_hits(hits: Hits, found, tris: Triangles) -> Hits:
    """Map winning slots to prim ids / normals / layers (one gather set)."""
    gslot = jnp.where(found, hits.prim_id, 0).astype(jnp.int32)
    return hits.replace(
        normal=jnp.where(found[:, None], tris.normal[gslot], 0.0),
        prim_id=jnp.where(found, tris.prim_id[gslot], NO_HIT),
        hit_layers=jnp.where(found, tris.layers[gslot], 0),
    )


def cast_rays_frontier(
    rays: Rays,
    fs: FrontierScene,
    tris: Triangles,
    query_mask: int = ALL_LAYERS,
    any_hit: bool = False,
    pair_cap_factor: int = 4,
    leaf_cap_factor: int = 4,
    return_per_ray_stats: bool = False,
):
    """Cast a batch through the frontier backend.

    Returns (hits, stats, occluded[, per_ray_stats]).  On frontier/leaf
    list overflow the cast retries with doubled caps (a recompile) — never
    silently truncates.
    """
    n = int(rays.count)
    pf, lf_ = pair_cap_factor, leaf_cap_factor
    for _attempt in range(4):
        hits, stats, found, overflow, per_ray = _cast_frontier_jit(
            rays, fs, tris.layers, query_mask=int(query_mask),
            any_hit=bool(any_hit),
            pair_cap=pf * n, leaf_cap=lf_ * n,
        )
        if not bool(overflow):
            hits = _finalize_hits(hits, found, tris)
            if return_per_ray_stats:
                return hits, stats, found, per_ray
            return hits, stats, found
        pf, lf_ = pf * 2, lf_ * 2
    raise RuntimeError(
        f"frontier cast overflowed at pair_cap={pf}x, leaf_cap={lf_}x rays"
    )
