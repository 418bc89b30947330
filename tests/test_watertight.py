"""Watertightness + traversal-stack regression tests (VERDICT r4 #1).

The round-4 ``parity_2m: false`` regression was NOT a stack overflow
(measured worst-case need at 2M tris = 35 < KSTACK = 64): it was a
shared-edge crack — the cluster kernels' anchored precomputed-plane MT
rounds an edge function differently from the classic Moller-Trumbore
oracle, so an exactly edge-on hit computed v = -1.9e-7 and fell in
NEITHER neighbor triangle.  Fixes under test here:

  * MT_BARY_EPS acceptance band in the anchored dense phases
    (kernels/cluster.py, cluster_v2.py) — interior-edge watertight;
  * build-time worst-case stack bound (``ClusterScene.stack_need``,
    cluster.py::_wide_stack_need) sizing the kernel SMEM stack
    statically (``cluster_v2._kstack_for``);
  * an in-kernel drop counter (``RayStats.stack_drops``) so a stack
    drop can never again silently pass a bench.

Reference behavior: TinyBVH traverses until its stack empties
(thirdparty/tinybvh/tiny_bvh.h Intersect) — it has no drop path at all.
"""

import numpy as np
import pytest

from messyerraytracer_tpu.core.brute import cast_rays_brute
from messyerraytracer_tpu.core.types import NO_HIT, make_rays
from messyerraytracer_tpu.kernels.cluster import (
    KSTACK,
    _wide_stack_need,
    build_cluster_scene,
    cast_rays_cluster,
)
from messyerraytracer_tpu.kernels import cluster_v2 as cv2
from messyerraytracer_tpu.kernels.cluster_v2 import (
    _kstack_for,
    cast_rays_cluster_v2,
)
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes


def wavy_scene(subdiv=16, tcap=16):
    g = meshes.plane(10.0, y=0.0, subdiv=subdiv)
    g[:, :, 1] = (np.sin(g[:, :, 0] * 0.7)
                  * np.cos(g[:, :, 2] * 0.6)) * 1.5
    base = build_scene_from_tri_array(g, backend="pallas")
    cs = build_cluster_scene(base.bvh, base.tris, tcap=tcap)
    return g, base, cs


def shared_edge_points(tris, per_edge=4, max_edges=160):
    """Sample points ON interior (shared) triangle edges, f64 then f32.

    Edge-on rays are exactly the crack population: in exact arithmetic
    the hit lies in both neighbors; a non-watertight kernel can round it
    into neither."""
    quant = {}
    for i, t in enumerate(tris):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = tuple(sorted(
                (tuple(np.round(t[a], 5)), tuple(np.round(t[b], 5)))))
            quant.setdefault(key, []).append((i, t[a], t[b]))
    pts = []
    for key, owners in quant.items():
        if len(owners) < 2:
            continue                      # boundary edge: silhouette
        _, va, vb = owners[0]
        for s in np.linspace(0.15, 0.85, per_edge):
            pts.append(va.astype(np.float64) * (1 - s)
                       + vb.astype(np.float64) * s)
        if len(pts) >= max_edges * per_edge:
            break
    return np.asarray(pts, np.float64)


class TestWatertight:
    def test_edge_on_rays_no_cracks(self):
        """Rays aimed exactly at interior shared edges: wherever the
        oracle reports a hit, the cluster kernel must too (either
        neighbor is a correct closest hit), with t matching closely.
        This is the 2M parity failure shrunk to an interpret-mode
        scene: before the MT_BARY_EPS fix, edge-on hits could round
        into neither neighbor and return a MISS."""
        g, base, cs = wavy_scene()
        pts = shared_edge_points(np.asarray(g, np.float64))
        assert len(pts) >= 200
        origin = np.float64([0.3, 9.0, 11.0])
        d = pts - origin
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = make_rays(np.tile(origin.astype(np.float32), (len(pts), 1)),
                         d.astype(np.float32))
        hb, _ = cast_rays_brute(rays, base.tris)
        h2, s2, _ = cast_rays_cluster_v2(rays, cs)
        pb = np.asarray(hb.prim_id)
        p2 = np.asarray(h2.prim_id)
        tb = np.asarray(hb.t)
        t2 = np.asarray(h2.t)
        oracle_hit = pb != NO_HIT
        assert oracle_hit.sum() >= 100
        # no cracks: kernel never misses where the oracle hits
        cracks = oracle_hit & (p2 == NO_HIT)
        assert cracks.sum() == 0, f"crack rays: {np.nonzero(cracks)[0]}"
        np.testing.assert_allclose(t2[oracle_hit], tb[oracle_hit],
                                   rtol=1e-4)
        # kernel may resolve a tie to the OTHER neighbor; t must agree
        # to formulation rounding (bench.py parity TIE_RTOL)
        swapped = oracle_hit & (p2 != pb)
        assert np.all(np.abs(t2[swapped] - tb[swapped])
                      <= 4e-6 * np.maximum(np.abs(tb[swapped]), 1.0))
        # v1 shares the dense phase and must stay watertight too
        h1, _, _ = cast_rays_cluster(rays, cs)
        assert ((np.asarray(h1.prim_id) == NO_HIT) & oracle_hit).sum() == 0
        assert int(s2.stack_drops) == 0

    def test_stack_need_bounds_exact_traversal(self):
        """cs.stack_need upper-bounds the EXACT transient stack peak of
        the kernel's push/pop discipline in BOTH direction-sign push
        orders, on a real built upper tree."""
        _, base, cs = wavy_scene(subdiv=24, tcap=8)
        # rebuild host-side wide tree exactly as build_cluster_scene
        from messyerraytracer_tpu.kernels.cluster import cluster_cut
        from messyerraytracer_tpu.kernels.wide import _collapse8

        host = base.bvh.host
        amin, amax = host["aabb_min"], host["aabb_max"]
        lf, cnt = host["left_first"], host["count"]
        roots, _, _ = cluster_cut(lf, cnt, cs.tcap)
        is_cluster = np.zeros(len(cnt), bool)
        is_cluster[roots] = True
        ucnt = np.where(is_cluster, 1, 0).astype(np.int32)
        children, _ = _collapse8(amin, amax, lf, ucnt)
        children = np.asarray(children, np.int32)
        present = children >= 0
        ck = np.where(present, children, 0)
        internal_kid = present & ~is_cluster[ck]
        bound = _wide_stack_need(children, internal_kid)
        assert bound == cs.stack_need

        kid_rows = children[internal_kid]
        wide_row_of = {int(b): i + 1 for i, b in enumerate(kid_rows)}

        def exact_peak(reverse):
            peak, sp = 1, 1
            stack = [0]
            while stack:
                w = stack.pop()
                sp -= 1
                kids = [wide_row_of[int(b)]
                        for j, b in enumerate(children[w])
                        if internal_kid[w, j]]
                if reverse:
                    kids = kids[::-1]
                for kw in kids:
                    stack.append(kw)
                    sp += 1
                    peak = max(peak, sp)
            return peak

        assert exact_peak(False) <= bound
        assert exact_peak(True) <= bound

    def test_stack_need_synthetic_deep_comb(self):
        """A synthetic comb tree (every wide node = 2 internal kids)
        needs depth+1 stack entries — build one 100 levels deep and
        check the bound exceeds the historical KSTACK and that
        _kstack_for sizes the kernel stack above it (the old kernel
        would silently drop pushes here)."""
        depth = 100
        nw = 2 * depth + 1
        children = np.full((nw, 8), -1, np.int64)
        internal = np.zeros((nw, 8), bool)
        # comb: chain rows 0,2,4,... each with TWO internal kids (a
        # dead-end + the next chain node), so every level leaves one
        # sibling on the stack -> need = depth + 1.  Kid binary ids are
        # assigned in row-major flatten order to match _wide_stack_need's
        # wide_row_of mapping (kid at flatten position j -> row j+1).
        nid = 0
        for i in range(depth):
            w = 2 * i
            children[w, 0] = nid          # -> row 2i+1 (dead end)
            children[w, 1] = nid + 1      # -> row 2i+2 (chain)
            nid += 2
            internal[w, 0] = internal[w, 1] = True
        need = _wide_stack_need(children, internal)
        assert need > KSTACK
        assert need <= depth + 2
        assert _kstack_for(need, 1) >= need + 2
        assert _kstack_for(need, 2) >= need + 10

    def test_stack_drop_counter_not_silent(self):
        """Force an undersized stack through the low-level entry point:
        the kernel must COUNT dropped pushes (pops_out lane 2 ->
        RayStats.stack_drops), never silently return wrong hits with a
        zero counter."""
        _, base, cs = wavy_scene(subdiv=20, tcap=8)
        assert cs.stack_need >= 3, "scene too shallow to force drops"
        rng = np.random.default_rng(0)
        o = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
        o[:, 1] = 6.0
        d = rng.normal(size=(256, 3)).astype(np.float32)
        d[:, 1] = -np.abs(d[:, 1]) - 0.5
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = make_rays(o, d)
        srows = 16
        num_tiles = cv2._bucket_tiles(rays.count, srows * 128)
        packed = cv2._pack_ray_fields(rays, num_tiles, srows, True)
        live = cv2._tile_liveness(rays, num_tiles, srows)
        _, _, pops = cv2._call_cluster_v2(
            packed, cs.nodes, cs.ablocks, live, any_hit=False,
            interpret=True, num_tiles=num_tiles, dummy_enc=cs.dummy_enc,
            srows=srows, tcap=cs.tcap, qd=4, kstack=1,
        )
        assert int(np.asarray(pops)[0, 2]) > 0
        # properly-sized cast on the same scene: zero drops, surfaced
        # through the public stats
        _, stats, _ = cast_rays_cluster_v2(rays, cs)
        assert int(stats.stack_drops) == 0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
