"""MXU cluster-traversal kernel tests (interpret mode on CPU).

Parity gate: t/prim_id match vs the brute-force oracle — the same gate the
packet kernel passes (SURVEY.md §7 stage 3).  In interpret mode the matmul
is exact f32, so parity is exact; on TPU the bf16x6 MXU emulation keeps t
within ~1e-6 relative (documented in kernels/cluster.py).
"""

import numpy as np
import pytest

from messyerraytracer_tpu.accel.bvh import build_bvh
from messyerraytracer_tpu.core.brute import any_hit_brute, cast_rays_brute
from messyerraytracer_tpu.core.types import NO_HIT, make_rays, make_triangles
from messyerraytracer_tpu.kernels.cluster import (
    build_cluster_scene,
    cast_rays_cluster,
    cluster_cut,
)
from messyerraytracer_tpu.render.camera import CameraParams, generate_rays
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes


def cluster_scene(tri_array, tcap=64):
    base = build_scene_from_tri_array(tri_array, backend="jnp")
    return base, build_cluster_scene(base.bvh, base.tris, tcap=tcap)


def random_rays(n, seed=0, extent=3.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


def assert_parity(hits, ref, rtol=1e-5):
    np.testing.assert_array_equal(
        np.asarray(hits.prim_id), np.asarray(ref.prim_id)
    )
    hit = np.asarray(ref.prim_id) != NO_HIT
    np.testing.assert_allclose(
        np.asarray(hits.t)[hit], np.asarray(ref.t)[hit], rtol=rtol
    )
    np.testing.assert_allclose(np.asarray(hits.u), np.asarray(ref.u),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(hits.v), np.asarray(ref.v),
                               atol=5e-5)


class TestClusterCut:
    def test_partition_covers_all_slots(self):
        soup = meshes.random_soup(3000, extent=5.0, tri_size=0.4, seed=1)
        bvh = build_bvh(soup[:, 0], soup[:, 1], soup[:, 2])
        h = bvh.host
        for tcap in (16, 64, 128):
            roots, first, cnt = cluster_cut(h["left_first"], h["count"],
                                            tcap)
            assert cnt.max() <= tcap
            # DFS order => ascending contiguous ranges partitioning [0, N)
            assert first[0] == 0
            np.testing.assert_array_equal(first[1:], (first + cnt)[:-1])
            assert first[-1] + cnt[-1] == 3000


class TestClusterParity:
    def test_sphere_random_rays(self):
        base, cs = cluster_scene(
            meshes.uv_sphere(radius=1.0, rings=12, segments=24)
        )
        rays = random_rays(512, seed=0)
        hits, stats, _ = cast_rays_cluster(rays, cs)
        ref, _ = cast_rays_brute(rays, base.tris)
        assert_parity(hits, ref)
        assert int(stats.bvh_nodes_visited) > 0
        assert float(stats.tri_tests) > 0

    def test_camera_rays_soup(self):
        soup = meshes.random_soup(1500, extent=5.0, tri_size=0.5, seed=3)
        base, cs = cluster_scene(soup)
        cam = CameraParams.look_at((0, 0, 14), (0, 0, 0), fov_degrees=70.0)
        rays = generate_rays(cam, 40, 30)
        hits, _, _ = cast_rays_cluster(rays, cs)
        ref, _ = cast_rays_brute(rays, base.tris)
        assert_parity(hits, ref)

    def test_small_tcap_and_padding(self):
        base, cs = cluster_scene(
            meshes.uv_sphere(radius=1.0, rings=8, segments=16), tcap=16
        )
        rays = random_rays(37, seed=5)  # heavy ray-padding path
        hits, _, _ = cast_rays_cluster(rays, cs)
        ref, _ = cast_rays_brute(rays, base.tris)
        assert_parity(hits, ref)

    def test_far_scene_conditioning(self):
        # cluster far from the origin AND the camera: exercises the
        # anchor/closest-approach re-centering (raw Plucker would lose
        # several digits here)
        sph = meshes.uv_sphere(radius=1.0, rings=10, segments=20)
        sph = sph + np.float32([80.0, -40.0, 60.0])
        base, cs = cluster_scene(sph)
        cam = CameraParams.look_at((0, 0, 0), (80, -40, 60),
                                   fov_degrees=10.0)
        rays = generate_rays(cam, 32, 24)
        hits, _, _ = cast_rays_cluster(rays, cs)
        ref, _ = cast_rays_brute(rays, base.tris)
        np.testing.assert_array_equal(
            np.asarray(hits.prim_id), np.asarray(ref.prim_id)
        )
        hit = np.asarray(ref.prim_id) != NO_HIT
        assert hit.any()
        np.testing.assert_allclose(
            np.asarray(hits.t)[hit], np.asarray(ref.t)[hit], rtol=1e-5
        )

    def test_tiny_scene_root_cluster(self):
        v = np.float32(
            [
                [[-1, -1, -5], [1, -1, -5], [0, 1, -5]],
                [[-1, -1, -8], [1, -1, -8], [0, 1, -8]],
            ]
        )
        base, cs = cluster_scene(v)
        rays = make_rays((0, 0, 0), (0, 0, -1))
        hits, _, _ = cast_rays_cluster(rays, cs)
        assert int(hits.prim_id[0]) == 0
        assert float(hits.t[0]) == pytest.approx(5.0, abs=1e-5)

    def test_miss_returns_no_hit(self):
        base, cs = cluster_scene(
            meshes.uv_sphere(radius=1.0, rings=8, segments=16)
        )
        rays = make_rays((0, 0, 4), (0, 0, 1))  # away from the sphere
        hits, _, _ = cast_rays_cluster(rays, cs)
        assert int(hits.prim_id[0]) == NO_HIT


class TestClusterAnyHitAndMask:
    def test_any_hit_matches_brute(self):
        base, cs = cluster_scene(
            meshes.uv_sphere(radius=1.0, rings=10, segments=20)
        )
        rays = random_rays(300, seed=2)
        _, _, occ = cast_rays_cluster(rays, cs, any_hit=True)
        ref = any_hit_brute(rays, base.tris)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))

    def test_layer_mask(self):
        # near tri on layer 1, far tri on layer 2: masking layer 1 must
        # return the far tri (filter-during-traversal, ray_scene.h:124)
        v = np.float32(
            [
                [[-1, -1, -5], [1, -1, -5], [0, 1, -5]],
                [[-1, -1, -8], [1, -1, -8], [0, 1, -8]],
            ]
        )
        base = build_scene_from_tri_array(v, layers=np.int32([1, 2]),
                                          backend="jnp")
        cs = build_cluster_scene(base.bvh, base.tris)
        rays = make_rays((0, 0, 0), (0, 0, -1))
        hits, _, _ = cast_rays_cluster(rays, cs, query_mask=2)
        assert int(hits.prim_id[0]) == 1
        assert float(hits.t[0]) == pytest.approx(8.0, abs=1e-4)
        ref, _ = cast_rays_brute(rays, base.tris, query_mask=2)
        assert int(ref.prim_id[0]) == 1


class TestClusterRefit:
    def test_refresh_after_move(self):
        from messyerraytracer_tpu.kernels.cluster import (
            refresh_cluster_scene,
        )
        from messyerraytracer_tpu.accel.bvh import refit_bvh
        from messyerraytracer_tpu.core.geometry import aabb_of_triangles

        sph = meshes.uv_sphere(radius=1.0, rings=10, segments=20)
        base, cs = cluster_scene(sph)
        moved = sph + np.float32([0.5, 0.0, -2.0])
        perm = np.asarray(base.bvh.tri_order)
        mv = moved[perm]
        tris2 = make_triangles(
            mv[:, 0], mv[:, 1], mv[:, 2],
            prim_id=base.tris.prim_id, layers=base.tris.layers,
        )
        tmin, tmax = aabb_of_triangles(tris2.v0, tris2.v1, tris2.v2)
        bvh2 = refit_bvh(base.bvh, tmin, tmax)
        cs2 = refresh_cluster_scene(cs, bvh2, tris2)
        rays = random_rays(256, seed=9)
        hits, _, _ = cast_rays_cluster(rays, cs2)
        ref, _ = cast_rays_brute(rays, tris2)
        assert_parity(hits, ref)
