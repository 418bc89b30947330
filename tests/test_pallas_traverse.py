"""Pallas packet-traversal kernel tests (interpret mode on CPU).

Parity gate (SURVEY.md §7 stage 3): exact t/prim_id match vs the brute-force
oracle on real scenes.
"""

import numpy as np
import pytest

from messyerraytracer_tpu.core.brute import any_hit_brute, cast_rays_brute
from messyerraytracer_tpu.core.types import NO_HIT, make_rays
from messyerraytracer_tpu.kernels.traverse_pallas import cast_rays_wide
from messyerraytracer_tpu.kernels.wide import build_wide_scene
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.render.camera import CameraParams, generate_rays
from messyerraytracer_tpu.utils import meshes


def pallas_scene(tri_array, **kw):
    return build_scene_from_tri_array(tri_array, backend="pallas", **kw)


def random_rays(n, seed=0, extent=3.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


def assert_parity(hits, ref, rtol=1e-6):
    np.testing.assert_array_equal(
        np.asarray(hits.prim_id), np.asarray(ref.prim_id)
    )
    np.testing.assert_allclose(np.asarray(hits.t), np.asarray(ref.t), rtol=rtol)
    # u/v: same triangle, but the kernel's scalar-broadcast MT and the
    # oracle's broadcast MT fuse FMAs differently -> last-ulp noise
    np.testing.assert_allclose(np.asarray(hits.u), np.asarray(ref.u), atol=5e-5)
    np.testing.assert_allclose(np.asarray(hits.v), np.asarray(ref.v), atol=5e-5)


class TestPallasParity:
    def test_sphere_random_rays(self):
        scene = pallas_scene(meshes.uv_sphere(radius=1.0, rings=12, segments=24))
        rays = random_rays(512, seed=0)
        hits, stats = scene.cast_rays(rays)
        ref, _ = cast_rays_brute(rays, scene.tris)
        assert_parity(hits, ref)
        assert int(stats.bvh_nodes_visited) > 0

    def test_camera_rays_soup(self):
        soup = meshes.random_soup(1500, extent=5.0, tri_size=0.5, seed=3)
        scene = pallas_scene(soup)
        cam = CameraParams.look_at((0, 0, 14), (0, 0, 0), fov_degrees=70.0)
        rays = generate_rays(cam, 40, 30)  # 1200 rays -> 2 tiles w/ padding
        hits, stats = scene.cast_rays(rays)
        ref, _ = cast_rays_brute(rays, scene.tris)
        assert_parity(hits, ref)

    def test_non_tile_multiple_ray_count(self):
        scene = pallas_scene(meshes.uv_sphere(radius=1.0, rings=8, segments=16))
        rays = random_rays(37, seed=5)  # heavy padding path
        hits, _ = scene.cast_rays(rays)
        ref, _ = cast_rays_brute(rays, scene.tris)
        assert_parity(hits, ref)

    def test_tiny_scene_root_leaf(self):
        # <=4 tris -> BVH root is a leaf -> synthesized wide node path.
        v = np.float32(
            [
                [[-1, -1, -5], [1, -1, -5], [0, 1, -5]],
                [[-1, -1, -8], [1, -1, -8], [0, 1, -8]],
            ]
        )
        scene = pallas_scene(v)
        rays = make_rays((0, 0, 0), (0, 0, -1))
        hits, _ = scene.cast_rays(rays)
        assert int(hits.prim_id[0]) == 0
        assert float(hits.t[0]) == pytest.approx(5.0, abs=1e-5)

    def test_layer_mask(self):
        soup = meshes.random_soup(256, extent=3.0, tri_size=0.5, seed=7)
        layers = (np.arange(256) % 2 + 1).astype(np.int32)
        scene = pallas_scene(soup, layers=layers)
        rays = random_rays(128, seed=9)
        for mask in (0b01, 0b10):
            hits, _ = scene.cast_rays(rays, query_mask=mask)
            ref, _ = cast_rays_brute(rays, scene.tris, query_mask=mask)
            np.testing.assert_array_equal(
                np.asarray(hits.prim_id), np.asarray(ref.prim_id)
            )
            # masked-out layers never reported
            got = np.asarray(hits.hit_layers)
            assert np.all((got[np.asarray(hits.hit)] & mask) != 0)

    def test_any_hit(self):
        scene = pallas_scene(meshes.uv_sphere(radius=1.0, rings=8, segments=16))
        rays = random_rays(256, seed=11)
        occ = scene.any_hit_rays(rays)
        ref = any_hit_brute(rays, scene.tris)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))

    def test_t_bounds(self):
        scene = pallas_scene(meshes.uv_sphere(radius=1.0, rings=8, segments=16))
        rays = make_rays((0, 0, 4), (0, 0, -1), t_max=2.0)
        hits, _ = scene.cast_rays(rays)
        assert int(hits.prim_id[0]) == NO_HIT

    def test_culling_efficiency(self):
        # Coherent rays through a big soup: packet traversal shares leaf
        # visits across each 1024-ray tile, so per-ray tri tests are higher
        # than per-ray traversal (test_bvh covers that) but must still cull
        # the vast majority of the scene vs brute force.
        from messyerraytracer_tpu.dispatch.morton import (
            raster_block_permutation,
        )
        from messyerraytracer_tpu.dispatch.morton import apply_permutation

        soup = meshes.random_soup(8000, extent=8.0, tri_size=0.3, seed=13)
        scene = pallas_scene(soup)
        cam = CameraParams.look_at((0, 0, 22), (0, 0, 0), fov_degrees=60.0)
        rays = generate_rays(cam, 64, 64)
        perm = raster_block_permutation(64, 64, 32)
        rays = apply_permutation(rays, perm)
        hits, stats = scene.cast_rays(rays)
        ref, _ = cast_rays_brute(rays, scene.tris)
        assert_parity(hits, ref)
        frac = int(stats.tri_tests) / (rays.count * scene.num_tris)
        assert frac < 0.5


class TestColumnarLayouts:
    """Columnar and quantized-columnar megakernel layouts must be
    result-identical to the row layout (t/prim exact vs the oracle)."""

    @pytest.mark.parametrize("mode", [True, "q", "leaf"])
    def test_parity_vs_brute(self, mode):
        # near-flat terrain exercises the quantizer's conservativeness
        # margin for small-extent/large-coordinate nodes
        g = meshes.plane(40.0, y=0.0, subdiv=24)
        g[:, :, 1] = (np.sin(g[:, :, 0] * 0.6)
                      * np.cos(g[:, :, 2] * 0.5)) * 1.5
        tris = np.concatenate(
            [g, meshes.uv_sphere(2.0, 8, 16, center=(0, 4, 0))]
        )
        scene = pallas_scene(tris)
        cam = CameraParams.look_at((0, 10, 22), (0, 1, 0), fov_degrees=60)
        rays = generate_rays(cam, 48, 32)
        ref, _ = cast_rays_brute(rays, scene.tris)
        hits, _, _ = cast_rays_wide(rays, scene.wide, columnar=mode)
        # rtol 1e-5: the columnar MT uses (1,128) operands, fusing FMAs
        # differently from the oracle's broadcast MT (last-ulp noise)
        assert_parity(hits, ref, rtol=1e-5)


class TestStreamingModes:
    """HBM-streaming kernel modes, forced on small scenes so CPU interpret
    mode can cover them (naturally they only engage beyond ~15 MB of scene
    arrays)."""

    def _scene_and_rays(self):
        scene = pallas_scene(meshes.uv_sphere(radius=1.0, rings=10, segments=20))
        rays = random_rays(512, seed=31)
        ref, _ = cast_rays_brute(rays, scene.tris)
        return scene, rays, ref

    def test_stream_leaves_parity(self):
        from messyerraytracer_tpu.kernels.traverse_pallas import cast_rays_wide

        scene, rays, ref = self._scene_and_rays()
        hits, _, _ = cast_rays_wide(rays, scene.wide, stream_leaves=True)
        assert_parity(hits, ref)

    def test_stream_all_parity(self):
        from messyerraytracer_tpu.kernels.traverse_pallas import cast_rays_wide

        scene, rays, ref = self._scene_and_rays()
        hits, _, _ = cast_rays_wide(
            rays, scene.wide, stream_leaves=True, stream_nodes=True
        )
        assert_parity(hits, ref)

    def test_routing_tiers(self):
        import messyerraytracer_tpu.scene.scene as SC

        old = SC._WIDE_VMEM_BUDGET
        try:
            # tiny budget: force full-streaming; still pallas, still correct
            SC._WIDE_VMEM_BUDGET = 1024  # smaller than any real scene
            scene = pallas_scene(
                meshes.uv_sphere(radius=1.0, rings=10, segments=20)
            )
            assert scene.backend == "pallas"
            assert scene.wide.stream_leaves and scene.wide.stream_nodes
            rays = random_rays(256, seed=37)
            hits, _ = scene.cast_rays(rays)
            ref, _ = cast_rays_brute(rays, scene.tris)
            assert_parity(hits, ref)
        finally:
            SC._WIDE_VMEM_BUDGET = old
