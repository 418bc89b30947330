"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from messyerraytracer_tpu.core.types import make_rays
from messyerraytracer_tpu.parallel.sharding import (
    cast_rays_sharded,
    make_mesh,
    render_step_sharded,
)
from messyerraytracer_tpu.render.camera import CameraParams
from messyerraytracer_tpu.render.shade import make_environment, make_lights
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes


@pytest.fixture(scope="module")
def scene():
    return build_scene_from_tri_array(
        meshes.uv_sphere(radius=1.0, rings=8, segments=16)
    )


def random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


class TestShardedCast:
    def test_eight_device_mesh_available(self):
        assert len(jax.devices()) >= 8  # conftest virtual devices

    def test_sharded_matches_single_chip(self, scene):
        mesh = make_mesh(8)
        rays = random_rays(4096, seed=1)
        hits_s, stats_s, _ = cast_rays_sharded(rays, scene, mesh)
        hits_1, stats_1 = scene.cast_rays(rays)
        np.testing.assert_array_equal(
            np.asarray(hits_s.prim_id), np.asarray(hits_1.prim_id)
        )
        np.testing.assert_allclose(
            np.asarray(hits_s.t), np.asarray(hits_1.t), rtol=1e-6
        )
        # psum-merged stats: hit counts are exact invariants; tri_tests
        # is an order-dependent WORK counter (drain order differs with
        # tile composition, so cap culling differs) — same ballpark only
        assert int(stats_s.hits) == int(stats_1.hits)
        assert 0 < int(stats_s.tri_tests) < 4 * int(stats_1.tri_tests)

    def test_non_divisible_ray_count(self, scene):
        mesh = make_mesh(8)
        rays = random_rays(1000, seed=2)  # not divisible by 8*1024
        hits_s, stats_s, _ = cast_rays_sharded(rays, scene, mesh)
        hits_1, _ = scene.cast_rays(rays)
        np.testing.assert_array_equal(
            np.asarray(hits_s.prim_id), np.asarray(hits_1.prim_id)
        )
        assert int(stats_s.rays_cast) == 1000

    def test_any_hit_sharded(self, scene):
        mesh = make_mesh(8)
        rays = random_rays(2048, seed=3)
        _, _, occ_s = cast_rays_sharded(rays, scene, mesh, any_hit=True)
        occ_1 = scene.any_hit_rays(rays)
        np.testing.assert_array_equal(np.asarray(occ_s), np.asarray(occ_1))


class TestShardedRenderStep:
    def test_full_step_compiles_and_runs(self, scene):
        mesh = make_mesh(8)
        cam = CameraParams.look_at((0, 0, 4), (0, 0, 0), fov_degrees=60)
        lights = make_lights(
            [{"type": 0, "direction": (0.3, 1, 0.4), "energy": 1.0}]
        )
        img = render_step_sharded(
            scene, cam, 128, 64, mesh, lights=lights,
            env=make_environment(), max_bounces=1,
        )
        arr = np.asarray(img)
        assert arr.shape == (128 * 64, 3)
        assert np.isfinite(arr).all()
        assert arr.mean() > 0.0


class TestSceneSharded:
    """Scene-parallel axis: triangles partitioned over the mesh, rays
    replicated, closest hit combined over the collective axis."""

    def test_matches_single_scene(self):
        from messyerraytracer_tpu.parallel.sharding import (
            build_sharded_scene,
            cast_rays_scene_sharded,
        )

        tris = np.concatenate([
            meshes.uv_sphere(1.0, 8, 16, center=(-1.5, 0, 0)),
            meshes.uv_sphere(0.7, 8, 16, center=(1.5, 0.3, 0)),
            meshes.plane(8.0, y=-1.2, subdiv=6),
        ])
        # apples-to-apples: the scene-parallel axis runs the wide kernel
        single = build_scene_from_tri_array(tris, backend="pallas")
        mesh = make_mesh(8)
        stacked, meta, id_maps = build_sharded_scene(tris, 8)
        rays = random_rays(1024, seed=7)
        hits_s, stats_s = cast_rays_scene_sharded(
            rays, stacked, meta, id_maps, mesh
        )
        hits_1, _ = single.cast_rays(rays)
        np.testing.assert_array_equal(
            np.asarray(hits_s.prim_id), np.asarray(hits_1.prim_id)
        )
        np.testing.assert_allclose(
            np.asarray(hits_s.t), np.asarray(hits_1.t), rtol=1e-6
        )
        assert int(stats_s.hits) == int(np.asarray(hits_1.hit).sum())

    def test_shard_memory_is_partitioned(self):
        from messyerraytracer_tpu.parallel.sharding import (
            build_sharded_scene,
        )

        tris = meshes.uv_sphere(1.0, 16, 32)
        stacked, meta, id_maps = build_sharded_scene(tris, 8)
        # each shard's leaf table holds ~1/8 of the triangles
        single = build_scene_from_tri_array(tris, backend="pallas")
        per_shard_rows = stacked["leaf_tris"].shape[1]
        single_rows = single.wide.leaf_tris.shape[0]
        assert per_shard_rows < single_rows / 2
