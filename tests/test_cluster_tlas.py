"""Instanced cluster-TLAS tests (interpret mode on CPU).

Parity oracle: flatten every instance's triangles to world space and
brute-force cast — the reference's own validation move
(scene_tlas.h:345-379 brute fallback).  Hits must agree on
(instance_id, per-mesh prim_id) with world-space t within transform
rounding.
"""

import numpy as np
import pytest

from messyerraytracer_tpu.core.brute import cast_rays_brute
from messyerraytracer_tpu.core.types import NO_HIT, make_rays, make_triangles
from messyerraytracer_tpu.kernels.cluster_tlas import (
    build_cluster_tlas,
    cast_rays_cluster_tlas,
    set_transforms,
)
from messyerraytracer_tpu.utils import meshes


def xform(translate=(0, 0, 0), scale=1.0, rot_y=0.0):
    c, s = np.cos(rot_y), np.sin(rot_y)
    r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]) * scale
    m = np.zeros((3, 4), np.float32)
    m[:, :3] = r
    m[:, 3] = translate
    return m


def world_flatten(mesh_tris, instances):
    """Flatten instances to world triangles + (inst, prim) maps."""
    out, inst_of, prim_of = [], [], []
    for i, (m, t) in enumerate(instances):
        tri = np.asarray(mesh_tris[m], np.float32)       # (T,3,3)
        r, tr = t[:, :3], t[:, 3]
        w = tri @ r.T + tr
        out.append(w.astype(np.float32))
        inst_of.append(np.full(len(tri), i, np.int32))
        prim_of.append(np.arange(len(tri), dtype=np.int32))
    return (np.concatenate(out), np.concatenate(inst_of),
            np.concatenate(prim_of))


def random_rays(n, seed=0, extent=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return make_rays(o, d)


def assert_tlas_parity(hits, inst_id, flat_hits, inst_of, prim_of,
                       rtol=2e-4):
    got_prim = np.asarray(hits.prim_id)
    got_inst = np.asarray(inst_id)
    ref_flat = np.asarray(flat_hits.prim_id)
    ref_hit = ref_flat != NO_HIT
    safe = np.where(ref_hit, ref_flat, 0)
    exp_prim = np.where(ref_hit, prim_of[safe], NO_HIT).astype(np.int32)
    exp_inst = np.where(ref_hit, inst_of[safe], -1)
    np.testing.assert_array_equal(got_prim, exp_prim)
    np.testing.assert_array_equal(got_inst, exp_inst)
    np.testing.assert_allclose(
        np.asarray(hits.t)[ref_hit], np.asarray(flat_hits.t)[ref_hit],
        rtol=rtol, atol=1e-5,  # atol: near-zero t has no relative scale
    )


SCENE_MESHES = None
SCENE_INST = None


def scene():
    global SCENE_MESHES, SCENE_INST
    if SCENE_MESHES is None:
        SCENE_MESHES = [
            meshes.uv_sphere(1.0, 8, 16),
            meshes.box((1.0, 2.0, 1.0)),
        ]
        SCENE_INST = [
            (0, xform((0, 0, 0))),
            (0, xform((3, 0.5, -1), scale=0.5)),
            (1, xform((-3, 0, 0), rot_y=0.7)),
            (1, xform((0, -2.5, 2), scale=1.5, rot_y=-0.3)),
            (0, xform((-1, 3, -3), scale=2.0, rot_y=1.1)),
        ]
    return SCENE_MESHES, SCENE_INST


class TestClusterTLAS:
    def test_parity_random_rays(self):
        ms, inst = scene()
        ct = build_cluster_tlas(ms, inst, tcap=32)
        rays = random_rays(512, seed=0)
        hits, stats, _, inst_id = cast_rays_cluster_tlas(rays, ct)
        flat, inst_of, prim_of = world_flatten(ms, inst)
        tris = make_triangles(flat[:, 0], flat[:, 1], flat[:, 2])
        ref, _ = cast_rays_brute(rays, tris)
        assert_tlas_parity(hits, inst_id, ref, inst_of, prim_of)
        assert int(stats.hits) > 0

    def test_world_normals(self):
        # a scaled+rotated sphere instance must report outward world
        # normals (inverse-transpose mapping, blas_instance.h:62-70)
        ms = [meshes.uv_sphere(1.0, 10, 20)]
        inst = [(0, xform((5, 0, 0), scale=3.0, rot_y=0.9))]
        ct = build_cluster_tlas(ms, inst)
        # slightly off the symmetry axis: the exact axis ray grazes a
        # seam edge where accept/reject is FP-boundary ambiguous
        rays = make_rays((5.2, 0.3, 10), (0, 0, -1))
        hits, _, _, iid = cast_rays_cluster_tlas(rays, ct)
        assert int(iid[0]) == 0
        n = np.asarray(hits.normal[0])
        assert abs(np.linalg.norm(n) - 1.0) < 1e-4
        assert n[2] > 0.8  # facing the camera

    def test_any_hit(self):
        ms, inst = scene()
        ct = build_cluster_tlas(ms, inst, tcap=32)
        rays = random_rays(300, seed=3)
        _, _, occ, _ = cast_rays_cluster_tlas(rays, ct, any_hit=True)
        flat, _, _ = world_flatten(ms, inst)
        tris = make_triangles(flat[:, 0], flat[:, 1], flat[:, 2])
        ref, _ = cast_rays_brute(rays, tris)
        np.testing.assert_array_equal(
            np.asarray(occ), np.asarray(ref.prim_id) != NO_HIT
        )

    def test_set_transforms_refit(self):
        ms, inst = scene()
        ct = build_cluster_tlas(ms, inst, tcap=32)
        moved = [
            xform((1, 1, 1)),
            xform((4, -0.5, 2), scale=0.75, rot_y=0.4),
            xform((-2, 1, -1), rot_y=1.5),
            xform((0, -1.5, 3), scale=1.2),
            xform((-2, 2, -4), scale=1.8, rot_y=2.0),
        ]
        ct2 = set_transforms(ct, moved)
        rays = random_rays(512, seed=7)
        hits, _, _, inst_id = cast_rays_cluster_tlas(rays, ct2)
        inst2 = [(m, t) for (m, _), t in zip(inst, moved)]
        flat, inst_of, prim_of = world_flatten(ms, inst2)
        tris = make_triangles(flat[:, 0], flat[:, 1], flat[:, 2])
        ref, _ = cast_rays_brute(rays, tris)
        assert_tlas_parity(hits, inst_id, ref, inst_of, prim_of)

    def test_shared_mesh_memory(self):
        # 64 instances of one mesh: slabs must not grow with instances
        ms = [meshes.uv_sphere(1.0, 8, 16)]
        one = build_cluster_tlas(ms, [(0, xform())])
        rng = np.random.default_rng(1)
        many_inst = [
            (0, xform(tuple(rng.uniform(-20, 20, 3)),
                      scale=float(rng.uniform(0.5, 2.0)),
                      rot_y=float(rng.uniform(0, 6))))
            for _ in range(64)
        ]
        many = build_cluster_tlas(ms, many_inst)
        assert many.ablocks.shape == one.ablocks.shape
        rays = random_rays(256, seed=5, extent=22.0)
        hits, _, _, inst_id = cast_rays_cluster_tlas(rays, many)
        flat, inst_of, prim_of = world_flatten(ms, many_inst)
        tris = make_triangles(flat[:, 0], flat[:, 1], flat[:, 2])
        ref, _ = cast_rays_brute(rays, tris)
        assert_tlas_parity(hits, inst_id, ref, inst_of, prim_of)
