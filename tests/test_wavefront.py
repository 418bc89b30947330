"""Wavefront path tracer tests — protocol + statistical parity vs the
iterative tracer."""

import numpy as np
import jax.numpy as jnp

from messyerraytracer_tpu.render.camera import CameraParams, generate_rays
from messyerraytracer_tpu.render.pathtrace import PathTracer, PathTraceParams
from messyerraytracer_tpu.render.shade import (
    make_environment,
    make_lights,
    make_materials,
)
from messyerraytracer_tpu.render.wavefront import WavefrontPathTracer
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes


def setup_scene():
    tris = np.concatenate(
        [meshes.cornell_room(4.0),
         meshes.uv_sphere(0.8, 8, 16, center=(0, -1.2, 0))]
    )
    scene = build_scene_from_tri_array(tris, backend="brute")
    lights = make_lights(
        [
            {"type": 0, "direction": (0.3, 1.0, 0.5), "energy": 1.3},
            {"type": 1, "position": (1.0, 1.2, 1.0), "energy": 4.0,
             "range": 8.0},
        ]
    )
    env = make_environment()
    mats = make_materials([[0.7, 0.65, 0.6]])
    cam = CameraParams.look_at((0, 0, 5.4), (0, 0, 0), fov_degrees=60)
    rays = generate_rays(cam, 16, 12)
    return scene, lights, env, mats, rays


class TestWavefront:
    def test_frame_finite_and_lit(self):
        scene, lights, env, mats, rays = setup_scene()
        wf = WavefrontPathTracer(scene, lights, env, mats)
        img = np.asarray(wf.trace_frame(rays, max_bounces=2))
        assert img.shape == (192, 3)
        assert np.isfinite(img).all()
        assert img.min() >= 0.0
        assert img.mean() > 0.01

    def test_deferred_nee_shadowing(self):
        # Direct light through the deferred protocol must be <= the
        # unshadowed contribution and strictly less somewhere (the sphere
        # casts a shadow in the room).
        scene, lights, env, mats, rays = setup_scene()
        env0 = make_environment(
            sky_zenith=(0, 0, 0), sky_horizon=(0, 0, 0), sky_ground=(0, 0, 0),
            ambient_energy=0.0,
        )
        wf = WavefrontPathTracer(scene, lights, env0, mats)
        img = np.asarray(wf.trace_frame(rays, max_bounces=0))
        # single bounce, no sky/ambient: all energy is deferred-NEE direct
        # light resolved by Connect + finalize
        assert img.max() > 0.01  # lit somewhere
        # statistical sanity: not everything fully lit (shadow exists)
        assert (img.sum(axis=1) < 1e-5).sum() > 3

    def test_statistical_parity_vs_iterative(self):
        # Both integrators target the same estimator; their multi-sample
        # means must agree within Monte-Carlo noise.
        scene, lights, env, mats, rays = setup_scene()
        wf = WavefrontPathTracer(scene, lights, env, mats)
        it = PathTracer(scene, lights, env, mats)
        spp = 24
        acc_w = acc_i = None
        for s in range(spp):
            iw = np.asarray(wf.trace_frame(rays, max_bounces=2, sample_index=s))
            ii = np.asarray(
                it.trace_frame(PathTraceParams(16, 12, 2, sample_index=s), rays)
            )
            acc_w = iw if acc_w is None else acc_w + iw
            acc_i = ii if acc_i is None else acc_i + ii
        mean_w = acc_w / spp
        mean_i = acc_i / spp
        # clamp outliers (fireflies) before comparing means
        cw, ci = np.clip(mean_w, 0, 4), np.clip(mean_i, 0, 4)
        assert abs(cw.mean() - ci.mean()) / max(ci.mean(), 1e-6) < 0.25
        # pixelwise correlation must be strong
        corr = np.corrcoef(cw.reshape(-1), ci.reshape(-1))[0, 1]
        assert corr > 0.9
