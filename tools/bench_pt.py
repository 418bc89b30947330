"""Wavefront-PT frame time on the 99K scene (640x480 x N bounces)."""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

import messyerraytracer_tpu as mrt
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.dispatch.morton import raster_block_permutation
from messyerraytracer_tpu.render.shade import (
    LIGHT_DIRECTIONAL, default_materials, make_environment, make_lights,
)
from messyerraytracer_tpu.render.wavefront import WavefrontPathTracer
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k


def main():
    bounces = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scene = build_scene_from_tri_array(bench_scene_100k())
    cam = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0),
                                   fov_degrees=60.0)
    w, h = 640, 480
    rays = mrt.generate_rays(cam, w, h)
    perm = jnp.asarray(raster_block_permutation(w, h, 32))
    rays = Rays(origin=rays.origin[perm], direction=rays.direction[perm],
                t_min=rays.t_min[perm], t_max=rays.t_max[perm])
    pt = WavefrontPathTracer(
        scene,
        make_lights([{"type": LIGHT_DIRECTIONAL,
                      "direction": (-0.4, -1.0, -0.2),
                      "color": (1.0, 1.0, 1.0), "energy": 1.5}]),
        make_environment(), default_materials())
    img = pt.trace_frame(rays, max_bounces=bounces, sample_index=1)
    float(jnp.sum(img))
    t0 = time.time()
    iters = 4
    for s in range(iters):
        img = pt.trace_frame(rays, max_bounces=bounces, sample_index=s)
    float(jnp.sum(img))
    dt = (time.time() - t0) / iters
    m = float(jnp.mean(img))
    fin = bool(jnp.isfinite(img).all())
    print(f"PT {w}x{h} x{bounces}b: {dt*1e3:.1f} ms/frame "
          f"(mean {m:.3f}, finite={fin})", flush=True)


if __name__ == "__main__":
    main()
