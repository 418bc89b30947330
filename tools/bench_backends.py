"""Backend shoot-out on the real TPU: pallas packet kernel vs frontier.

Usage: python tools/bench_backends.py [--scenes 100k,1m] [--iters 4]

Times a full 1024x768 coherent primary-ray frame through each backend on
the bench composite scene (and optionally the 1M-tri terrain).  All
timings force a scalar readback per iteration batch — block_until_ready
does not reliably block on tunneled axon devices (PERF.md round-2 notes).
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import messyerraytracer_tpu as mrt
from messyerraytracer_tpu.core.brute import cast_rays_brute
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.dispatch.morton import raster_block_permutation
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes


def bench_scene_100k():
    g = meshes.plane(40.0, y=0.0, subdiv=158)
    g[:, :, 1] = (np.sin(g[:, :, 0] * 0.6) * np.cos(g[:, :, 2] * 0.5)) * 1.5
    sphere = meshes.uv_sphere(4.0, 112, 112, center=(0, 6, 0))
    rng = np.random.default_rng(7)
    boxes = []
    for _ in range(2000):
        c = rng.uniform(-18, 18, 2)
        h = rng.uniform(0.5, 4.0)
        boxes.append(meshes.box((rng.uniform(0.5, 2), h, rng.uniform(0.5, 2)),
                                center=(c[0], h / 2, c[1])))
    return np.concatenate([g, sphere] + boxes)


def bench_scene_1m():
    g = meshes.plane(40.0, y=0.0, subdiv=710)
    g[:, :, 1] = (np.sin(g[:, :, 0] * 0.7) * np.cos(g[:, :, 2] * 0.6)) * 1.5
    return g


def frame_rays():
    w, h = 1024, 768
    cam = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0), fov_degrees=60.0)
    rays = mrt.generate_rays(cam, w, h)
    perm = jnp.asarray(raster_block_permutation(w, h, 32))
    return Rays(origin=rays.origin[perm], direction=rays.direction[perm],
                t_min=rays.t_min[perm], t_max=rays.t_max[perm])


def timed(scene, rays, iters):
    hits, stats = scene.cast_rays(rays)  # compile + warm
    float(jnp.sum(hits.t))
    t0 = time.time()
    for _ in range(iters):
        hits, stats = scene.cast_rays(rays)
    float(jnp.sum(hits.t))
    return (time.time() - t0) / iters, hits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="100k")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--backends", default="pallas,frontier")
    args = ap.parse_args()

    rays = frame_rays()
    n = rays.count
    sub = Rays(origin=rays.origin[:4096], direction=rays.direction[:4096],
               t_min=rays.t_min[:4096], t_max=rays.t_max[:4096])

    for name in args.scenes.split(","):
        tris = bench_scene_100k() if name == "100k" else bench_scene_1m()
        t0 = time.time()
        base = build_scene_from_tri_array(tris)
        print(f"[{name}] {base.num_tris} tris, build {time.time()-t0:.1f}s",
              flush=True)
        hb, _ = cast_rays_brute(sub, base.tris)
        pb = np.asarray(hb.prim_id)
        for backend in args.backends.split(","):
            scene = dataclasses.replace(base, backend=backend)
            try:
                t0 = time.time()
                dt, hits = timed(scene, rays, args.iters)
                warm = time.time() - t0 - dt * args.iters
                hsub, _ = scene.cast_rays(sub)
                par = bool(np.array_equal(np.asarray(hsub.prim_id), pb))
                print(f"[{name}] {backend:9s}: {n/dt/1e6:8.2f} Mrays/s "
                      f"({dt*1e3:.1f} ms/frame, warm+compile {warm:.1f}s, "
                      f"parity={par})", flush=True)
            except Exception as e:
                print(f"[{name}] {backend:9s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
