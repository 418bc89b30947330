"""Sweep intra-row pixel-patch shapes for the v2 cluster kernel.

With per-row-exact drain gating (cluster_v2), each 128-lane row pays the
union of clusters ANY of its 128 rays touches.  The legacy swizzle makes a
row a 32x4 screen strip; compact patches (16x8, 8x16) should shrink the
row's cluster footprint at sub-pixel triangle density (1M scene).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

import messyerraytracer_tpu as mrt  # noqa: F401
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.dispatch.morton import raster_block_permutation
from messyerraytracer_tpu.kernels.cluster import (
    build_cluster_scene, cluster_tcap_for,
)
from messyerraytracer_tpu.kernels.cluster_v2 import cast_rays_cluster_v2
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k, bench_scene_1m


def patched_rays(w, h, cam, block, patch):
    rays = mrt.generate_rays(cam, w, h)
    perm = jnp.asarray(raster_block_permutation(w, h, block, patch=patch))
    return Rays(origin=rays.origin[perm], direction=rays.direction[perm],
                t_min=rays.t_min[perm], t_max=rays.t_max[perm])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="1m")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--srows", type=int, default=16)
    ap.add_argument("--dmode", default="bitloop")
    ap.add_argument("--qd", type=int, default=4)
    ap.add_argument("--block", type=int, default=32)
    args = ap.parse_args()

    tris = bench_scene_100k() if args.scene == "100k" else bench_scene_1m()
    scene = build_scene_from_tri_array(tris, backend="pallas")
    tcap = cluster_tcap_for(scene.num_tris)
    cs = build_cluster_scene(scene.bvh, scene.tris, tcap=tcap)
    print(f"[{args.scene}] {scene.num_tris} tris tcap={tcap} "
          f"C={cs.num_clusters}", flush=True)

    w, h = 1024, 768
    cam = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0), fov_degrees=60.0)
    kw = dict(srows=args.srows, qd=args.qd, dmode=args.dmode)
    shapes = [None, (16, 8), (8, 16), (32, 4)]
    for patch in shapes:
        rays = patched_rays(w, h, cam, args.block, patch)
        n = rays.count
        out = cast_rays_cluster_v2(rays, cs, **kw)
        float(jnp.sum(out[0].t))
        t0 = time.time()
        for _ in range(args.iters):
            out = cast_rays_cluster_v2(rays, cs, **kw)
        float(jnp.sum(out[0].t))
        dt = (time.time() - t0) / args.iters
        _, stats, _, per_ray = cast_rays_cluster_v2(
            rays, cs, return_per_ray=True, **kw)
        tpr = float(jnp.sum(per_ray["tri_tests"])) / n
        pops = float(stats.bvh_nodes_visited)
        print(f"patch={str(patch):10s}: {dt*1e3:7.2f} ms "
              f"({n/dt/1e6:6.2f} Mrays/s) tri/ray={tpr:.1f} "
              f"pops={pops:.0f}", flush=True)


if __name__ == "__main__":
    main()
