"""Incoherent-ray throughput: unsorted vs direction-Morton vs 6D sort.

512K fully random rays (random origins AND directions) on the 99K bench
scene — the VERDICT item-5 case.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

import messyerraytracer_tpu as mrt  # noqa: F401
from messyerraytracer_tpu.core.brute import cast_rays_brute
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.dispatch.dispatcher import RayDispatcher
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k


def main():
    tris = bench_scene_100k()
    scene = build_scene_from_tri_array(tris)
    n = 512 * 1024
    rng = np.random.default_rng(3)
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1]) + 0.5
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(
        origin=jnp.asarray(o), direction=jnp.asarray(d),
        t_min=jnp.full((n,), 1e-3, jnp.float32),
        t_max=jnp.full((n,), 3e38, jnp.float32),
    )
    sub = Rays(origin=rays.origin[:4096], direction=rays.direction[:4096],
               t_min=rays.t_min[:4096], t_max=rays.t_max[:4096])
    hb, _ = cast_rays_brute(sub, scene.tris)
    pb = np.asarray(hb.prim_id)

    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else (
        "6d", "direction", "none")
    for mode in modes:
        if mode == "none":
            fn = lambda r: scene.cast_rays(r)
        elif mode.startswith(("6d:", "6do:", "6db")):
            # 6d:<srows> origin-major | 6do:<srows> octant-major |
            # 6db<bits>:<srows> dir-Morton-major with <bits>/axis
            parts = mode.split(":")
            srows = int(parts[1])
            omaj = parts[0] != "6d"
            dbits = int(parts[0][3:]) if parts[0].startswith("6db") else 1
            from messyerraytracer_tpu.dispatch.morton import (
                sort_rays_6d, unshuffle_hits,
            )
            from messyerraytracer_tpu.kernels.cluster import (
                cast_rays_cluster,
            )

            def fn(r, srows=srows, omaj=omaj, dbits=dbits):
                sr, perm = sort_rays_6d(
                    r, scene.bvh.aabb_min[0], scene.bvh.aabb_max[0],
                    octant_major=omaj, dir_bits=dbits)
                hits, stats, _ = cast_rays_cluster(
                    sr, scene.cluster, srows=srows)
                return unshuffle_hits(hits, perm), stats
        elif mode.startswith("win"):
            # ascending-window multi-pass over the 6D sort (short rays
            # shrink tile footprints; survivors re-cast compacted)
            fracs = (tuple(float(x) for x in mode[3:].split("/"))
                     if len(mode) > 3 else (0.05, 0.2, 0.5))
            disp = RayDispatcher(scene, sort="6d", windows=fracs)
            fn = lambda r: disp.cast_rays(r)
        else:
            disp = RayDispatcher(scene, sort=mode)
            fn = lambda r: disp.cast_rays(r)
        hits, stats = fn(rays)
        float(jnp.sum(hits.t))
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            hits, stats = fn(rays)
        float(jnp.sum(hits.t))
        dt = (time.time() - t0) / iters
        hs, _ = fn(sub)
        par = bool(np.array_equal(np.asarray(hs.prim_id), pb))
        print(f"{mode:9s}: {n/dt/1e6:7.2f} Mrays/s ({dt*1e3:.1f} ms, "
              f"pops {int(stats.bvh_nodes_visited)}, "
              f"tri/ray {float(stats.tri_tests)/n:.0f}, parity={par})",
              flush=True)


if __name__ == "__main__":
    main()
