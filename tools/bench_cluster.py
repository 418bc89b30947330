"""Cluster-kernel shoot-out on the real TPU: dense-phase vs packet kernel.

Usage: python tools/bench_cluster.py [--scenes 100k,1m] [--iters 8]
       [--tcaps 64] [--srows 16] [--qd 2]

Builds each scene once per backend (the cluster tables are built at
build_scene time), times full 1024x768 coherent frames with a forced
scalar readback per batch (PERF.md round-2 timing methodology), and
checks prim_id parity against the brute-force oracle on a subsample.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

import messyerraytracer_tpu as mrt  # noqa: F401
from messyerraytracer_tpu.core.brute import cast_rays_brute
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.kernels.cluster import (
    build_cluster_scene, cast_rays_cluster,
)
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k, bench_scene_1m, frame_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="100k")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tcaps", default="64")
    ap.add_argument("--srows", type=int, default=16)
    ap.add_argument("--qd", type=int, default=2)
    ap.add_argument("--pallas", action="store_true",
                    help="also time the packet megakernel")
    args = ap.parse_args()

    rays = frame_rays()
    n = rays.count
    sub = Rays(origin=rays.origin[:4096], direction=rays.direction[:4096],
               t_min=rays.t_min[:4096], t_max=rays.t_max[:4096])

    for name in args.scenes.split(","):
        tris = bench_scene_100k() if name == "100k" else bench_scene_1m()
        t0 = time.time()
        base = build_scene_from_tri_array(tris, backend="pallas")
        print(f"[{name}] {base.num_tris} tris, pallas build "
              f"{time.time()-t0:.1f}s", flush=True)
        hb, _ = cast_rays_brute(sub, base.tris)
        pb = np.asarray(hb.prim_id)
        tb = np.asarray(hb.t)

        if args.pallas:
            t0 = time.time()
            hits, _ = base.cast_rays(rays)
            float(jnp.sum(hits.t))
            warm = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                hits, _ = base.cast_rays(rays)
            float(jnp.sum(hits.t))
            dt = (time.time() - t0) / args.iters
            print(f"[{name}] pallas    : {n/dt/1e6:8.2f} Mrays/s "
                  f"({dt*1e3:.1f} ms, warm {warm:.1f}s)", flush=True)

        for tcap in (int(x) for x in args.tcaps.split(",")):
            t0 = time.time()
            cs = build_cluster_scene(base.bvh, base.tris, tcap=tcap)
            bt = time.time() - t0
            t0 = time.time()
            hits, stats, _ = cast_rays_cluster(
                rays, cs, srows=args.srows, qd=args.qd)
            float(jnp.sum(hits.t))
            warm = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                hits, stats, _ = cast_rays_cluster(
                    rays, cs, srows=args.srows, qd=args.qd)
            float(jnp.sum(hits.t))
            dt = (time.time() - t0) / args.iters
            hs, st2, _ = cast_rays_cluster(sub, cs, srows=args.srows,
                                           qd=args.qd)
            par = bool(np.array_equal(np.asarray(hs.prim_id), pb))
            terr = float(np.nanmax(np.abs(np.asarray(hs.t) - tb))) if not par \
                else float(np.max(np.abs(np.asarray(hs.t) - tb)))
            tt = float(stats.tri_tests) / n
            pops = int(stats.bvh_nodes_visited)
            print(f"[{name}] cluster T={tcap:3d}: {n/dt/1e6:8.2f} Mrays/s "
                  f"({dt*1e3:.1f} ms, build {bt:.1f}s, warm {warm:.1f}s, "
                  f"C={cs.num_clusters}, tri/ray {tt:.0f}, pops {pops}, "
                  f"parity={par}, t_err {terr:.2e})", flush=True)


if __name__ == "__main__":
    main()
