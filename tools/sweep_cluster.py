"""Cluster-kernel knob sweep on the real TPU, one scene build per tcap.

Usage: python tools/sweep_cluster.py [--scene 100k|1m] [--iters 6]
       [--tcaps 64] [--combos "16:2:1,16:4:1,32:2:1"]   (srows:qd:inner)
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
    ap.add_argument("--scene", default="100k")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--tcaps", default="64")
    ap.add_argument("--combos", default="16:2:1")
    args = ap.parse_args()

    rays = frame_rays()
    n = rays.count
    sub = Rays(origin=rays.origin[:4096], direction=rays.direction[:4096],
               t_min=rays.t_min[:4096], t_max=rays.t_max[:4096])

    tris = bench_scene_100k() if args.scene == "100k" else bench_scene_1m()
    t0 = time.time()
    base = build_scene_from_tri_array(tris, backend="pallas")
    print(f"[{args.scene}] {base.num_tris} tris, base build "
          f"{time.time()-t0:.1f}s", flush=True)
    hb, _ = cast_rays_brute(sub, base.tris)
    pb = np.asarray(hb.prim_id)

    for tcap in (int(x) for x in args.tcaps.split(",")):
        t0 = time.time()
        cs = build_cluster_scene(base.bvh, base.tris, tcap=tcap)
        bt = time.time() - t0
        for combo in args.combos.split(","):
            parts = [int(x) for x in combo.split(":")]
            srows, qd, inner = parts[:3]
            gr = parts[3] if len(parts) > 3 else 4
            kw = dict(srows=srows, qd=qd, inner=inner, gr=gr)
            t0 = time.time()
            hits, stats, _ = cast_rays_cluster(rays, cs, **kw)
            float(jnp.sum(hits.t))
            warm = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                hits, stats, _ = cast_rays_cluster(rays, cs, **kw)
            float(jnp.sum(hits.t))
            dt = (time.time() - t0) / args.iters
            hs, _, _ = cast_rays_cluster(sub, cs, **kw)
            par = bool(np.array_equal(np.asarray(hs.prim_id), pb))
            tt = float(stats.tri_tests) / n
            print(f"T={tcap:3d} srows={srows:2d} qd={qd} inner={inner} "
                  f"gr={gr}: "
                  f"{n/dt/1e6:8.2f} Mrays/s ({dt*1e3:.1f} ms, "
                  f"tri/ray {tt:.0f}, "
                  f"pops {int(stats.bvh_nodes_visited)}, parity={par}) "
                  f"[build {bt:.1f}s, warm {warm:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
