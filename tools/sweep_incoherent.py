"""Incoherent-ray knob sweep on the real TPU (VERDICT-5 workload).

512K fully random rays (origins AND directions) through the octant-major
6D sort, then the cluster kernel under different (tcap, srows, gr, qd)
knobs.  The incoherent case is iteration-latency bound, not flop bound
(PERF.md r3 anatomy: ~2% VPU utilization) — fat clusters trade cheap
dense flops for fewer queue drains and a smaller upper tree.

Usage: python tools/sweep_incoherent.py [--tcaps 32,64,128]
       [--combos "16:4:4,16:4:16,8:4:8"]   (srows:qd:gr)
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
from messyerraytracer_tpu.dispatch.morton import sort_rays_6d
from messyerraytracer_tpu.kernels.cluster import (
    build_cluster_scene,
    cast_rays_cluster,
)
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tcaps", default="32,64,128")
    ap.add_argument("--combos", default="16:4:4,16:4:16")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--nrays", type=int, default=512 * 1024)
    args = ap.parse_args()

    tris = bench_scene_100k()
    base = build_scene_from_tri_array(tris, backend="cluster")
    print(f"{base.num_tris} tris", flush=True)

    rngi = np.random.default_rng(3)
    o = rngi.uniform(-20, 20, (args.nrays, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1]) + 0.5
    d = rngi.standard_normal((args.nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(
        origin=jnp.asarray(o), direction=jnp.asarray(d),
        t_min=jnp.full((args.nrays,), 1e-3, jnp.float32),
        t_max=jnp.full((args.nrays,), 3e38, jnp.float32),
    )
    srt, perm = sort_rays_6d(rays, base.bvh.aabb_min[0],
                             base.bvh.aabb_max[0])
    srt = Rays(*(jnp.asarray(x) for x in
                 (srt.origin, srt.direction, srt.t_min, srt.t_max)))

    # parity oracle on a strided subsample
    idx = np.arange(4096, dtype=np.int32) * (args.nrays // 4096)
    sub = Rays(origin=srt.origin[idx], direction=srt.direction[idx],
               t_min=srt.t_min[idx], t_max=srt.t_max[idx])
    hb, _ = cast_rays_brute(sub, base.tris)
    pb = np.asarray(hb.prim_id)

    for tcap in (int(x) for x in args.tcaps.split(",")):
        t0 = time.time()
        cs = build_cluster_scene(base.bvh, base.tris, tcap=tcap)
        bt = time.time() - t0
        for combo in args.combos.split(","):
            srows, qd, gr = (int(x) for x in combo.split(":"))
            kw = dict(srows=srows, qd=qd, gr=gr)
            t0 = time.time()
            hits, stats, _ = cast_rays_cluster(srt, cs, **kw)
            float(jnp.sum(hits.t))
            warm = time.time() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                hits, stats, _ = cast_rays_cluster(srt, cs, **kw)
                float(jnp.sum(hits.t))
                times.append(time.time() - t0)
            dt = min(times)
            hsub, _, _ = cast_rays_cluster(sub, cs, **kw)
            ok = bool(np.array_equal(np.asarray(hsub.prim_id), pb))
            print(
                f"tcap={tcap:4d} srows={srows:2d} qd={qd} gr={gr:2d}  "
                f"{args.nrays / dt / 1e6:6.2f} Mrays/s  "
                f"tri/ray={float(stats.tri_tests) / args.nrays:7.1f}  "
                f"pops={float(stats.bvh_nodes_visited):9.0f}  "
                f"build={bt:4.1f}s warm={warm:4.1f}s parity={ok}",
                flush=True,
            )


if __name__ == "__main__":
    main()
