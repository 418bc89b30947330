"""Round-4 anatomy: probe decomposition of the 1M-tri flat frame.

Runs the production cluster kernel with each timing probe at the
density-routed knobs (gr=2, qd=4 at 1M) to bound where the frame time
goes: pops vs drains vs DMA vs reductions vs output.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

import messyerraytracer_tpu as mrt  # noqa: F401

import messyerraytracer_tpu.kernels.cluster as _mrt_cluster
_mrt_cluster.ALLOW_PROBES = True   # timing probes corrupt hits
from messyerraytracer_tpu.kernels.cluster import (
    build_cluster_scene, cast_rays_cluster, cluster_tcap_for,
)
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k, bench_scene_1m, frame_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="1m")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--gr", type=int, default=2)
    ap.add_argument("--qd", type=int, default=4)
    ap.add_argument("--srows", type=int, default=16)
    ap.add_argument("--tcap", type=int, default=0)
    ap.add_argument("--probes", default=",noredux,nodrain,notouch,nopush,noout")
    ap.add_argument("--impl", default="v1")
    ap.add_argument("--popn", type=int, default=1)
    ap.add_argument("--qroom", type=int, default=16)
    ap.add_argument("--dmode", default="bitloop")
    args = ap.parse_args()

    tris = bench_scene_100k() if args.scene == "100k" else bench_scene_1m()
    t0 = time.time()
    scene = build_scene_from_tri_array(tris, backend="pallas")
    tcap = args.tcap or cluster_tcap_for(scene.num_tris)
    cs = build_cluster_scene(scene.bvh, scene.tris, tcap=tcap)
    print(f"[{args.scene}] {scene.num_tris} tris, tcap={tcap}, "
          f"C={cs.num_clusters}, build {time.time()-t0:.1f}s", flush=True)
    rays = frame_rays()
    n = rays.count
    if args.impl == "v2":
        from messyerraytracer_tpu.kernels.cluster_v2 import (
            cast_rays_cluster_v2 as cast_fn,
        )
        kw = dict(srows=args.srows, qd=args.qd, popn=args.popn,
                  qroom=args.qroom, dmode=args.dmode)
    else:
        cast_fn = cast_rays_cluster
        kw = dict(srows=args.srows, qd=args.qd, gr=args.gr)

    for probe in args.probes.split(","):
        try:
            out = cast_fn(rays, cs, probe=probe, **kw)
            hits = out[0]
            float(jnp.sum(hits.t))
            t0 = time.time()
            for _ in range(args.iters):
                out = cast_fn(rays, cs, probe=probe, **kw)
            float(jnp.sum(out[0].t))
            dt = (time.time() - t0) / args.iters
            label = probe or "full"
            extra = ""
            if not probe:
                h, stats, _, per_ray = cast_fn(
                    rays, cs, return_per_ray=True, **kw)
                tpr = float(jnp.sum(per_ray["tri_tests"])) / n
                pops = float(stats.bvh_nodes_visited)
                extra = (f"  tri/ray={tpr:.1f} pops={pops:.0f} "
                         f"(per tile {pops/max(n//(args.srows*128),1):.1f})")
            print(f"{label:8s}: {dt*1e3:7.2f} ms  "
                  f"({n/dt/1e6:6.2f} Mrays/s){extra}", flush=True)
        except Exception as e:
            print(f"{probe or 'full'}: ERROR {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
