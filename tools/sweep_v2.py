"""v2 kernel knob sweep at 1M-tri scale with compact row patches.

With per-row-exact drains the old v1 sweep conclusions (T=64 at 1M,
srows=16, popn=1) need re-measuring: finer clusters trade pop count
against per-visit dense work differently when only SET rows pay.
"""

import argparse
import itertools
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
from messyerraytracer_tpu.kernels.cluster import (
    build_cluster_scene, cluster_tcap_for,
)
from messyerraytracer_tpu.kernels.cluster_v2 import cast_rays_cluster_v2
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k, bench_scene_1m, frame_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="1m")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--tcaps", default="32,48,64")
    ap.add_argument("--srows", default="8,16")
    ap.add_argument("--popn", default="1")
    ap.add_argument("--qd", default="4")
    ap.add_argument("--qroom", default="16")
    ap.add_argument("--dmode", default="bitloop")
    args = ap.parse_args()

    tris = bench_scene_100k() if args.scene == "100k" else bench_scene_1m()
    scene = build_scene_from_tri_array(tris, backend="pallas")
    rays = frame_rays()
    n = rays.count

    for tcap in [int(x) for x in args.tcaps.split(",")]:
        t0 = time.time()
        cs = build_cluster_scene(scene.bvh, scene.tris, tcap=tcap)
        tb = time.time() - t0
        print(f"-- tcap={tcap} C={cs.num_clusters} build={tb:.1f}s",
              flush=True)
        combos = itertools.product(
            [int(x) for x in args.srows.split(",")],
            [int(x) for x in args.popn.split(",")],
            [int(x) for x in args.qd.split(",")],
            [int(x) for x in args.qroom.split(",")],
            args.dmode.split(","),
        )
        for srows, popn, qd, qroom, dmode in combos:
            kw = dict(srows=srows, qd=qd, popn=popn, qroom=qroom,
                      dmode=dmode)
            try:
                out = cast_rays_cluster_v2(rays, cs, **kw)
                float(jnp.sum(out[0].t))
                t0 = time.time()
                for _ in range(args.iters):
                    out = cast_rays_cluster_v2(rays, cs, **kw)
                float(jnp.sum(out[0].t))
                dt = (time.time() - t0) / args.iters
                _, stats, _, pr = cast_rays_cluster_v2(
                    rays, cs, return_per_ray=True, **kw)
                tpr = float(jnp.sum(pr["tri_tests"])) / n
                pops = float(stats.bvh_nodes_visited)
                print(f"srows={srows} popn={popn} qd={qd} qroom={qroom} "
                      f"dmode={dmode}: {dt*1e3:7.2f} ms "
                      f"({n/dt/1e6:6.2f} Mrays/s) tri/ray={tpr:.0f} "
                      f"pops={pops:.0f}", flush=True)
            except Exception as e:
                print(f"srows={srows} popn={popn} ... ERROR "
                      f"{repr(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
