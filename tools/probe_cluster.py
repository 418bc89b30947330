"""Kernel-probe anatomy of the 99K cluster frame at current defaults.

Each probe compiles a variant with parts disabled (garbage outputs) to
bound where the iteration time goes.  Single-use probes rebuild state.
"""

import sys
import time

sys.path.insert(0, ".")

import jax.numpy as jnp

import messyerraytracer_tpu as mrt  # noqa: F401

import messyerraytracer_tpu.kernels.cluster as _mrt_cluster
_mrt_cluster.ALLOW_PROBES = True   # timing probes corrupt hits
from messyerraytracer_tpu.kernels.cluster import (
    build_cluster_scene, cast_rays_cluster, cluster_tcap_for,
)
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k, frame_rays


def main():
    tris = bench_scene_100k()
    scene = build_scene_from_tri_array(tris, backend="pallas")
    cs = build_cluster_scene(scene.bvh, scene.tris,
                             tcap=cluster_tcap_for(scene.num_tris))
    rays = frame_rays()
    n = rays.count
    for probe in ("", "noredux", "nodrain", "notouch", "nopush", "noout"):
        try:
            out = cast_rays_cluster(rays, cs, probe=probe)
            hits = out[0]
            float(jnp.sum(hits.t))
            t0 = time.time()
            iters = 6
            for _ in range(iters):
                out = cast_rays_cluster(rays, cs, probe=probe)
            float(jnp.sum(out[0].t))
            dt = (time.time() - t0) / iters
            label = probe or "full"
            print(f"{label:8s}: {dt*1e3:7.2f} ms  ({n/dt/1e6:6.2f} Mrays/s)",
                  flush=True)
        except Exception as e:
            print(f"{probe or 'full'}: ERROR {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
