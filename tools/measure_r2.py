"""Consolidated round-2 TPU measurement session.

Runs, in one process (one scene build each):
  1. 99K bench scene: megakernel row vs columnar layout A/B
  2. srows x qdrain mini-sweep on the winning layout
  3. 1M-tri scene (now VMEM-resident): row vs columnar
All timings force a scalar readback fence.  Prints a compact table.

Usage: python tools/measure_r2.py [--skip-1m]
"""

import argparse
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
from messyerraytracer_tpu.kernels import traverse_pallas as tp
from messyerraytracer_tpu.kernels.traverse_pallas import cast_rays_wide
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


def frame_rays():
    w, h = 1024, 768
    cam = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0), fov_degrees=60.0)
    rays = mrt.generate_rays(cam, w, h)
    perm = jnp.asarray(raster_block_permutation(w, h, 32))
    return Rays(origin=rays.origin[perm], direction=rays.direction[perm],
                t_min=rays.t_min[perm], t_max=rays.t_max[perm])


def timed(scene, rays, iters=4, **kw):
    t0 = time.time()
    hits, stats, _ = cast_rays_wide(rays, scene.wide, **kw)
    float(jnp.sum(hits.t))
    warm = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        hits, stats, _ = cast_rays_wide(rays, scene.wide, **kw)
    float(jnp.sum(hits.t))
    dt = (time.time() - t0) / iters
    return dt, warm, hits, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-1m", action="store_true")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    rays = frame_rays()
    n = rays.count
    sub = Rays(origin=rays.origin[:4096], direction=rays.direction[:4096],
               t_min=rays.t_min[:4096], t_max=rays.t_max[:4096])

    t0 = time.time()
    scene = build_scene_from_tri_array(bench_scene_100k())
    print(f"[build] 99K scene {time.time()-t0:.1f}s", flush=True)
    hb, _ = cast_rays_brute(sub, scene.tris)
    pb = np.asarray(hb.prim_id)

    # ---- 1) row vs columnar ----------------------------------------
    results = {}
    for col in (False, True):
        dt, warm, hits, stats = timed(scene, rays, args.iters, columnar=col)
        hs, _, _ = cast_rays_wide(sub, scene.wide, columnar=col)
        par = bool(np.array_equal(np.asarray(hs.prim_id), pb))
        name = "columnar" if col else "row"
        results[name] = dt
        print(f"[99K] {name:8s}: {n/dt/1e6:7.2f} Mrays/s "
              f"({dt*1e3:.1f} ms, warm {warm:.0f}s, parity={par}, "
              f"pops={int(stats.bvh_nodes_visited)})", flush=True)

    best_col = results.get("columnar", 9e9) < results.get("row", 9e9)

    # ---- 2) srows x qdrain mini-sweep on the winner -----------------
    for srows in (8, 16, 32):
        for qd in (2, 4, 8):
            if (srows, qd) == (16, 4):
                continue  # already measured above
            tp.QDRAIN = qd
            tp._cast_rays_wide_jit.clear_cache()
            try:
                dt, _, _, _ = timed(scene, rays, 2, columnar=best_col,
                                    srows=srows)
                print(f"[sweep] srows={srows} qdrain={qd} col={best_col}: "
                      f"{n/dt/1e6:7.2f} Mrays/s", flush=True)
            except Exception as e:
                print(f"[sweep] srows={srows} qdrain={qd}: FAILED "
                      f"{type(e).__name__} {str(e)[:120]}", flush=True)
    tp.QDRAIN = 4
    tp._cast_rays_wide_jit.clear_cache()

    # ---- 3) 1M-tri resident ----------------------------------------
    if not args.skip_1m:
        g1m = meshes.plane(40.0, y=0.0, subdiv=710)
        g1m[:, :, 1] = (np.sin(g1m[:, :, 0] * 0.7)
                        * np.cos(g1m[:, :, 2] * 0.6)) * 1.5
        t0 = time.time()
        s1m = build_scene_from_tri_array(g1m)
        jax.block_until_ready((s1m.wide.nodes, s1m.wide.leaf_tris))
        print(f"[build] 1M scene {time.time()-t0:.1f}s "
              f"(stream_leaves={s1m.wide.stream_leaves}, "
              f"stream_nodes={s1m.wide.stream_nodes})", flush=True)
        hb1, _ = cast_rays_brute(sub, s1m.tris)
        for col in (False, True):
            try:
                dt, warm, hits, _ = timed(s1m, rays, 2, columnar=col)
                hs, _, _ = cast_rays_wide(sub, s1m.wide, columnar=col)
                par = bool(np.array_equal(np.asarray(hs.prim_id),
                                          np.asarray(hb1.prim_id)))
                name = "columnar" if col else "row"
                print(f"[1M ] {name:8s}: {n/dt/1e6:7.2f} Mrays/s "
                      f"({dt*1e3:.1f} ms, warm {warm:.0f}s, parity={par})",
                      flush=True)
            except Exception as e:
                print(f"[1M ] col={col}: FAILED {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
