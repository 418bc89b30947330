"""Benchmark harness — primary-ray throughput on the real TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline config (BASELINE.json #2/#4): a ~100K-triangle scene, one full
frame of coherent primary rays (block-swizzled, the dispatcher's coherent
path), closest-hit cast through the Pallas packet kernel.  ``vs_baseline``
compares against the reference's CPU backend throughput (~27 Mrays/s at
1280x960 on its 13.5K-tri scene, ROADMAP.md:175-181 / BASELINE.md).

A t/prim_id parity check against the brute-force oracle runs on a
subsample first — a benchmark of wrong results is meaningless.
"""

import json
import sys
import time

import numpy as np

BASELINE_CPU_MRAYS = 27.0  # reference SSE+ThreadPool path (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    import messyerraytracer_tpu as mrt
    from messyerraytracer_tpu.core.brute import cast_rays_brute
    from messyerraytracer_tpu.core.types import Rays
    from messyerraytracer_tpu.dispatch.morton import raster_block_permutation
    from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
    from messyerraytracer_tpu.utils import meshes

    # ---- scene: ~100K tris, structured like a real demo asset ----------
    # (BASELINE config #2 is "a ~100K-tri demo asset" — a surface mesh, not
    # a random soup; mixed terrain + dense sphere + box buildings)
    g = meshes.plane(40.0, y=0.0, subdiv=158)  # ~50K terrain tris
    g[:, :, 1] = (np.sin(g[:, :, 0] * 0.6) * np.cos(g[:, :, 2] * 0.5)) * 1.5
    sphere = meshes.uv_sphere(4.0, 112, 112, center=(0, 6, 0))  # ~25K
    rng = np.random.default_rng(7)
    boxes = []
    for _ in range(2000):  # ~24K tris of "buildings"
        c = rng.uniform(-18, 18, 2)
        h = rng.uniform(0.5, 4.0)
        boxes.append(
            meshes.box(
                (rng.uniform(0.5, 2), h, rng.uniform(0.5, 2)),
                center=(c[0], h / 2, c[1]),
            )
        )
    tris = np.concatenate([g, sphere] + boxes)
    t0 = time.time()
    scene = build_scene_from_tri_array(tris)
    build_s = time.time() - t0

    # ---- rays: one 1024x768 frame of coherent primary rays -------------
    w, h = 1024, 768
    cam = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0), fov_degrees=60.0)
    rays = mrt.generate_rays(cam, w, h)
    perm = jnp.asarray(raster_block_permutation(w, h, 32))
    rays = Rays(
        origin=rays.origin[perm], direction=rays.direction[perm],
        t_min=rays.t_min[perm], t_max=rays.t_max[perm],
    )
    n = rays.count

    # ---- parity gate on a subsample ------------------------------------
    sub = Rays(
        origin=rays.origin[:4096], direction=rays.direction[:4096],
        t_min=rays.t_min[:4096], t_max=rays.t_max[:4096],
    )
    hs, _ = scene.cast_rays(sub)
    hb, _ = cast_rays_brute(sub, scene.tris)
    parity = bool(
        np.array_equal(np.asarray(hs.prim_id), np.asarray(hb.prim_id))
        and np.allclose(np.asarray(hs.t), np.asarray(hb.t), rtol=1e-6)
    )

    # ---- timed casts ----------------------------------------------------
    # Timing note: on tunneled devices jax.block_until_ready can return
    # before the device work completes (observed: 55 ms kernels "finish"
    # in 0.1 ms).  A scalar jnp.sum readback is the only reliable fence —
    # device work is FIFO, so forcing iteration K's sum bounds all K
    # iterations; the sum+RTT overhead is amortized across iters.
    def timed_cast(sc, rr, iters):
        hits, stats = sc.cast_rays(rr)  # compile + warm
        float(jnp.sum(hits.t))
        t0 = time.time()
        for _ in range(iters):
            hits, stats = sc.cast_rays(rr)
        float(jnp.sum(hits.t))
        return (time.time() - t0) / iters, hits, stats

    dt, hits, stats = timed_cast(scene, rays, 10)
    mrays = n / dt / 1e6

    # ---- roofline / utilization model ----------------------------------
    # The megakernel executes, per traversal iteration over a 2048-ray
    # tile: one 8-wide node pop (8 slab tests x ~22 flops) + qdrain=4
    # leaf batches (4 tris x ~50 flop MT) across all lanes -> ~2.0 Mflop
    # of issued VPU work per iteration; iterations ~= pops.  v5e VPU f32
    # peak is ~3.9 Tflop/s (8x128 lanes x 2 flop FMA x ~0.94 GHz x dual
    # issue) — vpu_frac says how far the serial pop chain + scalar moves
    # keep us from the vector roofline.  (The MXU is idle by design; see
    # PERF.md for the tensor-core-traversal discussion.)
    pops = float(stats.bvh_nodes_visited)
    issued_gflop = pops * 2.0e6 / 1e9
    vpu_frac = (issued_gflop / dt) / 3900.0

    # ---- secondary: the 1M-tri BASELINE scene (full-streaming kernel) --
    g1m = meshes.plane(40.0, y=0.0, subdiv=710)
    g1m[:, :, 1] = (np.sin(g1m[:, :, 0] * 0.7) * np.cos(g1m[:, :, 2] * 0.6)) * 1.5
    t0 = time.time()
    scene1m = build_scene_from_tri_array(g1m)
    jax.block_until_ready((scene1m.wide.nodes, scene1m.wide.leaf_tris))
    build1m_s = time.time() - t0
    # warm rebuild: same shapes -> cached jit; this is the real build cost
    # (the cold numbers are dominated by one-time remote XLA compiles)
    t0 = time.time()
    scene1m = build_scene_from_tri_array(g1m)
    jax.block_until_ready((scene1m.wide.nodes, scene1m.wide.leaf_tris))
    build1m_warm_s = time.time() - t0
    dt1m, h1m, _ = timed_cast(scene1m, rays, 2)
    sub1m = Rays(
        origin=rays.origin[:2048], direction=rays.direction[:2048],
        t_min=rays.t_min[:2048], t_max=rays.t_max[:2048],
    )
    hs1m, _ = scene1m.cast_rays(sub1m)
    hb1m, _ = cast_rays_brute(sub1m, scene1m.tris)
    parity_1m = bool(
        np.array_equal(np.asarray(hs1m.prim_id), np.asarray(hb1m.prim_id))
    )

    print(
        json.dumps(
            {
                "metric": "primary_ray_throughput_100k_tris",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_CPU_MRAYS, 3),
                "extra": {
                    "rays": n,
                    "tris": int(scene.num_tris),
                    "frame_ms": round(dt * 1e3, 2),
                    "build_s": round(build_s, 2),
                    "parity_vs_brute": parity,
                    "hit_rate": round(float(stats.hit_rate()), 3),
                    "mrays_1m_tris": round(n / dt1m / 1e6, 3),
                    "parity_1m": parity_1m,
                    "build_1m_s": round(build1m_s, 2),
                    "build_1m_warm_s": round(build1m_warm_s, 2),
                    "pops": int(pops),
                    "issued_vpu_gflop_per_frame": round(issued_gflop, 2),
                    "achieved_vpu_gflop_s": round(issued_gflop / dt, 1),
                    "vpu_peak_frac": round(vpu_frac, 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
