"""Megakernel parameter sweep on the real TPU (srows x qdrain).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_mega.py
Builds the bench composite scene once, then times cast_rays_wide for each
knob combination (clearing the jit cache so QDRAIN changes take effect).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import messyerraytracer_tpu as mrt
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.dispatch.morton import raster_block_permutation
from messyerraytracer_tpu.kernels import traverse_pallas as tp
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes


def bench_scene():
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


def main():
    scene = build_scene_from_tri_array(bench_scene())
    w, h = 1024, 768
    cam = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0), fov_degrees=60.0)
    rays = mrt.generate_rays(cam, w, h)
    perm = jnp.asarray(raster_block_permutation(w, h, 32))
    rays = Rays(origin=rays.origin[perm], direction=rays.direction[perm],
                t_min=rays.t_min[perm], t_max=rays.t_max[perm])
    n = rays.count

    combos = []
    for srows in (8, 16, 32):
        for qdrain in (2, 4, 8):
            combos.append((srows, qdrain))
    ref_slot = None
    for srows, qdrain in combos:
        tp.QDRAIN = qdrain
        tp._cast_rays_wide_jit.clear_cache()
        try:
            # force completion with a scalar sum readback:
            # block_until_ready does not reliably block on tunneled devices
            hits, stats, _ = tp.cast_rays_wide(rays, scene.wide, srows=srows)
            float(jnp.sum(hits.t))
            t0 = time.time()
            iters = 3
            for _ in range(iters):
                hits, stats, _ = tp.cast_rays_wide(rays, scene.wide,
                                                   srows=srows)
            float(jnp.sum(hits.t))
            dt = (time.time() - t0) / iters
            slot_sum = int(jnp.sum(jnp.maximum(hits.prim_id, 0)))
            if ref_slot is None:
                ref_slot = slot_sum
            ok = "ok" if slot_sum == ref_slot else "MISMATCH"
            print(f"srows={srows:3d} qdrain={qdrain} -> "
                  f"{n / dt / 1e6:7.2f} Mrays/s  ({dt * 1e3:.2f} ms) {ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"srows={srows:3d} qdrain={qdrain} -> FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
