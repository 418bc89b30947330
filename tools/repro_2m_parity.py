"""Reproduce the 2M-tri parity failure seen in bench.py (parity_2m false).

Builds the same 2M terrain, casts the same strided subsample through the
cluster backend and the brute oracle, and reports where they disagree —
plus the upper-tree stack-depth requirement (KSTACK overflow suspect).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

import messyerraytracer_tpu as mrt
from messyerraytracer_tpu.core.brute import cast_rays_brute
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes
from bench import block_swizzled_frame_rays, subsample


def max_stack_need(nodes_np, dummy_enc):
    """Worst-case DFS stack depth over the wide8 upper tree, counted the
    way the kernel pushes (all internal children pushed before descend)."""
    from messyerraytracer_tpu.kernels.wide import NODE8_STRIDE, WIDE8_CAP

    n = nodes_np.reshape(-1, NODE8_STRIDE)

    best = [0]

    def walk(i, sp):
        encs = n[i, 48:48 + WIDE8_CAP].astype(np.int64)
        kids = [e for e in encs if e != dummy_enc and (e & 1) == 0]
        # kernel pushes ALL internal children, then pops one: transient
        # stack peak = sp + len(kids)
        best[0] = max(best[0], sp + len(kids))
        for j, e in enumerate(kids):
            # after popping this child, the remaining siblings stay
            walk(e >> 1, sp + len(kids) - 1 - j)

    sys.setrecursionlimit(100000)
    walk(0, 0)
    return best[0]


def main():
    cam99 = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0),
                                     fov_degrees=60.0)
    g2m = meshes.plane(40.0, y=0.0, subdiv=1004)
    g2m[:, :, 1] = (np.sin(g2m[:, :, 0] * 0.7)
                    * np.cos(g2m[:, :, 2] * 0.6)) * 1.5
    t0 = time.time()
    scene = build_scene_from_tri_array(g2m)
    print(f"build {time.time()-t0:.1f}s tris={scene.num_tris} "
          f"clusters={scene.cluster.num_clusters} "
          f"tcap={scene.cluster.tcap}", flush=True)

    nodes_np = np.asarray(scene.cluster.nodes)
    need = max_stack_need(nodes_np, scene.cluster.dummy_enc)
    print(f"upper-tree max stack need = {need} (KSTACK=64)", flush=True)

    rays2m = block_swizzled_frame_rays(mrt, 1024, 768, cam99)
    sub = subsample(rays2m, 2048)
    hs, _ = scene.cast_rays(sub)
    hb, _ = cast_rays_brute(sub, scene.tris)
    ps, pb = np.asarray(hs.prim_id), np.asarray(hb.prim_id)
    ts, tb = np.asarray(hs.t), np.asarray(hb.t)
    tie = np.abs(ts - tb) <= 4e-6 * np.maximum(np.abs(tb), 1.0)
    bad_p = np.nonzero((ps != pb) & ~tie)[0]
    bad_t = np.nonzero(~np.isclose(ts, tb, rtol=1e-5))[0]
    print(f"prim mismatches: {len(bad_p)}/2048, t mismatches: "
          f"{len(bad_t)}/2048", flush=True)
    for i in bad_p[:10]:
        print(f"  ray {i}: pid {ps[i]} vs {pb[i]}  t {ts[i]:.6f} vs "
              f"{tb[i]:.6f}  dt={ts[i]-tb[i]:.2e}")
    for i in bad_t[:10]:
        if i not in bad_p[:10]:
            print(f"  ray {i} (t only): t {ts[i]:.6f} vs {tb[i]:.6f}")


if __name__ == "__main__":
    main()
