"""Drill the 2M-tri parity miss (repro_2m_parity ray 1709, pid -1 vs
274838 @ t=25.77): cast the failing ray alone through knob variants and
walk the upper tree host-side to find where the hit is dropped."""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

import messyerraytracer_tpu as mrt
from messyerraytracer_tpu.core.brute import cast_rays_brute
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.kernels.cluster_v2 import cast_rays_cluster_v2
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes
from bench import block_swizzled_frame_rays, subsample


def main():
    g2m = meshes.plane(40.0, y=0.0, subdiv=1004)
    g2m[:, :, 1] = (np.sin(g2m[:, :, 0] * 0.7)
                    * np.cos(g2m[:, :, 2] * 0.6)) * 1.5
    scene = build_scene_from_tri_array(g2m)
    cs = scene.cluster
    print(f"tris={scene.num_tris} clusters={cs.num_clusters} "
          f"tcap={cs.tcap}", flush=True)

    cam99 = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0),
                                     fov_degrees=60.0)
    rays2m = block_swizzled_frame_rays(mrt, 1024, 768, cam99)
    sub = subsample(rays2m, 2048)
    o = np.asarray(sub.origin)
    d = np.asarray(sub.direction)
    i = 1709
    print("ray", o[i], d[i], flush=True)

    # single failing ray, replicated to fill one row
    from messyerraytracer_tpu.core.types import make_rays
    one = make_rays(np.tile(o[i], (128, 1)), np.tile(d[i], (128, 1)))
    hb, _ = cast_rays_brute(one, scene.tris)
    print("brute pid", np.asarray(hb.prim_id)[0], "t",
          np.asarray(hb.t)[0], flush=True)

    for kw in ({"qd": 4, "dmode": "bitloop"},
               {"qd": 1, "dmode": "bitloop"},
               {"qd": 4, "dmode": "all"},
               {"qd": 4, "dmode": "bitloop", "qroom": 8},
               {"qd": 4, "dmode": "bitloop", "popn": 2}):
        h, _, _ = cast_rays_cluster_v2(one, cs, **kw)
        p = np.asarray(h.prim_id)
        t = np.asarray(h.t)
        print(f"v2 {kw}: pid {p[0]} t {t[0]:.5f} "
              f"(all128 same: {len(set(p.tolist())) == 1})", flush=True)

    # also: full 2048 subsample with dmode=all (row masks bypassed)
    hs, _, _ = cast_rays_cluster_v2(sub, cs, qd=4, dmode="all")
    hbf, _ = cast_rays_brute(sub, scene.tris)
    ps, pb = np.asarray(hs.prim_id), np.asarray(hbf.prim_id)
    ts, tb = np.asarray(hs.t), np.asarray(hbf.t)
    bad = np.nonzero((ps != pb) & ~np.isclose(ts, tb, rtol=1e-5))[0]
    print(f"dmode=all real mismatches: {len(bad)}/2048 -> {bad[:10]}",
          flush=True)

    # host-side: which cluster holds the missed tri, and does the ray
    # reach it through the upper tree in f32?
    pid_tgt = int(np.asarray(hbf.prim_id)[i])
    slot_pid = np.asarray(cs.slot_prim_id)
    slots = np.nonzero(slot_pid == pid_tgt)[0]
    print("padded slots for pid", pid_tgt, "->", slots,
          "cluster", slots // cs.tcap, flush=True)


if __name__ == "__main__":
    main()
