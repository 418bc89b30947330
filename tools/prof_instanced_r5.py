"""Fine-grained phase timing INSIDE build_cluster_tlas (VERDICT r4 #6:
instanced phase 27.9 s cold / 5.4 s warm — find the actual hot loop)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from messyerraytracer_tpu.accel.bvh import (
        build_bvh,
        build_bvh_over_aabbs,
    )
    from messyerraytracer_tpu.core.types import make_triangles, ALL_LAYERS
    from messyerraytracer_tpu.kernels.cluster import build_cluster_scene
    from messyerraytracer_tpu.kernels import cluster_tlas as ctl
    from messyerraytracer_tpu.utils import meshes

    terrain = meshes.plane(20.0, y=0.0, subdiv=100)
    terrain[:, :, 1] = (np.sin(terrain[:, :, 0] * 0.9)
                        * np.cos(terrain[:, :, 2] * 0.8))
    sphere_hi = meshes.uv_sphere(1.6, 64, 64)
    sphere_lo = meshes.uv_sphere(1.0, 32, 32)
    rock = meshes.box((1.4, 1.0, 1.2))
    mesh_tris = [terrain, sphere_hi, sphere_lo, rock]
    rng = np.random.default_rng(11)

    def xf(tx, ty, tz, s=1.0):
        m = np.eye(4, dtype=np.float32)[:3]
        m[0, 0] = m[1, 1] = m[2, 2] = s
        m[:3, 3] = (tx, ty, tz)
        return m

    instances = []
    for gx in range(4):
        for gz in range(4):
            instances.append((0, xf((gx - 1.5) * 20, 0.0,
                                    (gz - 1.5) * 20)))
    for _ in range(60):
        c = rng.uniform(-35, 35, 2)
        instances.append((1, xf(c[0], rng.uniform(1, 3), c[1],
                                s=rng.uniform(0.6, 1.4))))
    for _ in range(99):
        c = rng.uniform(-35, 35, 2)
        instances.append((2, xf(c[0], rng.uniform(0.8, 2.5), c[1],
                                s=rng.uniform(0.5, 1.5))))
    for _ in range(40):
        c = rng.uniform(-35, 35, 2)
        instances.append((3, xf(c[0], 0.5, c[1])))

    def run(tag):
        tcap = 64
        t = {}
        t0 = time.time()
        mesh_cs = []
        mesh_caabb = []
        for tri in mesh_tris:
            tri = np.asarray(tri, np.float32)
            v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
            ta = time.time()
            bvh = build_bvh(v0, v1, v2)
            t["bvh"] = t.get("bvh", 0) + time.time() - ta
            host = bvh.host
            perm = host["tri_order"]
            pv0, pv1, pv2 = v0[perm], v1[perm], v2[perm]
            e1, e2 = pv1 - pv0, pv2 - pv0
            nrm = np.cross(e1, e2)
            ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
            nrm = (nrm / np.where(ln > 0, ln, 1)).astype(np.float32)
            ta = time.time()
            tris = make_triangles(pv0, pv1, pv2)
            t["make_tris"] = t.get("make_tris", 0) + time.time() - ta
            ta = time.time()
            cs = build_cluster_scene(
                bvh, tris,
                _np=(pv0, e1, e2, nrm,
                     np.arange(len(v0), dtype=np.int32)[perm],
                     np.full(len(v0), ALL_LAYERS, np.int32)[perm]),
                tcap=tcap, host_arrange=True)
            t["cluster_scene"] = (t.get("cluster_scene", 0)
                                  + time.time() - ta)
            roots = np.asarray(cs.croots)
            mesh_caabb.append(np.concatenate(
                [host["aabb_min"][roots], host["aabb_max"][roots]],
                axis=1))
            mesh_cs.append(cs)
        ta = time.time()
        ablocks = jnp.concatenate([cs.ablocks for cs in mesh_cs], axis=0)
        jax.block_until_ready(ablocks)
        t["concat_dev"] = time.time() - ta

        ta = time.time()
        iinv, ifwd = ctl._inst_tables([tt for _, tt in instances])
        fwd_rows = np.zeros((len(instances), 12), np.float32)
        for i, (_, tr) in enumerate(instances):
            fwd_rows[i] = ctl._to_mat34(tr).astype(np.float32).reshape(-1)
        t["inst_tables"] = time.time() - ta

        group_inst = [m for m, _ in instances]
        pobj_min, pobj_max, pinst, pgid = [], [], [], []
        for i, g in enumerate(group_inst):
            ca = mesh_caabb[g]
            pobj_min.append(ca[:, 0:3])
            pobj_max.append(ca[:, 3:6])
            pinst.append(np.full(len(ca), i, np.int32))
            pgid.append((i << ctl.LOCAL_BITS)
                        + np.arange(len(ca), dtype=np.int32))
        pobj_min = np.concatenate(pobj_min)
        pobj_max = np.concatenate(pobj_max)
        pinst = np.concatenate(pinst)
        pgid = np.concatenate(pgid)
        print(f"  [{tag}] pairs={len(pgid)}", flush=True)

        ta = time.time()
        wmin, wmax = ctl._pair_world_aabbs(
            jnp.asarray(pobj_min), jnp.asarray(pobj_max),
            jnp.asarray(fwd_rows[pinst]))
        wmin_h, wmax_h = np.asarray(wmin), np.asarray(wmax)
        t["pair_world_aabbs"] = time.time() - ta

        ta = time.time()
        pair_bvh = build_bvh_over_aabbs(
            wmin_h, wmax_h, (wmin_h + wmax_h) * 0.5, max_leaf_size=1)
        t["pair_bvh"] = time.time() - ta

        ta = time.time()
        host = pair_bvh.host
        lf, cnt = host["left_first"], host["count"]
        order = host["tri_order"]
        is_leaf = cnt > 0
        gid_of_node = np.zeros(len(cnt), np.int32)
        gid_of_node[is_leaf] = pgid[order[lf[is_leaf]]]
        node_idx, node_const, nw, need = ctl._upper_node_tables(
            host["aabb_min"], host["aabb_max"], lf, cnt,
            is_leaf, gid_of_node, tcap)
        t["upper_tables"] = time.time() - ta
        print(f"  [{tag}] " + "  ".join(
            f"{k}={v:.2f}s" for k, v in t.items()), flush=True)
        return t

    print("COLD:", flush=True)
    run("cold")
    print("WARM:", flush=True)
    run("warm")


if __name__ == "__main__":
    main()
