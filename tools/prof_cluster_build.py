"""Profile build_cluster_scene phases at 1M tris (CPU jax by default)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from messyerraytracer_tpu.kernels import cluster as cl
    from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
    from tools.bench_backends import bench_scene_1m

    tcap = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    tris = bench_scene_1m()
    t0 = time.time()
    base = build_scene_from_tri_array(tris, backend="pallas")
    print(f"base build {time.time()-t0:.1f}s ({base.num_tris} tris)")

    bvh = base.bvh
    host = getattr(bvh, "host", None)
    amin, amax = host["aabb_min"], host["aabb_max"]
    lf, cnt = host["left_first"], host["count"]
    m = amin.shape[0]

    t0 = time.time()
    roots, cfirst, ccnt = cl.cluster_cut(lf, cnt, tcap)
    print(f"cluster_cut: {time.time()-t0:.2f}s  C={len(roots)}")

    C = len(roots)
    is_cluster = np.zeros(m, bool)
    is_cluster[roots] = True
    cluster_of = np.full(m, -1, np.int32)
    cluster_of[roots] = np.arange(C, dtype=np.int32)
    t0 = time.time()
    node_idx, node_const, nw = cl._upper_node_tables(
        amin, amax, lf, cnt, is_cluster, cluster_of, tcap)
    print(f"_upper_node_tables: {time.time()-t0:.2f}s  nw={nw}")

    t0 = time.time()
    cs = cl.build_cluster_scene(bvh, base.tris, tcap=tcap)
    jax.block_until_ready(cs.ablocks)
    print(f"full build_cluster_scene (cold): {time.time()-t0:.2f}s")
    t0 = time.time()
    cs = cl.build_cluster_scene(bvh, base.tris, tcap=tcap)
    jax.block_until_ready(cs.ablocks)
    print(f"full build_cluster_scene (warm): {time.time()-t0:.2f}s")
    t0 = time.time()
    cs2 = cl.refresh_cluster_scene(cs, bvh, base.tris)
    jax.block_until_ready(cs2.ablocks)
    print(f"refresh only (warm): {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
