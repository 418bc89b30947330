"""Compile-time the REAL refresh_cluster_scene at 1M-tri shapes with
synthetic inputs (JAX_PLATFORMS=cpu)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from messyerraytracer_tpu.accel.bvh import BVH
from messyerraytracer_tpu.core.types import Triangles
from messyerraytracer_tpu.kernels import cluster as cl
from messyerraytracer_tpu.kernels.wide import NODE8_STRIDE, NODES8_PER_ROW


def main():
    C, T, M, NT = 23398, 64, 503000, 1008200
    nw = 4985
    num_wide = nw + 1
    rng = np.random.default_rng(0)

    f3 = lambda n: jnp.asarray(rng.standard_normal((n, 3), np.float32))
    tris = Triangles(
        v0=f3(NT), edge1=f3(NT), edge2=f3(NT), normal=f3(NT),
        prim_id=jnp.arange(NT, dtype=jnp.int32),
        layers=jnp.ones(NT, jnp.int32),
    )
    bvh = BVH(
        aabb_min=f3(M), aabb_max=f3(M),
        left_first=jnp.zeros(M, jnp.int32), count=jnp.zeros(M, jnp.int32),
        tri_order=jnp.arange(NT, dtype=jnp.int32),
        split_axis=jnp.zeros(M, jnp.int32),
        levels=tuple(jnp.zeros(8, jnp.int32) for _ in range(40)),
    )
    npad = -(-num_wide * NODE8_STRIDE // (NODES8_PER_ROW * NODE8_STRIDE))
    node_idx = jnp.zeros(
        (npad * NODES8_PER_ROW // NODES8_PER_ROW, NODES8_PER_ROW
         * NODE8_STRIDE), jnp.int32)
    cs = cl.ClusterScene(
        nodes=jnp.zeros((1, 1), jnp.float32),
        ablocks=jnp.zeros((1, 1), jnp.float32),
        slot_prim_id=jnp.zeros(C * T, jnp.int32),
        slot_layers=jnp.ones(C * T, jnp.int32),
        slot_normal=jnp.zeros((1, 3), jnp.float32),
        slot_tri=jnp.zeros(C * T, jnp.int32),
        node_idx=node_idx,
        node_const=jnp.zeros(9 * num_wide + 3 + 8 * num_wide, jnp.float32),
        croots=jnp.zeros(C, jnp.int32),
        slot_map=jnp.asarray(
            rng.integers(0, NT, C * T).astype(np.int32)),
        cvalid=jnp.asarray(rng.random(C * T) < 0.9),
        tcap=T, dummy_enc=2 * nw, num_clusters=C,
    )
    t0 = time.time()
    lowered = cl.refresh_cluster_scene.lower(cs, bvh, tris)
    print(f"lower: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    lowered.compile()
    print(f"compile: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
