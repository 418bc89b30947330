"""Ablate the REAL refresh_cluster_scene signature/body to find the
compile blowup (JAX_PLATFORMS=cpu)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from messyerraytracer_tpu.accel.bvh import BVH
from messyerraytracer_tpu.core.types import Triangles
from messyerraytracer_tpu.kernels import cluster as cl

C, T, M, NT = 23398, 64, 503000, 1008200
NW = 4985


def make_inputs():
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
    num_wide = NW + 1
    cs = cl.ClusterScene(
        nodes=jnp.zeros((1, 1), jnp.float32),
        ablocks=jnp.zeros((1, 1), jnp.float32),
        slot_prim_id=jnp.zeros(C * T, jnp.int32),
        slot_layers=jnp.ones(C * T, jnp.int32),
        slot_normal=jnp.zeros((1, 3), jnp.float32),
        slot_tri=jnp.zeros(C * T, jnp.int32),
        node_idx=jnp.asarray(
            np.random.default_rng(1).integers(
                0, 6 * M, (2493, 128)).astype(np.int32)),
        node_const=jnp.zeros(17 * num_wide + 3, jnp.float32),
        croots=jnp.asarray(
            np.random.default_rng(2).integers(0, M, C).astype(np.int32)),
        slot_map=jnp.asarray(
            np.random.default_rng(3).integers(
                0, NT, C * T).astype(np.int32)),
        cvalid=jnp.asarray(np.random.default_rng(4).random(C * T) < 0.9),
        tcap=T, dummy_enc=2 * NW, num_clusters=C,
    )
    return cs, bvh, tris


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    tl = time.time() - t0
    t0 = time.time()
    lowered.compile()
    print(f"{name}: lower {tl:.1f}s compile {time.time()-t0:.1f}s",
          flush=True)


def body(cs, bvh, tris, *, do_nodes=True, do_ablocks=True, do_nrm=True,
         do_replace=True):
    tcap, c = cs.tcap, cs.num_clusters
    nodes = cs.nodes
    if do_nodes:
        node_src = jnp.concatenate(
            [bvh.aabb_min.reshape(-1), bvh.aabb_max.reshape(-1),
             cs.node_const])
        nodes = node_src[cs.node_idx]
    ablocks = cs.ablocks
    if do_ablocks:
        anchors = 0.5 * (bvh.aabb_min[cs.croots] + bvh.aabb_max[cs.croots])
        vmask = cs.cvalid[:, None]
        v0 = jnp.where(vmask, tris.v0[cs.slot_map], 0.0).reshape(c, tcap, 3)
        e1 = jnp.where(vmask, tris.edge1[cs.slot_map], 0.0).reshape(
            c, tcap, 3)
        e2 = jnp.where(vmask, tris.edge2[cs.slot_map], 0.0).reshape(
            c, tcap, 3)
        v0c = v0 - anchors[:, None, :]
        n = jnp.cross(e1, e2)
        pid_f = jnp.maximum(cs.slot_prim_id, 0).astype(jnp.float32)
        lay = cs.slot_layers.astype(jnp.uint32)
        lay_lo = (lay & 0xFFFF).astype(jnp.float32)
        lay_hi = jax.lax.shift_right_logical(
            lay, jnp.uint32(16)).astype(jnp.float32)
        rows16 = jnp.concatenate(
            [-n, jnp.cross(v0c, e2), e2, -jnp.cross(v0c, e1), -e1,
             -jnp.sum(v0c * n, axis=-1, keepdims=True),
             pid_f.reshape(c, tcap, 1), lay_lo.reshape(c, tcap, 1),
             lay_hi.reshape(c, tcap, 1)],
            axis=-1,
        )
        counts = jnp.sum(cs.cvalid.reshape(c, tcap), axis=1).astype(
            jnp.float32)
        ablocks = cl._arrange_ablocks(
            rows16, anchors, counts, tcap,
            cmin=bvh.aabb_min[cs.croots], cmax=bvh.aabb_max[cs.croots])
    slot_nrm = cs.slot_normal
    if do_nrm:
        slot_nrm = jnp.where(cs.cvalid[:, None], tris.normal[cs.slot_map],
                             0.0)
    if do_replace:
        return cs.replace(nodes=nodes, ablocks=ablocks,
                          slot_normal=slot_nrm)
    return nodes, ablocks, slot_nrm


def main():
    cs, bvh, tris = make_inputs()
    import functools
    timeit("nodes-only", functools.partial(
        body, do_ablocks=False, do_nrm=False, do_replace=False),
        cs, bvh, tris)
    timeit("ablocks-only", functools.partial(
        body, do_nodes=False, do_nrm=False, do_replace=False),
        cs, bvh, tris)
    timeit("all-tuple", functools.partial(body, do_replace=False),
           cs, bvh, tris)
    timeit("all-replace", body, cs, bvh, tris)


if __name__ == "__main__":
    main()
