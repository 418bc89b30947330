"""Bisect which combination of refresh_cluster_scene pieces blows up XLA
compile at 1M-tri shapes (JAX_PLATFORMS=cpu)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from messyerraytracer_tpu.kernels import cluster as cl

C, T, M, NT = 23398, 64, 503000, 1008200


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    tl = time.time() - t0
    t0 = time.time()
    lowered.compile()
    print(f"{name}: lower {tl:.1f}s compile {time.time()-t0:.1f}s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    f3 = lambda n: jnp.asarray(rng.standard_normal((n, 3), np.float32))
    v0, e1, e2, nrm = f3(NT), f3(NT), f3(NT), f3(NT)
    amin, amax = f3(M), f3(M)
    slot_map = jnp.asarray(rng.integers(0, NT, C * T).astype(np.int32))
    cvalid = jnp.asarray(rng.random(C * T) < 0.9)
    croots = jnp.asarray(rng.integers(0, M, C).astype(np.int32))
    node_idx = jnp.asarray(
        rng.integers(0, 6 * M, (2493, 128)).astype(np.int32))
    node_const = jnp.zeros(9 * 4986 + 3, jnp.float32)
    pid = jnp.arange(C * T, dtype=jnp.int32)
    lay = jnp.ones(C * T, jnp.int32)

    def rows16_of(v0, e1, e2, slot_map, cvalid, anchors):
        vm = cvalid[:, None]
        v0g = jnp.where(vm, v0[slot_map], 0.0).reshape(C, T, 3)
        e1g = jnp.where(vm, e1[slot_map], 0.0).reshape(C, T, 3)
        e2g = jnp.where(vm, e2[slot_map], 0.0).reshape(C, T, 3)
        v0c = v0g - anchors[:, None, :]
        n = jnp.cross(e1g, e2g)
        pid_f = jnp.maximum(pid, 0).astype(jnp.float32)
        layu = lay.astype(jnp.uint32)
        lay_lo = (layu & 0xFFFF).astype(jnp.float32)
        lay_hi = jax.lax.shift_right_logical(
            layu, jnp.uint32(16)).astype(jnp.float32)
        return jnp.concatenate(
            [-n, jnp.cross(v0c, e2g), e2g, -jnp.cross(v0c, e1g), -e1g,
             -jnp.sum(v0c * n, axis=-1, keepdims=True),
             pid_f.reshape(C, T, 1), lay_lo.reshape(C, T, 1),
             lay_hi.reshape(C, T, 1)], axis=-1)

    def v_nodes(amin, amax, node_idx, node_const):
        node_src = jnp.concatenate(
            [amin.reshape(-1), amax.reshape(-1), node_const])
        return node_src[node_idx]

    timeit("nodes-gather", v_nodes, amin, amax, node_idx, node_const)

    def v_anchored_rows(amin, amax, croots, v0, e1, e2, slot_map, cvalid):
        anchors = 0.5 * (amin[croots] + amax[croots])
        return rows16_of(v0, e1, e2, slot_map, cvalid, anchors)

    timeit("anchors+rows16", v_anchored_rows, amin, amax, croots, v0, e1,
           e2, slot_map, cvalid)

    def v_rows_arrange(amin, amax, croots, v0, e1, e2, slot_map, cvalid):
        anchors = 0.5 * (amin[croots] + amax[croots])
        r = rows16_of(v0, e1, e2, slot_map, cvalid, anchors)
        counts = jnp.sum(cvalid.reshape(C, T), axis=1).astype(jnp.float32)
        return cl._arrange_ablocks(r, anchors, counts, T,
                                   cmin=amin[croots], cmax=amax[croots])

    timeit("anchors+rows16+arrange", v_rows_arrange, amin, amax, croots,
           v0, e1, e2, slot_map, cvalid)

    def v_all(amin, amax, croots, v0, e1, e2, nrm, slot_map, cvalid,
              node_idx, node_const):
        nodes = v_nodes(amin, amax, node_idx, node_const)
        ab = v_rows_arrange(amin, amax, croots, v0, e1, e2, slot_map,
                            cvalid)
        slot_nrm = jnp.where(cvalid[:, None], nrm[slot_map], 0.0)
        return nodes, ab, slot_nrm

    timeit("all", v_all, amin, amax, croots, v0, e1, e2, nrm, slot_map,
           cvalid, node_idx, node_const)


if __name__ == "__main__":
    main()
