"""Isolate which stage of refresh_cluster_scene explodes XLA compile time
at 1M tris (C~23K, T=64).  Run with JAX_PLATFORMS=cpu."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from messyerraytracer_tpu.kernels import cluster as cl

C, T = 23398, 64
NT = C * T


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    tl = time.time() - t0
    t0 = time.time()
    lowered.compile()
    tc = time.time() - t0
    print(f"{name}: lower {tl:.2f}s compile {tc:.2f}s", flush=True)


def main():
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal((NT, 3), np.float32))
    e1 = jnp.asarray(rng.standard_normal((NT, 3), np.float32))
    e2 = jnp.asarray(rng.standard_normal((NT, 3), np.float32))
    slot_map = jnp.asarray(rng.integers(0, NT, NT).astype(np.int32))
    cvalid = jnp.asarray(rng.random(NT) < 0.9)
    anchors = jnp.asarray(rng.standard_normal((C, 3), np.float32))
    cmin = anchors - 1.0
    cmax = anchors + 1.0
    pid = jnp.asarray(rng.integers(0, NT, NT).astype(np.int32))
    lay = jnp.asarray(np.ones(NT, np.int32))

    def stage_gather(v0, slot_map, cvalid):
        vm = cvalid[:, None]
        return jnp.where(vm, v0[slot_map], 0.0).reshape(C, T, 3)

    timeit("gather+reshape", stage_gather, v0, slot_map, cvalid)

    def stage_rows16(v0, e1, e2, slot_map, cvalid, anchors, pid, lay):
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

    timeit("rows16", stage_rows16, v0, e1, e2, slot_map, cvalid,
           anchors, pid, lay)

    rows16 = jnp.zeros((C, T, 19), jnp.float32)
    counts = jnp.full((C,), float(T), jnp.float32)

    def stage_arrange(rows16, anchors, counts, cmin, cmax):
        return cl._arrange_ablocks(rows16, anchors, counts, T,
                                   cmin=cmin, cmax=cmax)

    timeit("_arrange_ablocks", stage_arrange, rows16, anchors, counts,
           cmin, cmax)


if __name__ == "__main__":
    main()
