"""Compare compile time of _arrange_ablocks formulations at 1M shapes
(JAX_PLATFORMS=cpu)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

C, T = 23398, 64
BR = T + 8


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    tl = time.time() - t0
    t0 = time.time()
    lowered.compile()
    print(f"{name}: lower {tl:.1f}s compile {time.time()-t0:.1f}s",
          flush=True)


def make_args():
    rng = np.random.default_rng(0)
    NT = C * T
    v0 = jnp.asarray(rng.standard_normal((NT, 3), np.float32))
    slot_map = jnp.asarray(rng.integers(0, NT, NT).astype(np.int32))
    cvalid = jnp.asarray(rng.random(NT) < 0.9)
    anchors = jnp.asarray(rng.standard_normal((C, 3), np.float32))
    pid = jnp.zeros(NT, jnp.int32)
    lay = jnp.ones(NT, jnp.int32)
    return v0, slot_map, cvalid, anchors, pid, lay


def rows16_of(v0, slot_map, cvalid, anchors, pid, lay):
    vm = cvalid[:, None]
    v0g = jnp.where(vm, v0[slot_map], 0.0).reshape(C, T, 3)
    e1g = jnp.where(vm, v0[slot_map] * 2.0, 0.0).reshape(C, T, 3)
    e2g = jnp.where(vm, v0[slot_map] * 3.0, 0.0).reshape(C, T, 3)
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


def v_current(v0, slot_map, cvalid, anchors, pid, lay):
    from messyerraytracer_tpu.kernels.cluster import _arrange_ablocks
    rows16 = rows16_of(v0, slot_map, cvalid, anchors, pid, lay)
    counts = jnp.sum(cvalid.reshape(C, T), axis=1).astype(jnp.float32)
    return _arrange_ablocks(rows16, anchors, counts, T,
                            cmin=anchors - 1.0, cmax=anchors + 1.0)


def v_pad(v0, slot_map, cvalid, anchors, pid, lay):
    rows16 = rows16_of(v0, slot_map, cvalid, anchors, pid, lay)
    counts = jnp.sum(cvalid.reshape(C, T), axis=1).astype(jnp.float32)
    cmin, cmax = anchors - 1.0, anchors + 1.0
    body = jnp.pad(rows16, ((0, 0), (0, 0), (0, 128 - rows16.shape[2])))
    meta10 = jnp.concatenate(
        [anchors, counts[:, None], cmin, cmax], axis=1)      # (C, 10)
    meta = jnp.pad(meta10, ((0, 0), (0, 118)))[:, None, :]   # (C, 1, 128)
    bc = jnp.broadcast_to(
        jnp.concatenate([cmin, cmax], axis=1)[:, :, None], (C, 6, 128))
    zpad = jnp.zeros((C, 1, 128), jnp.float32)
    slabs = jnp.concatenate([body, meta, bc, zpad], axis=1)
    slabs = slabs.reshape(C * BR, 128)
    return jnp.pad(slabs, ((0, BR), (0, 0)))


def main():
    args = make_args()
    timeit("pad-variant", v_pad, *args)
    timeit("current", v_current, *args)


if __name__ == "__main__":
    main()
