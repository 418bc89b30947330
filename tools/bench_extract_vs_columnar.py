"""Microbenchmark: scalar-extract leaf MT vs columnar broadcast leaf MT.

The megakernel's traversal iteration spends most of its time on ~200
vector->scalar lane extracts (triangle/node fields read out of rolled
(1,128) rows one scalar at a time, then re-broadcast by the VPU).  The
columnar layout stores each leaf's fields down a lane COLUMN of a
(40,128) block: one dynamic block load + lane roll + one lane-broadcast
turns every field into a (1,128) vector operand — zero per-field scalar
moves.

Usage: python tools/bench_extract_vs_columnar.py [--iters 2000] [--cpu]
Prints ns/iteration for both bodies on the current device.
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SROWS = 16
SHAPE = (SROWS, 128)
LEAF_CAP = 4
LEAF_STRIDE = 64
LEAVES_PER_ROW = 2
NFIELD = 40  # 36 tri floats + count + pad


def _mt_from_scalars(o, d, get, best_t):
    for k in range(LEAF_CAP):
        b = 9 * k
        v0 = (get(b), get(b + 1), get(b + 2))
        e1 = (get(b + 3), get(b + 4), get(b + 5))
        e2 = (get(b + 6), get(b + 7), get(b + 8))
        pvx = d[1] * e2[2] - d[2] * e2[1]
        pvy = d[2] * e2[0] - d[0] * e2[2]
        pvz = d[0] * e2[1] - d[1] * e2[0]
        det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
        ok = jnp.abs(det) >= 1e-8
        idet = 1.0 / jnp.where(ok, det, 1.0)
        tvx = o[0] - v0[0]
        tvy = o[1] - v0[1]
        tvz = o[2] - v0[2]
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * idet
        qvx = tvy * e1[2] - tvz * e1[1]
        qvy = tvz * e1[0] - tvx * e1[2]
        qvz = tvx * e1[1] - tvy * e1[0]
        v = (d[0] * qvx + d[1] * qvy + d[2] * qvz) * idet
        t = (e2[0] * qvx + e2[1] * qvy + e2[2] * qvz) * idet
        valid = (ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                 & (u + v <= 1.0) & (t >= 1e-3) & (t < best_t))
        best_t = jnp.where(valid, t, best_t)
    return best_t


def kernel_extract(rays, leaf_rows, out, *, iters, nleaf):
    o = tuple(rays[f * SROWS:(f + 1) * SROWS, :] for f in range(3))
    d = tuple(rays[(3 + f) * SROWS:(4 + f) * SROWS, :] for f in range(3))

    def body(i, carry):
        li, best_t = carry
        row = leaf_rows[pl.ds(li // LEAVES_PER_ROW, 1), :]
        rot = pltpu.roll(row, -(li % LEAVES_PER_ROW) * LEAF_STRIDE, axis=1)
        best_t = _mt_from_scalars(o, d, lambda k: rot[0, k], best_t)
        li = (li * 5 + 1) % nleaf  # scalar chain, like queue pops
        return li, best_t

    li0 = jnp.int32(0)
    bt0 = jnp.full(SHAPE, 3e38, jnp.float32)
    _, best = jax.lax.fori_loop(0, iters, body, (li0, bt0))
    out[:, :] = best


def kernel_columnar(rays, leaf_col, out, bc_ref, *, iters, nleaf):
    o = tuple(rays[f * SROWS:(f + 1) * SROWS, :] for f in range(3))
    d = tuple(rays[(3 + f) * SROWS:(4 + f) * SROWS, :] for f in range(3))

    def body(i, carry):
        li, best_t = carry
        block = leaf_col[li >> 7]                      # (NFIELD, 128)
        rot = pltpu.roll(block, -(li & 127), axis=1)
        # scratch-ref round trip pins the (F,128) broadcast (slicing the
        # value directly gets folded into an unsupported (1,1) broadcast)
        bc_ref[:, :] = jnp.broadcast_to(rot[:, 0:1], (NFIELD, 128))
        best_t = _mt_from_scalars(o, d, lambda k: bc_ref[k:k + 1, :],
                                  best_t)
        li = (li * 5 + 1) % nleaf
        return li, best_t

    li0 = jnp.int32(0)
    bt0 = jnp.full(SHAPE, 3e38, jnp.float32)
    _, best = jax.lax.fori_loop(0, iters, body, (li0, bt0))
    out[:, :] = best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    nleaf = 1024
    # same triangles in both layouts
    tris = rng.uniform(-1, 1, (nleaf, NFIELD)).astype(np.float32)
    tris[:, 36:] = 4.0
    rows = np.zeros((nleaf // LEAVES_PER_ROW, 128), np.float32)
    for li in range(nleaf):
        r, c = li // LEAVES_PER_ROW, (li % LEAVES_PER_ROW) * LEAF_STRIDE
        rows[r, c:c + NFIELD] = tris[li]
    cols = np.zeros((nleaf // 128, NFIELD, 128), np.float32)
    for li in range(nleaf):
        cols[li >> 7, :, li & 127] = tris[li]

    rays = rng.normal(size=(8 * SROWS, 128)).astype(np.float32)

    def run(kern, table, scratch_shapes=()):
        f = pl.pallas_call(
            functools.partial(kern, iters=args.iters, nleaf=nleaf),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch_shapes),
            interpret=args.interpret,
        )
        g = jax.jit(lambda r, t: f(r, t))
        res = g(rays, table)
        float(jnp.sum(res))  # warm + fence
        t0 = time.time()
        for _ in range(args.reps):
            res = g(rays, table)
        float(jnp.sum(res))
        dt = (time.time() - t0) / args.reps
        return dt / args.iters * 1e9, res

    ns_a, res_a = run(kernel_extract, jnp.asarray(rows))
    print(f"extract : {ns_a:8.1f} ns/iter", flush=True)
    ns_b, res_b = run(kernel_columnar, jnp.asarray(cols),
                      [pltpu.VMEM((NFIELD, 128), jnp.float32)])
    print(f"columnar: {ns_b:8.1f} ns/iter  (speedup {ns_a/ns_b:.2f}x)",
          flush=True)
    same = np.allclose(np.asarray(res_a), np.asarray(res_b))
    print("results match:", same, flush=True)


if __name__ == "__main__":
    main()
