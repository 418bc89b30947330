"""Pop-chain latency variants (round 5, VERDICT r4 #3).

The v2 kernel's serial pop chain measures ~1.6 us against ~0.45 us of
vector work (PERF.md r4).  The suspected latency links are the
(64,128) VMEM broadcast round trip (write colbc_ref, read (1,128) rows
back) and the roll itself.  This tool times full pop iterations
(read + bcast + slab + reduce + scalar + push, the ubench_pop "push"
level) under different broadcast strategies:

  base   — current kernel: broadcast_to -> VMEM scratch -> row reads
  dot    — MXU rank-1 broadcast: rot[:, :1] @ ones(1,128) as a VALUE,
           fields sliced from the value (no scratch round trip)
  s11    — no broadcast at all: each field used as a (1,1) slice operand
           (tests whether Mosaic now lowers both-axis broadcasts)
  iota   — select-based broadcast: jnp.where(lane_iota == 0) trick kept
           as a value via max-reduction over lanes... (documented
           failure if unsupported)

Usage: python tools/ubench_pop2.py [--iters 20000] [--srows 16]
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

VARIANTS = ["base", "dot", "s11"]


def _kernel(nodes_ref, rays_ref, out_ref, stack_ref, colbc_ref, *,
            iters, srows, variant):
    O = tuple(rays_ref[pl.ds(f * srows, srows), :] for f in range(3))
    INV = tuple(rays_ref[pl.ds((3 + f) * srows, srows), :]
                for f in range(3))
    cap = rays_ref[pl.ds(6 * srows, srows), :]
    sgn = (jnp.sum(INV[0]) >= 0.0, jnp.sum(INV[1]) >= 0.0,
           jnp.sum(INV[2]) >= 0.0)
    stack_ref[0, 0] = jnp.int32(0)
    ones = jnp.ones((1, 128), jnp.float32)

    def body(c):
        i, acc, sp = c
        nidx = (i * 37) & 255
        block = nodes_ref[nidx >> 7]
        rot = pltpu.roll(block, -(nidx & 127), axis=1)

        if variant == "base":
            colbc_ref[0:64, :] = jnp.broadcast_to(rot[:, 0:1], (64, 128))

            def vget(k):
                return colbc_ref[k:k + 1, :]
        elif variant == "dot":
            colbc = jax.lax.dot_general(
                rot[:, 0:1], ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            def vget(k):
                return colbc[k:k + 1, :]
        elif variant == "s11":
            def vget(k):
                return rot[k:k + 1, 0:1]

        def slab_hit(b0):
            t1 = (vget(b0) - O[0]) * INV[0]
            t2 = (vget(b0 + 3) - O[0]) * INV[0]
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            t1 = (vget(b0 + 1) - O[1]) * INV[1]
            t2 = (vget(b0 + 4) - O[1]) * INV[1]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            t1 = (vget(b0 + 2) - O[2]) * INV[2]
            t2 = (vget(b0 + 5) - O[2]) * INV[2]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            return (tf >= jnp.maximum(tn, 0.0)) & (tn <= cap)

        hits = [slab_hit(6 * k) for k in range(8)]
        lo = hi = None
        for k in range(8):
            col = jnp.max(hits[k].astype(jnp.int32), axis=0,
                          keepdims=True)
            term = col * (1 << (8 * (k % 4)))
            if k < 4:
                lo = term if lo is None else lo + term
            else:
                hi = term if hi is None else hi + term
        m_lo = jnp.sum(lo)
        m_hi = jnp.sum(hi)
        anyk = [
            (jax.lax.shift_right_logical(
                m_lo if k < 4 else m_hi, 8 * (k % 4)) & 255) > 0
            for k in range(8)
        ]
        encs = [rot[48 + k, 0].astype(jnp.int32) for k in range(8)]
        axis = rot[56, 0].astype(jnp.int32)
        fwd = jnp.where(axis == 0, sgn[0],
                        jnp.where(axis == 1, sgn[1], sgn[2]))
        order = tuple(
            (jnp.where(fwd, encs[j], encs[7 - j]),
             jnp.where(fwd, anyk[j], anyk[7 - j]))
            for j in range(7, -1, -1)
        )
        out = acc + m_lo * 0 + order[0][0] * 0
        for e_j, h_j in order:
            isleaf = (e_j & 1) == 1
            ws = h_j & jnp.logical_not(isleaf) & (sp < 63)
            stack_ref[0, jnp.where(ws, sp & 63, 63)] = e_j
            sp = (sp + ws.astype(jnp.int32)) & 63
        return (i + 1, out, sp)

    def cond(c):
        return c[0] < iters

    _, acc, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(1)))
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("iters", "srows", "variant"))
def run(nodes, rays, *, iters, srows, variant):
    return pl.pallas_call(
        functools.partial(_kernel, iters=iters, srows=srows,
                          variant=variant),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((1, 64), jnp.int32),
            pltpu.VMEM((64, 128), jnp.float32),
        ],
    )(nodes, rays)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--srows", type=int, default=16)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    nodes = jnp.asarray(
        rng.uniform(-1, 1, (2, 64, 128)).astype(np.float32))
    rays = jnp.asarray(rng.uniform(0.1, 1, (8 * args.srows, 128))
                       .astype(np.float32))
    for variant in args.variants.split(","):
        try:
            r = run(nodes, rays, iters=args.iters, srows=args.srows,
                    variant=variant)
            int(r[0, 0])
            t0 = time.time()
            for _ in range(4):
                r = run(nodes, rays, iters=args.iters, srows=args.srows,
                        variant=variant)
            int(r[0, 0])
            dt = (time.time() - t0) / 4
            print(f"{variant:5s}: {dt * 1e9 / args.iters:8.1f} ns/iter",
                  flush=True)
        except Exception as e:
            print(f"{variant:5s}: FAILED {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
