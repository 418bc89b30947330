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

VARIANTS = ["base", "dot", "s11", "prefix", "noif", "fixed", "nowrite",
            "whenpre", "bitloop"]


def _dma_kernel(hbm_ref, out_ref, land_ref, sems, *, iters, rows, perit,
                cond):
    """DMA-start issue cost: ``perit`` DMAs of ``rows``x128 f32 per
    iteration into an 8-slot ring (wait slot before reuse).  cond=True
    guards each start with pl.when(always-true-ish data-dep)."""
    def mk(slot, src):
        return pltpu.make_async_copy(
            hbm_ref.at[pl.ds(src * rows, rows), :],
            land_ref.at[pl.ds(slot * rows, rows), :], sems.at[slot])

    def body(c):
        i, acc = c
        for j in range(perit):
            slot = (i * perit + j) & 7
            src = (i * 37 + j) & 15

            @pl.when(i * perit + j >= 8)
            def _(slot=slot):
                mk(slot, 0).wait()
            if cond:
                go = ((i + j) & 1) == 0   # data-dep branch, taken ~50%

                @pl.when(go)
                def _(slot=slot, src=src):
                    mk(slot, src).start()

                @pl.when(jnp.logical_not(go))
                def _(slot=slot, src=src):
                    mk(slot, src).start()
            else:
                mk(slot, src).start()
        return (i + 1, acc)

    _, acc = jax.lax.while_loop(lambda c: c[0] < iters, body,
                                (jnp.int32(0), jnp.int32(0)))
    # drain the ring
    for slot in range(8):
        mk(slot, 0).wait()
    out_ref[0, 0] = acc


@functools.partial(jax.jit,
                   static_argnames=("iters", "rows", "perit", "cond"))
def run_dma(hbm, *, iters, rows, perit, cond):
    return pl.pallas_call(
        functools.partial(_dma_kernel, iters=iters, rows=rows,
                          perit=perit, cond=cond),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8 * 72, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )(hbm)


def _dual_kernel(nodes_ref, rays_ref, out_ref, stack_ref, colbc_ref, *,
                 iters, srows, nway):
    """nway independent full pop chains (base variant) per iteration —
    the dual-tile interleave experiment.  Compare ns/iter vs 1-way:
    if ~1.2x for 2 chains, independent tile chains pipeline."""
    O = tuple(rays_ref[pl.ds(f * srows, srows), :] for f in range(3))
    INV = tuple(rays_ref[pl.ds((3 + f) * srows, srows), :]
                for f in range(3))
    cap = rays_ref[pl.ds(6 * srows, srows), :]
    sgn = (jnp.sum(INV[0]) >= 0.0, jnp.sum(INV[1]) >= 0.0,
           jnp.sum(INV[2]) >= 0.0)
    for w in range(nway):
        stack_ref[w, 0] = jnp.int32(0)

    def chain(i, sp, w):
        nidx = ((i * 37) + w * 11) & 255
        block = nodes_ref[nidx >> 7]
        rot = pltpu.roll(block, -(nidx & 127), axis=1)
        colbc_ref[w * 64:(w + 1) * 64, :] = jnp.broadcast_to(
            rot[:, 0:1], (64, 128))

        def vget(k):
            return colbc_ref[w * 64 + k:w * 64 + k + 1, :]

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
        acc = m_lo * 0 + order[0][0] * 0
        for e_j, h_j in order:
            isleaf = (e_j & 1) == 1
            ws = h_j & jnp.logical_not(isleaf) & (sp < 63)
            stack_ref[w, jnp.where(ws, sp & 63, 63)] = e_j
            sp = (sp + ws.astype(jnp.int32)) & 63
        return acc, sp

    def body(c):
        i, acc, *sps = c
        outs = []
        for w in range(nway):
            a, sp = chain(i, sps[w], w)
            outs.append((a, sp))
        return (i + 1, acc + sum(a for a, _ in outs),
                *[sp for _, sp in outs])

    def cond(c):
        return c[0] < iters

    st = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.int32(0)) + tuple(jnp.int32(1)
                                             for _ in range(nway)))
    out_ref[0, 0] = st[1]


@functools.partial(jax.jit, static_argnames=("iters", "srows", "nway"))
def run_dual(nodes, rays, *, iters, srows, nway):
    return pl.pallas_call(
        functools.partial(_dual_kernel, iters=iters, srows=srows,
                          nway=nway),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((4, 64), jnp.int32),
            pltpu.VMEM((4 * 64, 128), jnp.float32),
        ],
    )(nodes, rays)


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

        if variant != "dot":
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
        if variant == "smemrd":
            # 21 dynamic SMEM reads (the TLAS drain's per-instance
            # transform scalars) chained into the output
            s = jnp.int32(0)
            li = (i * 13) & 63
            for j in range(21):
                s = s + stack_ref[1, (li + j) & 63]
            out = out + s * 0
        if variant in ("base2", "stagewl"):
            # controlled push rate: only children 1 and 6 can push
            order = tuple(
                (e_j, h_j & jnp.bool_(j in (1, 6)))
                for j, (e_j, h_j) in enumerate(order))
        if variant == "stagewl":
            # stage candidates at STATIC slots (measured ~free), then
            # dynamic-store only the ~k ACTUAL pushes via a ctz loop
            for j, (e_j, h_j) in enumerate(order):
                stack_ref[1, j] = e_j
            pm = jnp.int32(0)
            for j, (e_j, h_j) in enumerate(order):
                pm = pm + (jnp.where(h_j & ((e_j & 1) == 0), 1, 0) << j)

            def pbody(c):
                pmc, sp_i = c
                lsb = pmc & -pmc
                k = (jnp.where((lsb & 0xF0) != 0, 4, 0)
                     + jnp.where((lsb & 0xCC) != 0, 2, 0)
                     + jnp.where((lsb & 0xAA) != 0, 1, 0))
                stack_ref[0, sp_i & 63] = stack_ref[1, k]
                return (pmc & (pmc - 1), sp_i + 1)

            pm, sp = jax.lax.while_loop(lambda c: c[0] != 0, pbody,
                                        (pm, sp))
            sp = sp & 63
        elif variant in ("prefix", "noif"):
            # prefix-sum push: every write's address depends only on sp
            # and the (log-depth) prefix counts — no serial sp chain
            ws_l = [h_j & ((e_j & 1) == 0) for e_j, h_j in order]
            wi_l = [w.astype(jnp.int32) for w in ws_l]
            pre = [jnp.int32(0)]
            for k in range(1, 8):
                pre.append(pre[k - 1] + wi_l[k - 1])  # XLA tree-folds
            for k, (e_j, h_j) in enumerate(order):
                pos = (sp + pre[k]) & 63
                stack_ref[0, jnp.where(ws_l[k], pos, 63)] = e_j
            sp = (sp + pre[7] + wi_l[7]) & 63
        elif variant == "whenpre":
            # prefix addresses + pl.when-guarded writes: only actual
            # pushes pay the ~42ns dynamic SMEM write
            ws_l = [h_j & ((e_j & 1) == 0) for e_j, h_j in order]
            wi_l = [w.astype(jnp.int32) for w in ws_l]
            pre = [jnp.int32(0)]
            for k in range(1, 8):
                pre.append(pre[k - 1] + wi_l[k - 1])
            for k, (e_j, h_j) in enumerate(order):
                pos = (sp + pre[k]) & 63

                @pl.when(ws_l[k])
                def _(pos=pos, e_j=e_j):
                    stack_ref[0, pos] = e_j
            sp = (sp + pre[7] + wi_l[7]) & 63
        elif variant == "bitloop":
            # pack push decisions into one int, drain set bits in a
            # while loop — #pushes dynamic writes instead of 8
            ws_l = [h_j & ((e_j & 1) == 0) for e_j, h_j in order]
            packed = functools.reduce(
                lambda a, b: a | b,
                [w.astype(jnp.int32) << k for k, w in enumerate(ws_l)])
            encs_v = [e_j for e_j, _ in order]

            def pbody(c):
                pm, sp_i = c
                lsb = pm & -pm
                k = (jnp.where((lsb & 0xF0) != 0, 4, 0)
                     + jnp.where((lsb & 0xCC) != 0, 2, 0)
                     + jnp.where((lsb & 0xAA) != 0, 1, 0))
                val = encs_v[0]
                for j in range(1, 8):
                    val = jnp.where(k == j, encs_v[j], val)
                stack_ref[0, sp_i & 63] = val
                return (pm & (pm - 1), sp_i + 1)

            pm, sp = jax.lax.while_loop(
                lambda c: c[0] != 0, pbody, (packed, sp))
            sp = sp & 63
        elif variant == "fixed":
            # full push-decision math, but writes land at STATIC slots
            sp2 = sp
            for k, (e_j, h_j) in enumerate(order):
                isleaf = (e_j & 1) == 1
                ws = h_j & jnp.logical_not(isleaf) & (sp2 < 63)
                stack_ref[0, k] = e_j
                sp2 = (sp2 + ws.astype(jnp.int32)) & 63
            sp = sp2
        elif variant == "nowrite":
            # push-decision math + sp chain, no SMEM writes at all
            sp2 = sp
            for e_j, h_j in order:
                isleaf = (e_j & 1) == 1
                ws = h_j & jnp.logical_not(isleaf) & (sp2 < 63)
                sp2 = (sp2 + ws.astype(jnp.int32)) & 63
            sp = sp2
        else:
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
            pltpu.SMEM((2, 64), jnp.int32),
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
        if variant.startswith("dma"):
            # dma<perit>[c]  e.g. dma2, dma2c (conditional)
            spec = variant[3:]
            cond = spec.endswith("c")
            perit = int(spec.rstrip("c") or "1")
            hbm = jnp.asarray(
                rng.uniform(-1, 1, (16 * 72, 128)).astype(np.float32))
            r = run_dma(hbm, iters=args.iters, rows=72, perit=perit,
                        cond=cond)
            int(r[0, 0])
            t0 = time.time()
            for _ in range(4):
                r = run_dma(hbm, iters=args.iters, rows=72, perit=perit,
                            cond=cond)
            int(r[0, 0])
            dt = (time.time() - t0) / 4
            print(f"{variant:6s}: {dt * 1e9 / args.iters:8.1f} ns/iter "
                  f"({dt * 1e9 / args.iters / perit:7.1f} ns/dma)",
                  flush=True)
            continue
        if variant.startswith("nway"):
            nw = int(variant[4:])
            r = run_dual(nodes, rays, iters=args.iters, srows=args.srows,
                         nway=nw)
            int(r[0, 0])
            t0 = time.time()
            for _ in range(4):
                r = run_dual(nodes, rays, iters=args.iters,
                             srows=args.srows, nway=nw)
            int(r[0, 0])
            dt = (time.time() - t0) / 4
            print(f"{variant:5s}: {dt * 1e9 / args.iters:8.1f} ns/iter "
                  f"({dt * 1e9 / args.iters / nw:7.1f} ns/chain)",
                  flush=True)
            continue
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
