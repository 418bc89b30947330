"""Pallas packet-traversal kernel — the hot cast path.

Design (TPU-first, not a port): the reference parallelizes one *thread per
ray* with a per-thread stack (bvh_traverse.comp.glsl:157-161) — on a TPU
that shape is hostile (per-lane gathers, divergent control flow).  Instead we
traverse *tiles of rays* (8x128 = 1024 each, coherence-sorted) in lockstep
against a shared DFS stack in SMEM:

  * scalar control flow (stack pointer, node ids) lives in SMEM/registers,
  * every AABB slab test / Moller-Trumbore runs as a dense (8,128) VPU op
    over the whole tile with node/triangle data broadcast from scalars,
  * one wide node per fetch = both children's AABBs (see kernels/wide.py),
    fetched by dynamic-sublane row load + dynamic lane rotate + scalar reads,
  * front-to-back ordering per tile: the child whose minimum entry-t over
    hitting rays is smaller pops first (packet analogue of the per-ray
    near-child-first push, bvh_traverse.comp.glsl:287-318),
  * a child is pushed only if ANY ray in the tile hits its box with entry-t
    not beyond that ray's current best-t (bvh_traverse.comp.glsl:251),
  * leaves are 4 dense MT tests (padding tris have zero edges and
    self-reject on the determinant epsilon).

**Branch-free pops + unrolling — the latency tricks.**  A traversal is a
serial dependency chain: each pop's target comes from SMEM writes and
reductions of the previous pop, so branchy code cannot pipeline (measured:
a lax.cond leaf/internal split serializes the whole body).  Instead every
pop unconditionally fetches BOTH a node row and a leaf row — one of them a
never-hit dummy (NaN boxes / zero-edge triangles, the NaN-sentinel trick of
gpu_ray_caster.cpp:263-268) — so the body is straight-line vector code, and
UNROLL pops are processed per loop iteration so their fetch/compute chains
overlap (the TPU answer to GPU warp-level latency hiding).

This is 1024-wide packet traversal (the reference's 4-wide RayPacket4,
src/simd/ray_packet.h, scaled to the VPU) with software pipelining.

Stats note: packet traversal shares node visits across a tile, so
``bvh_nodes_visited`` counts tile-level pops (an upper bound per ray);
``tri_tests`` counts the real triangles in each visited leaf per ray.
Exact per-ray stats come from the jnp reference path (accel/traverse.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import (
    INV_DIR_EPS,
    MT_DET_EPS,
    NO_HIT,
    T_MAX_DEFAULT,
    Hits,
    Rays,
    RayStats,
)
from .wide import (
    LEAF_CAP,
    LEAF_STRIDE,
    LEAVES_PER_ROW,
    NODE8_STRIDE,
    NODE_STRIDE,
    NODES8_PER_ROW,
    NODES_PER_ROW,
    WIDE8_CAP,
    WideScene,
)

SROWS = 16                     # sublane rows per ray tile (measured best)
COL_LEAF_F = 40                # columnar leaf fields (36 tri + count + pad)
MEGA_COLUMNAR = True           # columnar layout (measured +5% v5e)
MEGA_COND_DRAIN = True         # skip dummy leaf drains (measured +2%)
MEGA_UNROLL = 2                # pops per while body (measured +2%)
MEGA_OR_ANY = False            # tree-OR child-any reduction (knob)
DIM_SEMANTICS = "arbitrary"    # grid dimension semantics (perf knob)
VMEM_LIMIT = 100 * 1024 * 1024  # Mosaic VMEM budget (perf/capacity knob)
N_SLOTS = 1                    # interleaved tile traversals (1 measured best)
KSTACK = 64                    # DFS stack depth (README.md:131)
MAX_ITERS = 1 << 20            # runaway-loop guard per tile (the reference's
                               # MAX_ITERATIONS, bvh_traverse.comp.glsl:158)
_BIG = 3.0e38  # python float: jnp scalars would be captured consts in the kernel


def _traverse_kernel(
    ox, oy, oz, dx, dy, dz, tmn, tmx,          # ray refs (n_slots*8, 128)
    nodes_hbm, leaf_hbm,                        # scene refs (HBM, full)
    t_out, slot_out, u_out, v_out, tt_out, pops_out,
    stack_ref, nodes_ref, leaf_ref, sems,       # scratch
    *, any_hit: bool, n_slots: int, dummy_enc: int, dummy_leaf: int,
    stream_leaves: bool, stream_nodes: bool, srows: int = SROWS,
    branching: int = 2,
):
    shape = (srows, 128)
    npr = NODES8_PER_ROW if branching == 8 else NODES_PER_ROW
    nstride = NODE8_STRIDE if branching == 8 else NODE_STRIDE

    # Stage the scene into VMEM once: scratch persists across grid steps,
    # so only the first tile pays the HBM->VMEM copy (rather than every
    # step re-staging megabytes of nodes/triangles).  In stream_leaves mode
    # the leaf array exceeds VMEM and stays in HBM; each leaf pop DMAs its
    # single 512B row instead (the big-scene fallback, PERF.md item 4 —
    # the reference's analogous move is its 512K-ray TDR chunking,
    # gpu_ray_caster.cpp:427-430: trade latency for capacity).
    @pl.when(pl.program_id(0) == 0)
    def _():
        if not stream_nodes:
            c1 = pltpu.make_async_copy(nodes_hbm, nodes_ref, sems.at[0])
            c1.start()
        if not stream_leaves:
            c2 = pltpu.make_async_copy(leaf_hbm, leaf_ref, sems.at[1])
            c2.start()
            c2.wait()
        if not stream_nodes:
            c1.wait()

    def safe_inv(x):
        small = jnp.abs(x) < INV_DIR_EPS
        sign = jnp.where(x < 0.0, -1.0, 1.0)
        return jnp.where(small, sign / INV_DIR_EPS, 1.0 / jnp.where(small, 1.0, x))

    # Per-slot ray tiles (static row windows); each slot traverses its own
    # 1024-ray tile with its own SMEM stack row, so the slots' serial
    # reduction/push chains overlap in the schedule.
    O, D, INV, TMIN, TMAX = [], [], [], [], []
    for si in range(n_slots):
        r0 = si * srows
        O.append((ox[r0:r0+srows, :], oy[r0:r0+srows, :], oz[r0:r0+srows, :]))
        D.append((dx[r0:r0+srows, :], dy[r0:r0+srows, :], dz[r0:r0+srows, :]))
        INV.append(tuple(safe_inv(x) for x in D[si]))
        TMIN.append(tmn[r0:r0+srows, :])
        TMAX.append(tmx[r0:r0+srows, :])
        stack_ref[si, 0] = jnp.int32(0)  # root (internal, leaf bit 0)

    # Per-tile dominant direction sign per axis: drives front-to-back child
    # ordering without per-node reductions (the packet analogue of the
    # reference's per-ray dir_sign ordering, src/core/ray.h:92-95 +
    # README.md:131).
    SIGN = []
    for si in range(n_slots):
        SIGN.append(tuple(jnp.sum(D[si][a]) >= 0.0 for a in range(3)))

    stream_all = stream_nodes and stream_leaves
    prefetch = stream_nodes or stream_leaves

    def _leaf_copy(si, idx2, parity):
        """Copy descriptor for leaf row ``idx2`` into the parity-selected
        landing slot.  Landing slots double-buffer by iteration parity so a
        prefetch never overwrites the row the current iteration reads."""
        return pltpu.make_async_copy(
            leaf_hbm.at[pl.ds(idx2 // LEAVES_PER_ROW, 1), :],
            leaf_ref.at[pl.ds(2 * si + parity, 1), :], sems.at[3 + si],
        )

    def _node_copy(si, idx2, parity):
        return pltpu.make_async_copy(
            nodes_hbm.at[pl.ds(idx2 // npr, 1), :],
            nodes_ref.at[pl.ds(2 * si + parity, 1), :], sems.at[3 + si],
        )

    def _start_prefetch(si, e, parity):
        """Start the DMA for entry ``e``'s row — only for kinds that
        stream (starts and waits pair per-entry, so kinds that are
        VMEM-resident simply never touch the semaphore).  Descriptors are
        constructed inside the taken branch only (an unused descriptor is
        an error in interpret mode)."""
        idx2 = jax.lax.shift_right_logical(e, 1)
        is_leaf = (e & 1) == 1
        if stream_leaves:
            @pl.when(is_leaf)
            def _():
                _leaf_copy(si, idx2, parity).start()
        if stream_nodes:
            @pl.when(jnp.logical_not(is_leaf))
            def _():
                _node_copy(si, idx2, parity).start()

    def _final_wait(si, e, parity):
        idx2 = jax.lax.shift_right_logical(e, 1)
        is_leaf = (e & 1) == 1
        if stream_leaves:
            @pl.when(is_leaf)
            def _():
                _leaf_copy(si, idx2, parity).wait()
        if stream_nodes:
            @pl.when(jnp.logical_not(is_leaf))
            def _():
                _node_copy(si, idx2, parity).wait()

    def pop_one(si, sp, cap, best_t, slot, uu, vv, tt, pops, e_cur=None,
                parity=None):
        """One pop for interleave slot ``si``.  The leaf/internal split is
        a lax.cond — measured on v5e this beats a branch-free merged body
        (the dummy-side work costs more than the branch).  Node/leaf fields
        are extracted directly from the rolled row value (static lanes) —
        no scratch round trip, so different slots' pops are independent.

        In full-stream (prefetch) mode ``e_cur`` is the entry whose row was
        prefetched last iteration; this call processes it, pops the next
        entry, and returns it so the caller can start its DMA."""
        o, d, inv = O[si], D[si], INV[si]
        t_min, t_max = TMIN[si], TMAX[si]
        if e_cur is None:
            active = sp > 0
            e = jnp.where(active, stack_ref[si, jnp.maximum(sp - 1, 0)],
                          jnp.int32(dummy_enc))
            sp = jnp.maximum(sp - 1, 0)
            pops = pops + active.astype(jnp.int32)
        else:
            e = e_cur
            pops = pops + (e != dummy_enc).astype(jnp.int32)
        idx = jax.lax.shift_right_logical(e, 1)

        def leaf_fn(args):
            sp, cap, best_t, slot, uu, vv, tt = args
            if stream_leaves:
                # prefetched by the previous iteration: reconstruct the
                # same copy descriptor and wait (double-buffer pattern)
                _leaf_copy(si, idx, parity).wait()
                row = leaf_ref[pl.ds(2 * si + parity, 1), :]
            else:
                row = leaf_ref[pl.ds(idx // LEAVES_PER_ROW, 1), :]
            rot = pltpu.roll(row, -(idx % LEAVES_PER_ROW) * LEAF_STRIDE,
                             axis=1)
            for k in range(LEAF_CAP):
                b = 9 * k
                v0 = (rot[0, b], rot[0, b + 1], rot[0, b + 2])
                e1 = (rot[0, b + 3], rot[0, b + 4], rot[0, b + 5])
                e2 = (rot[0, b + 6], rot[0, b + 7], rot[0, b + 8])
                pvx = d[1] * e2[2] - d[2] * e2[1]
                pvy = d[2] * e2[0] - d[0] * e2[2]
                pvz = d[0] * e2[1] - d[1] * e2[0]
                det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
                ok = jnp.abs(det) >= MT_DET_EPS
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
                valid = (
                    ok
                    & (u >= 0.0) & (u <= 1.0)
                    & (v >= 0.0) & (u + v <= 1.0)
                    & (t >= t_min) & (t <= t_max)
                    & (t < best_t)
                )
                cand = idx * LEAF_CAP + k
                best_t = jnp.where(valid, t, best_t)
                slot = jnp.where(valid, cand, slot)
                uu = jnp.where(valid, u, uu)
                vv = jnp.where(valid, v, vv)
            tt = tt + rot[0, 36].astype(jnp.int32)
            cap = jnp.where(t_max >= t_min,
                            jnp.minimum(best_t, t_max), -_BIG)
            return sp, cap, best_t, slot, uu, vv, tt

        def internal_fn(args):
            sp, cap, best_t, slot, uu, vv, tt = args
            if stream_nodes:
                _node_copy(si, idx, parity).wait()
                row = nodes_ref[pl.ds(2 * si + parity, 1), :]
            else:
                row = nodes_ref[pl.ds(idx // npr, 1), :]
            rot = pltpu.roll(row, -(idx % npr) * nstride, axis=1)

            def slab_hit(base):
                tn = jnp.full(shape, -_BIG, jnp.float32)
                tf = jnp.full(shape, _BIG, jnp.float32)
                for a in range(3):
                    t1 = (rot[0, base + a] - o[a]) * inv[a]
                    t2 = (rot[0, base + 3 + a] - o[a]) * inv[a]
                    tn = jnp.maximum(tn, jnp.minimum(t1, t2))
                    tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                return (tf >= jnp.maximum(tn, 0.0)) & (tn <= cap)

            if branching == 2:
                # ONE reduction for both children: bit-pack L hits above R
                # hit counts (sums <= 4096 rays each, no field carry)
                lhit = slab_hit(0)
                rhit = slab_hit(6)
                packed = (lhit.astype(jnp.int32) * 65536
                          + rhit.astype(jnp.int32))
                m = jnp.sum(packed)
                any_l = m >= 65536
                any_r = (m & 65535) > 0

                lenc = rot[0, 12].astype(jnp.int32)
                renc = rot[0, 13].astype(jnp.int32)
                axis = rot[0, 14].astype(jnp.int32)
                # near child from the split axis + tile direction
                # consensus: left child holds the lower-coordinate half,
                # so it is near when the dominant direction is positive
                sgn = SIGN[si]
                l_near = jnp.where(
                    axis == 0, sgn[0], jnp.where(axis == 1, sgn[1], sgn[2])
                )
                order = (
                    (jnp.where(l_near, renc, lenc), jnp.where(l_near, any_r, any_l)),
                    (jnp.where(l_near, lenc, renc), jnp.where(l_near, any_l, any_r)),
                )
            else:
                # 8-wide node: 8 slab tests, then per-column "any" packed
                # 4 children per int32 (8-bit fields; column-any <= 1 per
                # lane so field sums <= 128 — exact) -> TWO scalar
                # reductions test all eight children (the CWBVH move:
                # cwbvh_traverse.comp.glsl's two 4-child batches).
                lo = hi = None
                for k in range(WIDE8_CAP):
                    hk = slab_hit(6 * k)
                    col = jnp.max(hk.astype(jnp.int32), axis=0,
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
                    for k in range(WIDE8_CAP)
                ]
                encs = [rot[0, 48 + k].astype(jnp.int32)
                        for k in range(WIDE8_CAP)]
                axis = rot[0, 56].astype(jnp.int32)
                sgn = SIGN[si]
                fwd = jnp.where(
                    axis == 0, sgn[0], jnp.where(axis == 1, sgn[1], sgn[2])
                )
                # children sorted ascending along axis at build: traverse
                # far-to-near so the near child pops first; rank j from
                # the far end is child j reversed by direction consensus
                order = tuple(
                    (jnp.where(fwd, encs[j], encs[WIDE8_CAP - 1 - j]),
                     jnp.where(fwd, anyk[j], anyk[WIDE8_CAP - 1 - j]))
                    for j in range(WIDE8_CAP - 1, -1, -1)
                )

            # Branch-free guarded pushes: a push that is not taken (child
            # not hit, or stack full) lands in the sacrificial slot KSTACK
            # so it can never clobber a live entry (stack rows are KSTACK+1
            # wide).  Overflow drops far children — same degradation as
            # the reference's depth clamp (bvh_traverse.comp.glsl:293-317).
            for e_j, h_j in order:
                ok = h_j & (sp < KSTACK)
                stack_ref[si, jnp.where(ok, sp, KSTACK)] = e_j
                sp = sp + ok.astype(jnp.int32)
            return sp, cap, best_t, slot, uu, vv, tt

        out = jax.lax.cond(
            (e & 1) == 1, leaf_fn, internal_fn,
            (sp, cap, best_t, slot, uu, vv, tt),
        )
        sp, cap, best_t, slot, uu, vv, tt = out
        if e_cur is None:
            return sp, cap, best_t, slot, uu, vv, tt, pops
        # pop the NEXT entry and hand it back for prefetching
        nactive = sp > 0
        e_next = jnp.where(nactive, stack_ref[si, jnp.maximum(sp - 1, 0)],
                           jnp.int32(dummy_enc))
        sp = jnp.maximum(sp - 1, 0)
        return sp, cap, best_t, slot, uu, vv, tt, pops, e_next

    common_init = (
        # dead lanes (tmax < tmin) cap at -_BIG: ``tn <= cap`` with a
        # raw -1 cap still passes for boxes ENCLOSING the stale origin,
        # so dead/padded rays would traverse the whole tree (PERF.md r4)
        tuple(jnp.where(TMAX[si] >= TMIN[si],
                        jnp.minimum(jnp.full(shape, _BIG, jnp.float32),
                                    TMAX[si]), -_BIG)
              for si in range(n_slots)),
        tuple(jnp.full(shape, _BIG, jnp.float32) for _ in range(n_slots)),
        tuple(jnp.full(shape, -1, jnp.int32) for _ in range(n_slots)),
        tuple(jnp.zeros(shape, jnp.float32) for _ in range(n_slots)),
        tuple(jnp.zeros(shape, jnp.float32) for _ in range(n_slots)),
        tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_slots)),
        jnp.int32(0),
        jnp.bool_(False),
    )

    if not prefetch:
        def cond(c):
            sps = c[0]
            alive = sps[0] > 0
            for si in range(1, n_slots):
                alive = alive | (sps[si] > 0)
            if any_hit:
                alive = alive & jnp.logical_not(c[8])
            return alive

        def body(c):
            sps, caps, bts, slots, uus, vvs, tts, pops, done = c
            sps, caps, bts = list(sps), list(caps), list(bts)
            slots, uus, vvs, tts = (
                list(slots), list(uus), list(vvs), list(tts)
            )
            for si in range(n_slots):
                (sps[si], caps[si], bts[si], slots[si], uus[si], vvs[si],
                 tts[si], pops) = pop_one(
                    si, sps[si], caps[si], bts[si], slots[si], uus[si],
                    vvs[si], tts[si], pops,
                )
            if any_hit:
                done = jnp.min(slots[0]) >= 0
                for si in range(1, n_slots):
                    done = done & (jnp.min(slots[si]) >= 0)
            return (tuple(sps), tuple(caps), tuple(bts), tuple(slots),
                    tuple(uus), tuple(vvs), tuple(tts), pops, done)

        init = (tuple(jnp.int32(1) for _ in range(n_slots)),) + common_init
        sps, caps, bts, slots, uus, vvs, tts, pops, done = (
            jax.lax.while_loop(cond, body, init)
        )
    else:
        # Prefetch protocol: carry the already-popped entry per slot; its
        # row DMA was started last iteration (or in this prologue for the
        # root).  Exactly one DMA start per slot per iteration; one final
        # wait after the loop keeps the semaphores balanced.
        for si in range(n_slots):
            _start_prefetch(si, jnp.int32(0), jnp.int32(0))  # root, parity 0

        def cond(c):
            ecs = c[0]
            alive = ecs[0] != dummy_enc
            for si in range(1, n_slots):
                alive = alive | (ecs[si] != dummy_enc)
            if any_hit:
                alive = alive & jnp.logical_not(c[10])
            return alive

        def body(c):
            (ecs, sps, caps, bts, slots, uus, vvs, tts, pops, it,
             done) = c
            ecs, sps, caps, bts = (
                list(ecs), list(sps), list(caps), list(bts)
            )
            slots, uus, vvs, tts = (
                list(slots), list(uus), list(vvs), list(tts)
            )
            parity = it & 1
            for si in range(n_slots):
                (sps[si], caps[si], bts[si], slots[si], uus[si], vvs[si],
                 tts[si], pops, e_next) = pop_one(
                    si, sps[si], caps[si], bts[si], slots[si], uus[si],
                    vvs[si], tts[si], pops, e_cur=ecs[si], parity=parity,
                )
                _start_prefetch(si, e_next, (it + 1) & 1)
                ecs[si] = e_next
            if any_hit:
                done = jnp.min(slots[0]) >= 0
                for si in range(1, n_slots):
                    done = done & (jnp.min(slots[si]) >= 0)
            return (tuple(ecs), tuple(sps), tuple(caps), tuple(bts),
                    tuple(slots), tuple(uus), tuple(vvs), tuple(tts),
                    pops, it + 1, done)

        init = (
            tuple(jnp.int32(0) for _ in range(n_slots)),   # e_cur = root
            tuple(jnp.int32(0) for _ in range(n_slots)),   # empty stacks
        ) + common_init[:-2] + (jnp.int32(0), jnp.int32(0),
                                jnp.bool_(False))
        (ecs, sps, caps, bts, slots, uus, vvs, tts, pops, it, done) = (
            jax.lax.while_loop(cond, body, init)
        )
        # consume the last outstanding prefetch per slot
        for si in range(n_slots):
            _final_wait(si, ecs[si], it & 1)

    for si in range(n_slots):
        r0 = si * srows
        found = slots[si] >= 0
        t_out[r0:r0+srows, :] = jnp.where(found, bts[si], T_MAX_DEFAULT)
        slot_out[r0:r0+srows, :] = slots[si]
        u_out[r0:r0+srows, :] = jnp.where(found, uus[si], 0.0)
        v_out[r0:r0+srows, :] = jnp.where(found, vvs[si], 0.0)
        tt_out[r0:r0+srows, :] = tts[si]
    pops_out[:, :] = jnp.full((n_slots * srows, 128), pops, jnp.int32)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _call_kernel(rfields, nodes, leaf_tris, *, any_hit, interpret, num_steps,
                 n_slots, dummy_enc, dummy_leaf, stream_leaves=False,
                 stream_nodes=False, srows=SROWS, branching=2):
    grid = (num_steps,)
    rows = n_slots * srows
    ray_spec = pl.BlockSpec(
        (rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = (ray_spec,) * 6
    n_rows = num_steps * rows
    out_shape = (
        jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),   # t
        jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),     # slot
        jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),   # u
        jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),   # v
        jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),     # tri tests
        jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),     # pops (broadcast)
    )
    kern = functools.partial(
        _traverse_kernel, any_hit=any_hit, n_slots=n_slots,
        dummy_enc=dummy_enc, dummy_leaf=dummy_leaf,
        stream_leaves=stream_leaves, stream_nodes=stream_nodes, srows=srows,
        branching=branching,
    )
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    # streaming landing buffers double-buffer by iteration parity (2 rows
    # per slot) for the prefetch protocol
    leaf_scr = (
        pltpu.VMEM((2 * n_slots, 128), jnp.float32)
        if stream_leaves
        else pltpu.VMEM(leaf_tris.shape, jnp.float32)
    )
    node_scr = (
        pltpu.VMEM((2 * n_slots, 128), jnp.float32)
        if stream_nodes
        else pltpu.VMEM(nodes.shape, jnp.float32)
    )
    cp = pltpu.CompilerParams(
        dimension_semantics=(DIM_SEMANTICS,) if DIM_SEMANTICS else None,
        vmem_limit_bytes=VMEM_LIMIT,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=cp,
        in_specs=[ray_spec] * 8 + [hbm, hbm],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            # +1 sacrificial stack slot for branch-free guarded pushes
            pltpu.SMEM((n_slots, KSTACK + 1), jnp.int32),
            node_scr,
            leaf_scr,
            # 0-1: scene staging; 3+si: per-slot streaming prefetch
            pltpu.SemaphoreType.DMA((3 + n_slots,)),
        ],
        interpret=interpret,
    )(*rfields, nodes, leaf_tris)


def _mega_kernel(
    rays_hbm,                   # (T*8*srows, 128) f32, field-major per tile
    nodes_hbm, leaf_hbm,        # scene (HBM)
    fout_hbm, iout_hbm,         # (T*3*srows, 128) f32, (T*2*srows, 128) i32
    pops_out,                   # (1, 1) i32 SMEM
    ray_buf, fbuf, ibuf, stack_ref, queue_ref, nodes_ref, leaf_ref,
    colbc_ref, sems,
    *, any_hit: bool, dummy_enc: int, dummy_leaf: int, srows: int,
    branching: int, num_tiles: int, qdrain: int, interleave: int = 1,
    columnar: bool = False, cond_drain: bool = False, unroll: int = 1,
    or_any: bool = False,
):
    """Single-invocation traversal over ALL ray tiles (the "megakernel").

    Structural moves vs the grid kernel:

    1. **Kernel-owned pipeline.**  A fori_loop over tile groups with
       manually double-buffered DMAs (group g+1 prefetched while group g
       traverses; results DMA out while g+1 traverses) — the TPU version
       of the reference's persistent GPU dispatch (one compute_list for
       the whole batch, gpu_ray_caster.cpp:683-693).

    2. **Branch-free split traversal (leaf queue).**  The serial cost of a
       pop is its vector->scalar reduction + SMEM round trip; a lax.cond
       leaf/internal split serializes everything behind it.  Here the
       stack holds ONLY internal nodes — leaf children are appended to a
       small SMEM ring queue and intersected in dense batches of
       ``qdrain`` per iteration.  Leaf batches are straight-line vector
       code whose row indices are already known scalars, so their fetch/
       MT chains pipeline under the node pop's reduction latency instead
       of serializing after it (the wavefront Extend/Shade split of
       gpu_path_tracer.cpp:251-283, folded into one kernel).

    3. **Tile interleaving** (``interleave`` > 1): each fori step
       traverses S independent ray tiles in one while loop, their states
       side by side — S independent reduction/push chains for the
       scheduler to overlap (the TPU analogue of GPU warp oversubscription
       hiding pop latency).  A finished tile pops dummies until the whole
       group finishes; swizzled adjacent tiles have similar depth so the
       tail waste is small.

    Resident scenes only — streaming tiers use the grid kernel.
    """
    shape = (srows, 128)
    S = interleave
    npr = NODES8_PER_ROW if branching == 8 else NODES_PER_ROW
    nstride = NODE8_STRIDE if branching == 8 else NODE_STRIDE
    rrows = 8 * srows
    frows = 3 * srows
    irows = 2 * srows
    dummy_node = dummy_enc >> 1
    num_groups = num_tiles // S
    assert num_groups * S == num_tiles

    # ---- field accessors: row layout vs columnar layout ---------------
    # Row layout reads each field as a vector->scalar lane extract (~37
    # per leaf, ~57 per node) — the measured dominant per-iteration cost.
    # Columnar layout stores a leaf/node's fields down a lane COLUMN of a
    # (F,128) block: one dynamic block pick + lane roll + ONE lane
    # broadcast makes every field a (1,128) vector operand (sublane
    # broadcast against the (srows,128) tile) — no per-field extracts.
    # The broadcast round-trips through a VMEM scratch ref: slicing the
    # broadcast VALUE directly lets the compiler fold it back into a
    # per-field (1,1)->(srows,128) both-axis broadcast, which Mosaic
    # rejects; ref reads cannot be folded.  Each (slot, drain-j) pair has
    # its own scratch region so consecutive leaf batches don't serialize
    # on the same rows.
    ncol_f = QCOL_F if columnar == "q" else nstride
    _bc_stride = qdrain * COL_LEAF_F + ncol_f

    def _leaf_get(li, si, j):
        if columnar:
            base = si * _bc_stride + j * COL_LEAF_F
            block = leaf_ref[li >> 7]
            rot = pltpu.roll(block, -(li & 127), axis=1)
            colbc_ref[base:base + COL_LEAF_F, :] = jnp.broadcast_to(
                rot[:, 0:1], (COL_LEAF_F, 128)
            )
            return lambda k: colbc_ref[base + k:base + k + 1, :]
        row = leaf_ref[pl.ds(li // LEAVES_PER_ROW, 1), :]
        rot = pltpu.roll(row, -(li % LEAVES_PER_ROW) * LEAF_STRIDE, axis=1)
        return lambda k: rot[0, k]

    def _node_get(nidx, si):
        """Returns (vector_get, scalar_get) for box fields vs enc/axis.

        In quantized-columnar mode ("q") vector_get is instead a list of
        8 decoded child boxes (lox,hix,loy,hiy,loz,hiz) as (1,128)
        operands, and scalar_get keeps the ROW-layout lane numbering
        (enc at 48+k, axis at 56) so call sites stay uniform.  Mode
        "leaf" = columnar leaves with ROW-layout nodes (hybrid)."""
        if columnar and columnar != "leaf":
            base = si * _bc_stride + qdrain * COL_LEAF_F
            block = nodes_ref[nidx >> 7]
            rot = pltpu.roll(block, -(nidx & 127), axis=1)
            colbc_ref[base:base + ncol_f, :] = jnp.broadcast_to(
                rot[:, 0:1], (ncol_f, 128)
            )
            if columnar == "q":
                def bc(k):
                    return colbc_ref[base + k:base + k + 1, :]

                anc = [bc(a) for a in range(3)]
                scl = [bc(3 + a) for a in range(3)]
                boxes = []
                for k in range(WIDE8_CAP):
                    ql = bc(6 + k).astype(jnp.int32)
                    qh = bc(14 + k).astype(jnp.int32)
                    b6 = []
                    for a, sh in enumerate((0, 8, 16)):
                        qla = ((ql >> sh) & 255).astype(jnp.float32)
                        qha = ((qh >> sh) & 255).astype(jnp.float32)
                        b6.append(anc[a] + qla * scl[a])
                        b6.append(anc[a] + qha * scl[a])
                    # b6 = [lox,hix,loy,hiy,loz,hiz]
                    boxes.append(b6)

                def sget_q(k):
                    if k == 56:
                        return rot[30, 0]
                    return rot[22 + (k - 48), 0]

                return boxes, sget_q
            return (
                lambda k: colbc_ref[base + k:base + k + 1, :],
                lambda k: rot[k, 0],
            )
        row = nodes_ref[pl.ds(nidx // npr, 1), :]
        rot = pltpu.roll(row, -(nidx % npr) * nstride, axis=1)
        return (lambda k: rot[0, k]), (lambda k: rot[0, k])

    def _ray_in(g, pb):
        return pltpu.make_async_copy(
            rays_hbm.at[pl.ds(g * S * rrows, S * rrows), :],
            ray_buf.at[pl.ds(pb * S * rrows, S * rrows), :], sems.at[2 + pb],
        )

    def _f_out(g, pb):
        return pltpu.make_async_copy(
            fbuf.at[pl.ds(pb * S * frows, S * frows), :],
            fout_hbm.at[pl.ds(g * S * frows, S * frows), :], sems.at[4 + pb],
        )

    def _i_out(g, pb):
        return pltpu.make_async_copy(
            ibuf.at[pl.ds(pb * S * irows, S * irows), :],
            iout_hbm.at[pl.ds(g * S * irows, S * irows), :], sems.at[6 + pb],
        )

    # stage the scene; prefetch ray group 0 behind the same DMA engine
    c1 = pltpu.make_async_copy(nodes_hbm, nodes_ref, sems.at[0])
    c1.start()
    c2 = pltpu.make_async_copy(leaf_hbm, leaf_ref, sems.at[1])
    c2.start()
    _ray_in(0, 0).start()
    c1.wait()
    c2.wait()

    def safe_inv(x):
        small = jnp.abs(x) < INV_DIR_EPS
        sign = jnp.where(x < 0.0, -1.0, 1.0)
        return jnp.where(small, sign / INV_DIR_EPS,
                         1.0 / jnp.where(small, 1.0, x))

    def group_body(g, pops_total):
        pb = g & 1
        _ray_in(g, pb).wait()

        @pl.when(g + 1 < num_groups)
        def _():
            _ray_in(g + 1, 1 - pb).start()

        O, D, INV, TMIN, TMAX, SGN = [], [], [], [], [], []
        for si in range(S):
            base = (pb * S + si) * rrows
            o = tuple(ray_buf[pl.ds(base + f * srows, srows), :]
                      for f in range(3))
            d = tuple(ray_buf[pl.ds(base + (3 + f) * srows, srows), :]
                      for f in range(3))
            O.append(o)
            D.append(d)
            INV.append(tuple(safe_inv(x) for x in d))
            TMIN.append(ray_buf[pl.ds(base + 6 * srows, srows), :])
            TMAX.append(ray_buf[pl.ds(base + 7 * srows, srows), :])
            SGN.append(tuple(jnp.sum(d[a]) >= 0.0 for a in range(3)))
            stack_ref[si, 0] = jnp.int32(0)   # root node index

        def slot_step(si, st):
            """One drain+pop iteration for interleave slot ``si``."""
            (sp, qh, qt, cap, best_t, slot, uu, vv, tt, pops) = st
            o, d, inv, sgn = O[si], D[si], INV[si], SGN[si]
            t_min, t_max = TMIN[si], TMAX[si]

            # ---- drain up to qdrain queued leaves.  Slot j's MT batch
            # runs under lax.cond(j < qlen): the queue holds ~1 real leaf
            # per iteration on average, so the branch skips ~3/4 of the
            # dense MT work (measured: iterations ~= pops and ~75% of
            # drained slots were the all-zero dummy leaf).  cond_drain
            # False keeps the branch-free dummy-drain body.
            def leaf_mt(li, j, best_t, slot, uu, vv, tt):
                get = _leaf_get(li, si, j)
                for k in range(LEAF_CAP):
                    b = 9 * k
                    v0 = (get(b), get(b + 1), get(b + 2))
                    e1 = (get(b + 3), get(b + 4), get(b + 5))
                    e2 = (get(b + 6), get(b + 7), get(b + 8))
                    pvx = d[1] * e2[2] - d[2] * e2[1]
                    pvy = d[2] * e2[0] - d[0] * e2[2]
                    pvz = d[0] * e2[1] - d[1] * e2[0]
                    det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
                    ok = jnp.abs(det) >= MT_DET_EPS
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
                    valid = (
                        ok
                        & (u >= 0.0) & (u <= 1.0)
                        & (v >= 0.0) & (u + v <= 1.0)
                        & (t >= t_min) & (t <= t_max)
                        & (t < best_t)
                    )
                    cand = li * LEAF_CAP + k
                    best_t = jnp.where(valid, t, best_t)
                    slot = jnp.where(valid, cand, slot)
                    uu = jnp.where(valid, u, uu)
                    vv = jnp.where(valid, v, vv)
                tt = tt + get(36).astype(jnp.int32)
                return best_t, slot, uu, vv, tt

            qlen = qt - qh
            for j in range(qdrain):
                li = jnp.where(j < qlen, queue_ref[si, (qh + j) & 15],
                               jnp.int32(dummy_leaf))
                if cond_drain:
                    best_t, slot, uu, vv, tt = jax.lax.cond(
                        j < qlen,
                        functools.partial(leaf_mt, li, j),
                        lambda *a: a,
                        best_t, slot, uu, vv, tt,
                    )
                else:
                    best_t, slot, uu, vv, tt = leaf_mt(
                        li, j, best_t, slot, uu, vv, tt
                    )
            qh = qh + jnp.minimum(qlen, qdrain)
            cap = jnp.where(t_max >= t_min,
                            jnp.minimum(best_t, t_max), -_BIG)

            # ---- one internal-node pop (branch-free: when the stack is
            # empty or the queue lacks room the NaN dummy node pops — no
            # hits, no pushes) -------------------------------------------
            room = (qt - qh) <= 16 - branching
            active = (sp > 0) & room
            nidx = jnp.where(active, stack_ref[si, jnp.maximum(sp - 1, 0)],
                             jnp.int32(dummy_node))
            sp = jnp.where(active, sp - 1, sp)
            pops = pops + active.astype(jnp.int32)
            vget, sget = _node_get(nidx, si)

            def slab_hit(b0):
                if columnar == "q":
                    # vget is the decoded-box list in quantized mode
                    lox, hix, loy, hiy, loz, hiz = vget[b0 // 6]
                else:
                    lox, hix = vget(b0), vget(b0 + 3)
                    loy, hiy = vget(b0 + 1), vget(b0 + 4)
                    loz, hiz = vget(b0 + 2), vget(b0 + 5)
                t1 = (lox - o[0]) * inv[0]
                t2 = (hix - o[0]) * inv[0]
                tn = jnp.minimum(t1, t2)
                tf = jnp.maximum(t1, t2)
                t1 = (loy - o[1]) * inv[1]
                t2 = (hiy - o[1]) * inv[1]
                tn = jnp.maximum(tn, jnp.minimum(t1, t2))
                tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                t1 = (loz - o[2]) * inv[2]
                t2 = (hiz - o[2]) * inv[2]
                tn = jnp.maximum(tn, jnp.minimum(t1, t2))
                tf = jnp.minimum(tf, jnp.maximum(t1, t2))
                return (tf >= jnp.maximum(tn, 0.0)) & (tn <= cap)

            if branching == 2:
                lhit = slab_hit(0)
                rhit = slab_hit(6)
                packed = (lhit.astype(jnp.int32) * 65536
                          + rhit.astype(jnp.int32))
                m = jnp.sum(packed)
                any_l = m >= 65536
                any_r = (m & 65535) > 0
                lenc = sget(12).astype(jnp.int32)
                renc = sget(13).astype(jnp.int32)
                axis = sget(14).astype(jnp.int32)
                l_near = jnp.where(
                    axis == 0, sgn[0], jnp.where(axis == 1, sgn[1], sgn[2])
                )
                order = (
                    (jnp.where(l_near, renc, lenc),
                     jnp.where(l_near, any_r, any_l)),
                    (jnp.where(l_near, lenc, renc),
                     jnp.where(l_near, any_l, any_r)),
                )
            elif or_any:
                # bit-pack the 8 child masks (1 bit each) and tree-OR
                # down to ONE (1,1) scalar: replaces 8 max-reductions +
                # 2 weighted sums + 2 sum-reductions + 2 scalar moves
                # with ~11 cheap OR ops + one extract
                acc = None
                for k in range(WIDE8_CAP):
                    hk = slab_hit(6 * k).astype(jnp.int32) << k
                    acc = hk if acc is None else acc | hk
                r = acc
                rr = srows
                while rr > 1:
                    r = r[: rr // 2] | r[rr // 2: rr]
                    rr //= 2
                c = 128
                while c > 1:
                    r = r[:, : c // 2] | r[:, c // 2: c]
                    c //= 2
                m = r[0, 0]
                anyk = [
                    (jax.lax.shift_right_logical(m, k) & 1) > 0
                    for k in range(WIDE8_CAP)
                ]
                encs = [sget(48 + k).astype(jnp.int32)
                        for k in range(WIDE8_CAP)]
                axis = sget(56).astype(jnp.int32)
                fwd = jnp.where(
                    axis == 0, sgn[0], jnp.where(axis == 1, sgn[1], sgn[2])
                )
                order = tuple(
                    (jnp.where(fwd, encs[j], encs[WIDE8_CAP - 1 - j]),
                     jnp.where(fwd, anyk[j], anyk[WIDE8_CAP - 1 - j]))
                    for j in range(WIDE8_CAP - 1, -1, -1)
                )
            else:
                lo = hi = None
                for k in range(WIDE8_CAP):
                    hk = slab_hit(6 * k)
                    col = jnp.max(hk.astype(jnp.int32), axis=0,
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
                    for k in range(WIDE8_CAP)
                ]
                encs = [sget(48 + k).astype(jnp.int32)
                        for k in range(WIDE8_CAP)]
                axis = sget(56).astype(jnp.int32)
                fwd = jnp.where(
                    axis == 0, sgn[0], jnp.where(axis == 1, sgn[1], sgn[2])
                )
                order = tuple(
                    (jnp.where(fwd, encs[j], encs[WIDE8_CAP - 1 - j]),
                     jnp.where(fwd, anyk[j], anyk[WIDE8_CAP - 1 - j]))
                    for j in range(WIDE8_CAP - 1, -1, -1)
                )

            # Route children: hit leaves -> ring queue (room was reserved
            # above), hit internals -> stack.  Untaken writes land in
            # sacrificial slots (queue lane 16 / stack lane KSTACK).
            for e_j, h_j in order:
                isleaf = (e_j & 1) == 1
                tgt = jax.lax.shift_right_logical(e_j, 1)
                wq = h_j & isleaf
                queue_ref[si, jnp.where(wq, qt & 15, 16)] = tgt
                qt = qt + wq.astype(jnp.int32)
                ws = h_j & jnp.logical_not(isleaf) & (sp < KSTACK)
                stack_ref[si, jnp.where(ws, sp, KSTACK)] = tgt
                sp = sp + ws.astype(jnp.int32)

            return (sp, qh, qt, cap, best_t, slot, uu, vv, tt, pops)

        def step(c):
            states, done = c
            for _u in range(unroll):
                states = tuple(slot_step(si, states[si]) for si in range(S))
            if any_hit:
                done = jnp.min(states[0][5]) >= 0
                for si in range(1, S):
                    done = done & (jnp.min(states[si][5]) >= 0)
            return (states, done)

        def cond(c):
            states, done = c
            alive = (states[0][0] > 0) | (states[0][2] > states[0][1])
            for si in range(1, S):
                alive = alive | (states[si][0] > 0) | (
                    states[si][2] > states[si][1])
            alive = alive & (states[0][9] < MAX_ITERS)
            if any_hit:
                alive = alive & jnp.logical_not(done)
            return alive

        init_states = tuple(
            (
                jnp.int32(1),                 # sp (root pushed)
                jnp.int32(0), jnp.int32(0),   # qh, qt
                jnp.where(TMAX[si] >= TMIN[si],
                          jnp.minimum(jnp.full(shape, _BIG, jnp.float32),
                                      TMAX[si]), -_BIG),  # dead: -_BIG
                jnp.full(shape, _BIG, jnp.float32),
                jnp.full(shape, -1, jnp.int32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.int32),
                jnp.int32(0),
            )
            for si in range(S)
        )
        states, _ = jax.lax.while_loop(cond, step, (init_states,
                                                    jnp.bool_(False)))

        # reuse of the parity output buffers: group g-2's DMAs must be done
        @pl.when(g >= 2)
        def _():
            _f_out(g - 2, pb).wait()
            _i_out(g - 2, pb).wait()

        for si in range(S):
            (_, _, _, _, best_t, slot, uu, vv, tt, pops) = states[si]
            found = slot >= 0
            fb = (pb * S + si) * frows
            ib = (pb * S + si) * irows
            fbuf[pl.ds(fb, srows), :] = jnp.where(found, best_t,
                                                  T_MAX_DEFAULT)
            fbuf[pl.ds(fb + srows, srows), :] = jnp.where(found, uu, 0.0)
            fbuf[pl.ds(fb + 2 * srows, srows), :] = jnp.where(found, vv, 0.0)
            ibuf[pl.ds(ib, srows), :] = slot
            ibuf[pl.ds(ib + srows, srows), :] = tt
            pops_total = pops_total + pops
        _f_out(g, pb).start()
        _i_out(g, pb).start()
        return pops_total

    pops_total = jax.lax.fori_loop(0, num_groups, group_body, jnp.int32(0))
    # drain the last (up to) two outstanding output DMA pairs
    for g in range(max(num_groups - 2, 0), num_groups):
        _f_out(g, g & 1).wait()
        _i_out(g, g & 1).wait()
    pops_out[0, 0] = pops_total


QDRAIN = 4  # queued leaves intersected per traversal iteration


def _call_mega(rays_packed, nodes, leaf_tris, *, any_hit, interpret,
               num_tiles, dummy_enc, dummy_leaf, srows, branching,
               qdrain=None, interleave=1, columnar=False,
               cond_drain=False, unroll=None, or_any=None):
    if unroll is None:
        unroll = MEGA_UNROLL
    if or_any is None:
        or_any = MEGA_OR_ANY
    if qdrain is None:
        qdrain = QDRAIN
    S = interleave
    rrows = 8 * srows
    frows = 3 * srows
    irows = 2 * srows
    kern = functools.partial(
        _mega_kernel, any_hit=any_hit, dummy_enc=dummy_enc,
        dummy_leaf=dummy_leaf, srows=srows, branching=branching,
        num_tiles=num_tiles, qdrain=qdrain, interleave=S,
        columnar=columnar, cond_drain=cond_drain, unroll=unroll,
        or_any=or_any,
    )
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    cp = pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_LIMIT,
    )
    return pl.pallas_call(
        kern,
        compiler_params=cp,
        in_specs=[hbm, hbm, hbm],
        out_specs=(
            hbm, hbm,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * frows, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * irows, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * S * rrows, 128), jnp.float32),  # ray grp (dbuf)
            pltpu.VMEM((2 * S * frows, 128), jnp.float32),  # f32 out (dbuf)
            pltpu.VMEM((2 * S * irows, 128), jnp.int32),    # i32 out (dbuf)
            pltpu.SMEM((S, KSTACK + 1), jnp.int32),
            pltpu.SMEM((S, 17), jnp.int32),   # leaf ring queue + sacrificial
            pltpu.VMEM(nodes.shape, jnp.float32),   # row OR columnar 3D
            pltpu.VMEM(leaf_tris.shape, jnp.float32),
            # columnar broadcast staging (per slot x per drain-j + node)
            pltpu.VMEM(
                ((S * (qdrain * COL_LEAF_F
                       + (NODE8_STRIDE if branching == 8 else NODE_STRIDE)))
                 if columnar else 8, 128),
                jnp.float32,
            ),
            # 0-1 scene staging; 2+pb ray-in; 4+pb f-out; 6+pb i-out
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(rays_packed, nodes, leaf_tris)


def cast_rays_wide(
    rays: Rays,
    scene: WideScene,
    query_mask: int = -1,
    any_hit: bool = False,
    interpret: bool | None = None,
    n_slots: int = N_SLOTS,
    stream_leaves: bool | None = None,
    stream_nodes: bool | None = None,
    srows: int = SROWS,
    columnar: bool | None = None,
    cond_drain: bool | None = None,
) -> tuple[Hits, RayStats, jnp.ndarray]:
    """Cast a ray batch through the wide-node scene (binary dual-AABB or
    8-wide, per ``scene.branching``) with the Pallas kernel.

    ``query_mask`` must be a static Python int (it selects a pre-masked
    triangle view; -1 = all layers skips the masking pass entirely).
    Returns (hits, stats, occluded).

    The whole path (pad/reshape -> kernel -> gather/stats) is one jitted
    computation: a single device dispatch per cast, which matters because
    per-dispatch latency is ~ms-scale through remote-device tunnels.
    """
    if interpret is None:
        interpret = not _on_tpu()
    if stream_leaves is None:
        stream_leaves = getattr(scene, "stream_leaves", False)
    if stream_nodes is None:
        stream_nodes = getattr(scene, "stream_nodes", False)
    if columnar is None:
        columnar = MEGA_COLUMNAR
    if cond_drain is None:
        cond_drain = MEGA_COND_DRAIN
    return _cast_rays_wide_jit(
        rays, scene, query_mask=int(query_mask), any_hit=any_hit,
        interpret=interpret, n_slots=n_slots, stream_leaves=stream_leaves,
        stream_nodes=stream_nodes, srows=srows, columnar=columnar,
        cond_drain=cond_drain,
    )  # branching rides on scene (static pytree meta)


QCOL_F = 32  # quantized-columnar node fields (see _to_columnar_q)


def _to_columnar_q(nodes_rows):
    """Quantize 8-wide node rows into columnar CWBVH-style blocks.

    Per node (32 sublanes): [anchor.xyz (3), scale.xyz (3), qlo_k (8),
    qhi_k (8), enc_k (8), axis (1), pad (1)] — child AABBs as 8-bit
    offsets from the node anchor (Ylitie'17 / cwbvh_traverse.comp.glsl:
    237-253; tiny_bvh.h BVH8_CWBVH), xyz bytes packed into one
    f32-encoded integer per child+bound (values < 2^24, exact in f32).

    Conservative by construction: scale carries a 2^-20 relative margin
    and q values are widened one quantum outward, so the f32 decode
    always contains the true box — traversal visits a superset, MT
    results identical.  Missing children (NaN boxes) quantize to NaN
    anchors/boxes on the dummy node and inverted boxes elsewhere; a
    falsely-hit missing child pushes the NaN dummy node, a correct no-op.

    Runs on device inside the cast jit (pure jnp).
    """
    w = nodes_rows.reshape(-1, NODE8_STRIDE)
    nb_nodes = w.shape[0]
    boxes = w[:, :48].reshape(nb_nodes, 8, 6)
    mins = boxes[:, :, 0:3]
    maxs = boxes[:, :, 3:6]
    anchor = jnp.nanmin(mins, axis=1)                      # (W,3)
    top = jnp.nanmax(maxs, axis=1)
    # scale margin: relative 2^-20 covers product rounding; the absolute
    # |coord|*2^-12 term keeps one quantum >= ~16 ulp of the coordinate
    # magnitude, so the +-1-quantum widen below dominates every f32
    # rounding in the decode even for near-flat nodes far from origin
    # (pure relative margin is NOT enough when extent << |anchor|)
    mag = jnp.abs(anchor) + jnp.abs(top)
    scale = ((top - anchor) + mag * 2.0 ** -12) * np.float32(
        (1 + 2.0 ** -20) / 255
    )
    safe = jnp.where(scale > 0, scale, 1.0)
    rel_lo = (mins - anchor[:, None, :]) / safe[:, None, :]
    rel_hi = (maxs - anchor[:, None, :]) / safe[:, None, :]
    qlo = jnp.clip(jnp.floor(rel_lo) - 1.0, 0.0, 255.0)
    qhi = jnp.clip(jnp.ceil(rel_hi) + 1.0, 0.0, 255.0)
    # missing children: inverted box (lo=255s, hi=0) — never hit when any
    # axis has extent; fully-degenerate nodes fall back to the dummy pop
    miss = jnp.isnan(mins[:, :, 0])
    packed_lo = qlo[:, :, 0] + qlo[:, :, 1] * 256.0 + qlo[:, :, 2] * 65536.0
    packed_hi = qhi[:, :, 0] + qhi[:, :, 1] * 256.0 + qhi[:, :, 2] * 65536.0
    packed_lo = jnp.where(miss, float(0xFFFFFF), packed_lo)
    packed_hi = jnp.where(miss, 0.0, packed_hi)
    qblk = jnp.concatenate(
        [
            anchor, scale, packed_lo, packed_hi,
            w[:, 48:56], w[:, 56:57],
            jnp.zeros((nb_nodes, 1), jnp.float32),
        ],
        axis=1,
    )  # (W, 32)
    nb = max(-(-nb_nodes // 128), 1)
    pad = nb * 128 - nb_nodes
    if pad:
        qblk = jnp.concatenate(
            [qblk, jnp.zeros((pad, QCOL_F), jnp.float32)]
        )
    return qblk.reshape(nb, 128, QCOL_F).swapaxes(1, 2)


def _to_columnar(rows2d, stride, nfields):
    """Re-layout lane-packed rows (NR,128; ``128//stride`` entries per
    row) into columnar blocks (NB, nfields, 128): entry i's fields run
    down lane i&127 of block i>>7.  Pure reshape/pad/transpose — runs on
    device inside the cast jit (~tens of us for MB-scale scenes)."""
    flat = rows2d.reshape(-1, stride)[:, :nfields]
    n = flat.shape[0]
    nb = max(-(-n // 128), 1)
    pad = nb * 128 - n
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, nfields), flat.dtype)]
        )
    return flat.reshape(nb, 128, nfields).swapaxes(1, 2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "query_mask", "any_hit", "interpret", "n_slots", "stream_leaves",
        "stream_nodes", "srows", "columnar", "cond_drain",
    ),
)
def _cast_rays_wide_jit(
    rays: Rays,
    scene: WideScene,
    *,
    query_mask: int,
    any_hit: bool,
    interpret: bool,
    n_slots: int,
    stream_leaves: bool,
    stream_nodes: bool,
    srows: int = SROWS,
    columnar: bool = False,
    cond_drain: bool = False,
) -> tuple[Hits, RayStats, jnp.ndarray]:
    n = rays.count
    mega = not (stream_leaves or stream_nodes)
    rows_per_step = srows if mega else n_slots * srows
    step = rows_per_step * 128
    num_steps = -(-n // step)
    # Bucket the tile count (1/1.5/2 x pow2) so nearby batch sizes reuse
    # the compiled kernel: tile count is static, and a fully-padded tile
    # costs ~one pop (its rays have t_max<t_min, so the root test fails).
    b = 1
    while b < num_steps:
        b *= 2
    if num_steps > b // 2 and num_steps <= 3 * b // 4 and b >= 4:
        b = 3 * b // 4
    num_steps = b
    if mega and n_slots > 1:
        # interleaved megakernel processes n_slots tiles per group
        num_steps = -(-num_steps // n_slots) * n_slots
    pad = num_steps * step - n

    def fld(x, fillv):
        x = jnp.concatenate([x, jnp.full((pad,), fillv, x.dtype)]) if pad else x
        return x.reshape(num_steps * rows_per_step, 128)

    rfields = (
        fld(rays.origin[:, 0], 0.0), fld(rays.origin[:, 1], 0.0),
        fld(rays.origin[:, 2], 0.0),
        fld(rays.direction[:, 0], 0.0), fld(rays.direction[:, 1], 0.0),
        fld(rays.direction[:, 2], 1.0),
        fld(rays.t_min, 0.0), fld(rays.t_max, -1.0),  # padded rays never hit
    )

    leaf_tris = scene.leaf_tris
    if query_mask != -1:
        leaf_tris = _mask_leaf_tris(scene, query_mask)

    if mega:
        packed = jnp.stack(
            [f.reshape(num_steps, srows, 128) for f in rfields], axis=1
        ).reshape(num_steps * 8 * srows, 128)
        # The columnar re-layout below runs per cast inside this jit.
        # Deliberate: at 99K tris it is ~7 MB of device data movement
        # (~20 us of a 27 ms frame) and caching it on WideScene would
        # need refit invalidation + an extra resident copy; revisit only
        # if multi-M-tri columnar casts become latency-critical.
        nodes_in = scene.nodes
        leaf_in = leaf_tris
        if columnar == "q":
            assert scene.branching == 8, "quantized layout needs wide8"
            nodes_in = _to_columnar_q(scene.nodes)
            leaf_in = _to_columnar(leaf_tris, LEAF_STRIDE, COL_LEAF_F)
        elif columnar == "leaf":
            leaf_in = _to_columnar(leaf_tris, LEAF_STRIDE, COL_LEAF_F)
        elif columnar:
            nstride = (NODE8_STRIDE if scene.branching == 8
                       else NODE_STRIDE)
            nodes_in = _to_columnar(scene.nodes, nstride, nstride)
            leaf_in = _to_columnar(leaf_tris, LEAF_STRIDE, COL_LEAF_F)
        fout, iout, pops_tot = _call_mega(
            packed, nodes_in, leaf_in,
            any_hit=any_hit, interpret=interpret, num_tiles=num_steps,
            dummy_enc=scene.dummy_enc, dummy_leaf=scene.dummy_leaf,
            srows=srows, branching=scene.branching, interleave=n_slots,
            columnar=columnar, cond_drain=cond_drain,
        )
        f4 = fout.reshape(num_steps, 3, srows * 128)
        i4 = iout.reshape(num_steps, 2, srows * 128)
        t = f4[:, 0].reshape(-1)[:n]
        u = f4[:, 1].reshape(-1)[:n]
        v = f4[:, 2].reshape(-1)[:n]
        slot = i4[:, 0].reshape(-1)[:n]
        tt = i4[:, 1].reshape(-1)[:n]
        pops = pops_tot[0, 0][None]
    else:
        t, slot, u, v, tt, pops = _call_kernel(
            rfields, scene.nodes, leaf_tris,
            any_hit=any_hit, interpret=interpret, num_steps=num_steps,
            n_slots=n_slots, dummy_enc=scene.dummy_enc,
            dummy_leaf=scene.dummy_leaf, stream_leaves=stream_leaves,
            stream_nodes=stream_nodes, srows=srows,
            branching=scene.branching,
        )
        t = t.reshape(-1)[:n]
        slot = slot.reshape(-1)[:n]
        u = u.reshape(-1)[:n]
        v = v.reshape(-1)[:n]
        tt = tt.reshape(-1)[:n]
        pops = pops.reshape(num_steps, n_slots * srows, 128)[:, 0, 0]

    found = slot >= 0
    gslot = jnp.maximum(slot, 0)
    hits = Hits(
        t=t,
        position=jnp.where(
            found[:, None], rays.origin + rays.direction * t[:, None], 0.0
        ),
        normal=jnp.where(found[:, None], scene.slot_normal[gslot], 0.0),
        u=u,
        v=v,
        prim_id=jnp.where(found, scene.slot_prim_id[gslot], NO_HIT),
        hit_layers=jnp.where(found, scene.slot_layers[gslot], 0),
    )
    stats = RayStats(
        rays_cast=jnp.int32(n),
        # f32 accumulation: i32 overflows on ~1M-ray x 1M-tri casts
        tri_tests=jnp.sum(tt.astype(jnp.float32)),
        bvh_nodes_visited=jnp.sum(pops),
        hits=jnp.sum(found.astype(jnp.int32)),
    )
    return hits, stats, found


@functools.partial(jax.jit, static_argnames=("query_mask",))
def _mask_leaf_tris(scene: WideScene, query_mask: int) -> jnp.ndarray:
    """Zero the edge fields of masked-out triangles so the kernel's MT
    rejects them (filter-during-traversal semantics, ray_scene.h:124).

    One fused elementwise pass over the leaf rows, keyed on the static mask.
    """
    num_leaves = scene.slot_layers.shape[0] // LEAF_CAP
    ok = (scene.slot_layers & query_mask) != 0        # (4L,)
    ok = ok.reshape(num_leaves, LEAF_CAP)
    factor = jnp.ones((num_leaves, LEAF_STRIDE), jnp.float32)
    for k in range(LEAF_CAP):
        b = 9 * k
        factor = factor.at[:, b + 3 : b + 9].set(
            jnp.where(ok[:, k : k + 1], 1.0, 0.0)
        )
    rows = scene.leaf_tris.shape[0]
    padded = jnp.zeros((rows * LEAVES_PER_ROW, LEAF_STRIDE), jnp.float32)
    padded = padded.at[:num_leaves].set(factor)
    return scene.leaf_tris * padded.reshape(rows, 128)


# Back-compat aliases
TILE_ROWS = SROWS
TILE = SROWS * 128
UNROLL = 1
