"""Instanced two-level (TLAS/BLAS) traversal on the cluster kernel.

The reference's default CPU path is a true two-level structure: TLAS
traversal reaches a BLAS instance, transforms the ray into object space
(WITHOUT renormalizing the direction, so t stays world-parameterized),
traverses the mesh BVH, and maps the hit back
(src/accel/scene_tlas.h:203-251, blas_instance.h:48-59).  Round 2's TPU
hot path could only flatten instances (N x memory); this module gives the
cluster kernel the same memory contract as the reference:

  * Per MESH: object-space cluster field slabs (kernels/cluster.py) —
    SHARED by every instance of the mesh, so memory ~ meshes.
  * One WORLD-SPACE upper tree over all (instance, cluster) pairs: each
    pair's box is the object cluster AABB pushed through the instance
    transform (8-corner).  Built with the generic binned-SAH builder over
    AABBs with singleton leaves; leaf enc payload = gid =
    inst << LOCAL_BITS | local_cluster (exact in the f32 enc for
    gid < 2^23 => <= 1024 instances x <= 8192 clusters/mesh; a single
    huge mesh belongs on the flat path instead).
  * The kernel traverses entirely in world space (no mid-traversal ray
    transforms); at each cluster drain it reads the instance's inverse
    transform from SMEM and transforms the ray rows to object space —
    ~40 (1,128)-ops against thousands of (T,128) pair ops, so instancing
    costs a few percent.
  * Transform updates stay on device: recompute pair world AABBs from the
    stored object AABBs, refit the pair BVH level-by-level, regather the
    node rows (the reference's refit_tlas, scene_tlas.h:180-196).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.bvh import BVH, build_bvh, build_bvh_over_aabbs, refit_bvh
from ..core.types import (
    ALL_LAYERS,
    NO_HIT,
    T_MAX_DEFAULT,
    Hits,
    Rays,
    RayStats,
)
from ..utils.struct import pytree_dataclass
from .cluster import (
    LOCAL_BITS,
    LOCAL_MASK,
    TCAP_DEFAULT,
    _call_cluster,
    _hits_from_buffers,
    _kstack_for,
    _pack_rays,
    _on_tpu,
    _upper_node_tables,
    build_cluster_scene,
    cluster_cut,
)
from .cluster import CLUSTER_QD, CLUSTER_SROWS

MAX_INSTANCES = 1 << (23 - LOCAL_BITS)   # 1024


@pytree_dataclass(meta_fields=("tcap", "dummy_enc", "n_inst", "num_pairs",
                               "stack_need"))
class ClusterTLAS:
    """Device arrays for the instanced cluster cast."""

    nodes: jnp.ndarray          # upper-tree 8-wide rows (world space)
    node_idx: jnp.ndarray       # gather tables over the pair BVH
    node_const: jnp.ndarray
    pair_bvh: BVH               # binary BVH over (instance, cluster) pairs
    pair_obj_min: jnp.ndarray   # (P, 3) object-space cluster AABBs
    pair_obj_max: jnp.ndarray
    pair_inst: jnp.ndarray      # (P,) int32 instance per pair
    ablocks: jnp.ndarray        # concat per-mesh field slabs
    islab: jnp.ndarray          # (1, Ni) i32 slab row base per instance
    iprim: jnp.ndarray          # (1, Ni) i32 global prim-id base per inst
    iinv: jnp.ndarray           # (Ni, 16) f32 inverse transform rows [R|t]
    ifwd: jnp.ndarray           # (Ni, 9) f32 normal matrix (inv-transpose)
    inst_slot_base: jnp.ndarray  # (Ni,) i32 slot-table base per instance
    slot_prim_id: jnp.ndarray   # concat per-mesh tables (object space)
    slot_layers: jnp.ndarray
    slot_normal: jnp.ndarray
    tcap: int
    dummy_enc: int
    n_inst: int
    num_pairs: int
    stack_need: int = 64   # build-time worst-case DFS stack bound


def _to_mat34(t) -> np.ndarray:
    """Accept a (3,4), (4,4), or (3,3)+implicit-0 transform -> (3,4)."""
    t = np.asarray(t, np.float64)  # lint: off — host-side inverse precision
    if t.shape == (4, 4):
        return t[:3, :]
    if t.shape == (3, 4):
        return t
    if t.shape == (3, 3):
        return np.concatenate([t, np.zeros((3, 1))], axis=1)
    raise ValueError(f"transform shape {t.shape} unsupported")


def _inst_tables(transforms: list[np.ndarray]):
    ni = len(transforms)
    iinv = np.zeros((ni, 16), np.float32)
    ifwd = np.zeros((ni, 9), np.float32)
    for i, t in enumerate(transforms):
        m = _to_mat34(t)
        r = m[:, :3]
        rinv = np.linalg.inv(r)
        tinv = -rinv @ m[:, 3]
        iinv[i, :12] = np.concatenate(
            [rinv[0], [tinv[0]], rinv[1], [tinv[1]], rinv[2], [tinv[2]]]
        ).astype(np.float32)
        # normals transform by the inverse-transpose basis
        # (blas_instance.h:62-70)
        ifwd[i] = rinv.T.reshape(-1).astype(np.float32)
    return iinv, ifwd


def _pair_world_aabbs(obj_min, obj_max, iinv_rows_fwd):
    """8-corner transform of object AABBs -> world AABBs (vectorized).

    obj_min/max: (P,3); iinv_rows_fwd: (P, 12) FORWARD transform rows.
    (blas_instance.h:74-107 semantics.)"""
    corners = []
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                c = jnp.stack(
                    [obj_max[:, 0] if cx else obj_min[:, 0],
                     obj_max[:, 1] if cy else obj_min[:, 1],
                     obj_max[:, 2] if cz else obj_min[:, 2]], axis=-1,
                )
                m = iinv_rows_fwd
                w = jnp.stack(
                    [m[:, 0] * c[:, 0] + m[:, 1] * c[:, 1]
                     + m[:, 2] * c[:, 2] + m[:, 3],
                     m[:, 4] * c[:, 0] + m[:, 5] * c[:, 1]
                     + m[:, 6] * c[:, 2] + m[:, 7],
                     m[:, 8] * c[:, 0] + m[:, 9] * c[:, 1]
                     + m[:, 10] * c[:, 2] + m[:, 11]], axis=-1,
                )
                corners.append(w)
    allc = jnp.stack(corners, axis=1)          # (P, 8, 3)
    return jnp.min(allc, axis=1), jnp.max(allc, axis=1)


def _pair_world_aabbs_np(obj_min, obj_max, fwd_rows):
    """Numpy twin of ``_pair_world_aabbs`` for the BUILD path: the jit
    version costs a cold XLA compile (~6 s measured on the bench TLAS,
    VERDICT r4 #6) for math that is microseconds on the host; the
    device version stays for in-jit refits (``_set_transforms_jit``).
    Same f32 operations -> same conservative bounds."""
    obj_min = np.asarray(obj_min, np.float32)
    obj_max = np.asarray(obj_max, np.float32)
    m = np.asarray(fwd_rows, np.float32)
    wmin = np.full_like(obj_min, np.inf)
    wmax = np.full_like(obj_min, -np.inf)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                c = np.stack(
                    [obj_max[:, 0] if cx else obj_min[:, 0],
                     obj_max[:, 1] if cy else obj_min[:, 1],
                     obj_max[:, 2] if cz else obj_min[:, 2]], axis=-1)
                w = np.stack(
                    [m[:, 0] * c[:, 0] + m[:, 1] * c[:, 1]
                     + m[:, 2] * c[:, 2] + m[:, 3],
                     m[:, 4] * c[:, 0] + m[:, 5] * c[:, 1]
                     + m[:, 6] * c[:, 2] + m[:, 7],
                     m[:, 8] * c[:, 0] + m[:, 9] * c[:, 1]
                     + m[:, 10] * c[:, 2] + m[:, 11]], axis=-1)
                wmin = np.minimum(wmin, w)
                wmax = np.maximum(wmax, w)
    return wmin.astype(np.float32), wmax.astype(np.float32)


def build_cluster_tlas(mesh_tris: list, instances: list,
                       tcap: int = TCAP_DEFAULT,
                       mesh_layers: list | None = None,
                       inst_layers: list | None = None) -> ClusterTLAS:
    """Build the instanced structure.

    mesh_tris: list of (T, 3, 3) float vertex arrays (object space).
    instances: list of (mesh_id, transform) with transform (3,4)/(4,4).
    mesh_layers: optional per-mesh (T,) int32 per-triangle layer bitmasks
    (original triangle order); inst_layers: optional per-instance masks.

    Layer semantics match the flattened scene: a triangle's effective
    layers = tri_layers & instance_layers (filter-during-traversal,
    ray_scene.h:124; per-tri layers triangle.h:22-56).  Instances are
    grouped by (mesh, inst_mask): each distinct combination gets slabs
    with the effective layers baked into the exact-float metadata lanes,
    so memory scales with distinct (mesh, mask) groups — equal to the
    mesh count in the common all-default case.
    """
    ni = len(instances)
    if ni == 0 or ni > MAX_INSTANCES:
        raise ValueError(f"instances must be 1..{MAX_INSTANCES}")
    br = tcap + 8

    mesh_ids = [int(m) for m, _ in instances]
    transforms = [t for _, t in instances]
    if inst_layers is None:
        inst_layers = [ALL_LAYERS] * ni
    inst_layers = [int(m) for m in inst_layers]

    # ---- effective (mesh, inst-mask) groups ---------------------------
    group_of = {}
    group_inst = []            # group index per instance
    for m, il in zip(mesh_ids, inst_layers):
        key = (m, il)
        if key not in group_of:
            group_of[key] = len(group_of)
        group_inst.append(group_of[key])
    groups = list(group_of)    # insertion order == group index order

    # ---- per-group cluster scenes (object space) ----------------------
    mesh_cs = []
    mesh_caabb = []            # (C_g, 6) object cluster AABBs
    slab_bases = []
    slot_bases = []
    slab_rows = 0
    slot_total = 0
    for mesh_id, g_ilayers in groups:
        tri = np.asarray(mesh_tris[mesh_id], np.float32)
        v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
        bvh = build_bvh(v0, v1, v2)
        host = bvh.host
        perm = host["tri_order"]
        pv0, pv1, pv2 = v0[perm], v1[perm], v2[perm]
        e1, e2 = pv1 - pv0, pv2 - pv0
        nrm = np.cross(e1, e2)
        ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = (nrm / np.where(ln > 0, ln, 1)).astype(np.float32)
        # host_arrange consumes the _np arrays below; build_cluster_scene
        # never touches ``tris`` on that path, so skip make_triangles'
        # eager device math (4.4 s of per-shape remote ops at bench
        # scale, VERDICT r4 #6)
        tris = None
        if mesh_layers is None or mesh_layers[mesh_id] is None:
            tl = np.full(len(v0), ALL_LAYERS, np.int32)
        else:
            tl = np.asarray(mesh_layers[mesh_id], np.int32)
        eff_layers = (tl & np.int32(g_ilayers))[perm]
        cs = build_cluster_scene(
            bvh, tris,
            _np=(pv0, e1, e2, nrm,
                 np.arange(len(v0), dtype=np.int32)[perm],
                 eff_layers),
            tcap=tcap,
            # numpy arrange: per-mesh shapes would each pay a fresh
            # ~20 s remote-XLA compile of the device refresh (the
            # round-3 83.9 s cold build); meshes are small by the
            # memory~meshes contract, so host assembly is ~ms
            host_arrange=True,
        )
        if cs.num_clusters > LOCAL_MASK + 1:
            raise ValueError(
                f"mesh has {cs.num_clusters} clusters > {LOCAL_MASK + 1}; "
                "use the flat path for huge meshes"
            )
        # recompute the cut on host instead of reading cs.croots back
        # off the device (~0.5 s/transfer on the tunneled device)
        roots, _, _ = cluster_cut(host["left_first"], host["count"], tcap)
        mesh_caabb.append(
            np.concatenate([host["aabb_min"][roots],
                            host["aabb_max"][roots]], axis=1)
        )
        mesh_cs.append(cs)
        slab_bases.append(slab_rows)
        slot_bases.append(slot_total)
        slab_rows += cs.ablocks.shape[0]
        slot_total += cs.slot_prim_id.shape[0]

    ablocks = jnp.concatenate([cs.ablocks for cs in mesh_cs], axis=0)
    slot_prim = jnp.concatenate([cs.slot_prim_id for cs in mesh_cs])
    slot_lay = jnp.concatenate([cs.slot_layers for cs in mesh_cs])
    slot_nrm = jnp.concatenate([cs.slot_normal for cs in mesh_cs], axis=0)
    iinv, ifwd = _inst_tables(transforms)
    fwd_rows = np.zeros((ni, 12), np.float32)
    for i, t in enumerate(transforms):
        m = _to_mat34(t).astype(np.float32)
        fwd_rows[i] = m.reshape(-1)
    islab = np.asarray([[slab_bases[g] for g in group_inst]], np.int32)
    inst_slot_base = np.asarray([slot_bases[g] for g in group_inst],
                                np.int32)
    # flattened-scene global prim-id base per instance (instance base +
    # mesh-local id == the flattened twin's numbering); the v2 kernel
    # adds it at hit-select time so instanced casts need no pid gather
    iprim = np.zeros((1, ni), np.int32)
    acc = 0
    for i, m in enumerate(mesh_ids):
        iprim[0, i] = acc
        acc += len(mesh_tris[m])

    # ---- (instance, cluster) pairs + world AABBs ----------------------
    pobj_min, pobj_max, pinst, pgid = [], [], [], []
    for i, g in enumerate(group_inst):
        ca = mesh_caabb[g]
        cm = len(ca)
        pobj_min.append(ca[:, 0:3])
        pobj_max.append(ca[:, 3:6])
        pinst.append(np.full(cm, i, np.int32))
        pgid.append((i << LOCAL_BITS) + np.arange(cm, dtype=np.int32))
    pobj_min = np.concatenate(pobj_min)
    pobj_max = np.concatenate(pobj_max)
    pinst = np.concatenate(pinst)
    pgid = np.concatenate(pgid)
    p = len(pgid)

    wmin_h, wmax_h = _pair_world_aabbs_np(pobj_min, pobj_max,
                                          fwd_rows[pinst])
    pair_bvh = build_bvh_over_aabbs(
        wmin_h, wmax_h, (wmin_h + wmax_h) * 0.5, max_leaf_size=1
    )
    host = pair_bvh.host
    lf, cnt = host["left_first"], host["count"]
    order = host["tri_order"]
    is_leaf = cnt > 0
    # enc leaf payload = gid of the single pair in the leaf
    gid_of_node = np.zeros(len(cnt), np.int32)
    gid_of_node[is_leaf] = pgid[order[lf[is_leaf]]]
    node_idx, node_const, nw, stack_need = _upper_node_tables(
        host["aabb_min"], host["aabb_max"], lf, cnt,
        is_leaf, gid_of_node, tcap,
    )

    ct = ClusterTLAS(
        nodes=jnp.zeros((1, 1), jnp.float32),   # materialized below
        node_idx=jnp.asarray(node_idx),
        node_const=jnp.asarray(node_const),
        pair_bvh=pair_bvh,
        pair_obj_min=jnp.asarray(pobj_min),
        pair_obj_max=jnp.asarray(pobj_max),
        pair_inst=jnp.asarray(pinst),
        ablocks=ablocks,
        islab=jnp.asarray(islab),
        iprim=jnp.asarray(iprim),
        iinv=jnp.asarray(iinv),
        ifwd=jnp.asarray(ifwd),
        inst_slot_base=jnp.asarray(inst_slot_base),
        slot_prim_id=slot_prim,
        slot_layers=slot_lay,
        slot_normal=slot_nrm,
        tcap=tcap,
        dummy_enc=2 * nw,
        n_inst=ni,
        num_pairs=p,
        stack_need=stack_need,
    )
    return _regather_nodes(ct)


@jax.jit
def _regather_nodes(ct: ClusterTLAS) -> ClusterTLAS:
    node_src = jnp.concatenate(
        [ct.pair_bvh.aabb_min.reshape(-1), ct.pair_bvh.aabb_max.reshape(-1),
         ct.node_const]
    )
    return ct.replace(nodes=node_src[ct.node_idx])


def set_transforms(ct: ClusterTLAS, transforms: list) -> ClusterTLAS:
    """Update instance transforms: recompute pair world AABBs, refit the
    pair BVH bottom-up, regather node rows — the device-side refit_tlas
    (scene_tlas.h:180-196; 10-100x cheaper than rebuild)."""
    iinv, ifwd = _inst_tables(transforms)
    fwd_rows = np.zeros((len(transforms), 12), np.float32)
    for i, t in enumerate(transforms):
        fwd_rows[i] = _to_mat34(t).astype(np.float32).reshape(-1)
    return _set_transforms_jit(
        ct, jnp.asarray(iinv), jnp.asarray(ifwd), jnp.asarray(fwd_rows)
    )


@jax.jit
def _set_transforms_jit(ct, iinv, ifwd, fwd_rows):
    wmin, wmax = _pair_world_aabbs(
        ct.pair_obj_min, ct.pair_obj_max, fwd_rows[ct.pair_inst]
    )
    # refit wants per-SLOT aabbs (slot s holds pair tri_order[s])
    perm = ct.pair_bvh.tri_order
    bvh2 = refit_bvh(ct.pair_bvh, wmin[perm], wmax[perm])
    return _regather_nodes(ct.replace(pair_bvh=bvh2, iinv=iinv, ifwd=ifwd))


def cast_rays_cluster_tlas(
    rays: Rays,
    ct: ClusterTLAS,
    query_mask: int = -1,
    any_hit: bool = False,
    interpret: bool | None = None,
    srows: int = CLUSTER_SROWS,
    qd: int = CLUSTER_QD,
):
    """Instanced closest-hit / any-hit cast.  Returns
    (hits, stats, occluded, instance_id) — instance_id is (N,) int32, -1
    on miss (the reference reports tray.hit.inst, scene_tlas.h:232-247).
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _cast_tlas_jit(
        rays, ct, query_mask=int(query_mask), any_hit=any_hit,
        interpret=interpret, srows=srows, qd=qd,
    )


@functools.partial(
    jax.jit,
    static_argnames=("query_mask", "any_hit", "interpret", "srows", "qd"),
)
def _cast_tlas_jit(rays, ct, *, query_mask, any_hit, interpret, srows, qd):
    n = rays.count
    tcap = ct.tcap
    step = srows * 128
    num_tiles = -(-n // step)
    b = 1
    while b < num_tiles:
        b *= 2
    if num_tiles > b // 2 and num_tiles <= 3 * b // 4 and b >= 4:
        b = 3 * b // 4
    num_tiles = b
    pad = num_tiles * step - n

    def fld(x, fillv):
        x = (jnp.concatenate([x, jnp.full((pad,), fillv, x.dtype)])
             if pad else x)
        return x.reshape(num_tiles * srows, 128)

    rfields = (
        fld(rays.origin[:, 0], 0.0), fld(rays.origin[:, 1], 0.0),
        fld(rays.origin[:, 2], 0.0),
        fld(rays.direction[:, 0], 0.0), fld(rays.direction[:, 1], 0.0),
        fld(rays.direction[:, 2], 1.0),
        fld(rays.t_min, 0.0), fld(rays.t_max, -1.0),
    )
    packed = _pack_rays(rfields, num_tiles, srows, interpret)

    ablocks = ct.ablocks
    if query_mask != -1:
        ablocks = _apply_tlas_mask(ct, query_mask)

    fout, iout, pops_tot = _call_cluster(
        packed, ct.nodes, ablocks,
        any_hit=any_hit, interpret=interpret, num_tiles=num_tiles,
        dummy_enc=ct.dummy_enc, srows=srows, tcap=tcap, qd=qd,
        islab=ct.islab, iinv=ct.iinv, ifwd=ct.ifwd,
        kstack=_kstack_for(ct.stack_need),
    )
    # Gather-free outputs: the kernel already selected prim id / layers /
    # WORLD-space unnormalized normal / instance id for the winning
    # triangle (kernels/cluster.py row_phase), so assembly is elementwise.
    hits, found, tt = _hits_from_buffers(fout, iout, rays, num_tiles,
                                         srows, n)
    i4 = iout.reshape(num_tiles, 4, srows * 128)
    inst = i4[:, 3].reshape(-1)[:n]
    stats = RayStats(
        rays_cast=jnp.int32(n),
        tri_tests=jnp.sum(tt.astype(jnp.float32)),
        bvh_nodes_visited=jnp.sum(pops_tot[0, 0][None]),
        hits=jnp.sum(found.astype(jnp.int32)),
    )
    inst_id = jnp.where(found, inst, -1)
    return hits, stats, found, inst_id


@functools.partial(jax.jit, static_argnames=("query_mask",))
def _apply_tlas_mask(ct: ClusterTLAS, query_mask: int) -> jnp.ndarray:
    """Zero masked slots' field rows across the concatenated slabs.

    Dummy slabs (one trailing per mesh) are all-zero already, so a
    uniform expansion keyed on a per-slab slot base (-1 => keep) works.
    The slab->slot map is reconstructed from inst_slot_base/islab: slab
    row bases are per-mesh, shared by instances — compute it from the
    layout directly: slab j covers slots [sbase_j, sbase_j + tcap).
    """
    tcap = ct.tcap
    br = tcap + 8
    n_slabs = ct.ablocks.shape[0] // br
    # A slab is real iff its stored count > 0 (every cluster holds >= 1
    # triangle; dummy slabs are all-zero).  Real slabs appear in slot-
    # table order, so slab j's slot base = (# real slabs before j) * T.
    counts = ct.ablocks.reshape(n_slabs, br, 128)[:, tcap, 3]
    realf = counts > 0
    sbase = (jnp.cumsum(realf.astype(jnp.int32)) - realf.astype(jnp.int32)
             ) * tcap
    ks = jnp.arange(tcap)
    slot_idx = jnp.clip(sbase[:, None] + ks[None, :], 0,
                        ct.slot_layers.shape[0] - 1)
    ok = ((ct.slot_layers[slot_idx] & query_mask) != 0) | ~realf[:, None]
    factor = jnp.ones((n_slabs, br, 128), jnp.float32)
    factor = factor.at[:, :tcap, 0:16].set(
        jnp.broadcast_to(ok.astype(jnp.float32)[:, :, None],
                         (n_slabs, tcap, 16))
    )
    return ct.ablocks * factor.reshape(n_slabs * br, 128)
