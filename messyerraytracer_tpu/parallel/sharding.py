"""Multi-chip scaling: shard the ray batch across a device mesh.

The reference is single-process/single-node (SURVEY.md §2.10 — no
NCCL/MPI); its parallelism is a thread pool chunking rays
(src/dispatch/ray_dispatcher.h:153-180).  The TPU-native multi-chip story
is therefore new design: rays are embarrassingly parallel, so the batch is
sharded over a 1-D ``jax.sharding.Mesh`` ("rays" axis — pure data
parallelism over ICI) with the scene arrays replicated on every chip, and
each chip runs the same Pallas packet kernel on its local shard via
``jax.shard_map``.  Per-cast stats are combined with a ``psum`` — the
collective analogue of the reference's per-thread RayStats merge
(ray_dispatcher.h:163-180).

Scene sharding (BLAS-per-chip + hit AllGather) only becomes necessary when
scenes exceed a chip's HBM; see SURVEY.md §2.10.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.types import Hits, Rays, RayStats
from ..kernels.cluster import ClusterScene
from ..kernels.cluster_v2 import cast_rays_cluster_v2
from ..kernels.traverse_pallas import TILE, cast_rays_wide
from ..kernels.wide import WideScene

RAY_AXIS = "rays"


def _shard_cast(scene_like, local: Rays, query_mask: int, any_hit: bool,
                interpret):
    """Single-shard cast dispatch: accepts a RayScene (routes to its
    backend), a ClusterScene, or a WideScene — so the sharded paths work
    with whichever production kernel the scene was built for."""
    cs = getattr(scene_like, "cluster", None)
    if cs is None and isinstance(scene_like, ClusterScene):
        cs = scene_like
    if cs is not None:
        return cast_rays_cluster_v2(
            local, cs, query_mask=query_mask, any_hit=any_hit,
            interpret=interpret,
        )
    wide = getattr(scene_like, "wide", None)
    if wide is None and isinstance(scene_like, WideScene):
        wide = scene_like
    if wide is None:
        raise ValueError(
            "sharded cast needs a scene with cluster or wide tables "
            f"(got {type(scene_like).__name__})"
        )
    return cast_rays_wide(
        local, wide, query_mask=query_mask, any_hit=any_hit,
        interpret=interpret,
    )


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D device mesh over the ray axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (RAY_AXIS,))


def _pad_to(rays: Rays, multiple: int) -> tuple[Rays, int]:
    n = rays.count
    pad = (-n) % multiple
    if pad == 0:
        return rays, 0
    return Rays(
        origin=jnp.concatenate([rays.origin, jnp.zeros((pad, 3), jnp.float32)]),
        direction=jnp.concatenate(
            [rays.direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))]
        ),
        t_min=jnp.concatenate([rays.t_min, jnp.zeros((pad,), jnp.float32)]),
        t_max=jnp.concatenate(
            [rays.t_max, jnp.full((pad,), -1.0, jnp.float32)]
        ),
    ), pad


def cast_rays_sharded(
    rays: Rays,
    scene,
    mesh: Mesh,
    query_mask: int = -1,
    any_hit: bool = False,
    interpret: bool | None = None,
) -> tuple[Hits, RayStats, jnp.ndarray]:
    """Batch cast with the ray axis sharded over ``mesh``.

    ``scene`` may be a RayScene (cast through its backend kernel), a
    ClusterScene, or a WideScene.  The scene is closed over (replicated to
    all chips by shard_map); each chip casts its local shard with the
    single-chip kernel, and stats are psum-reduced.  Output hits land
    sharded over the same axis.
    """
    n_dev = mesh.devices.size
    rays_p, pad = _pad_to(rays, n_dev * TILE)
    n = rays.count

    def local_cast(origin, direction, t_min, t_max):
        local = Rays(origin=origin, direction=direction, t_min=t_min,
                     t_max=t_max)
        hits, stats, occ = _shard_cast(
            scene, local, query_mask, any_hit, interpret
        )
        stats = RayStats(
            rays_cast=jax.lax.psum(stats.rays_cast, RAY_AXIS),
            tri_tests=jax.lax.psum(stats.tri_tests, RAY_AXIS),
            bvh_nodes_visited=jax.lax.psum(stats.bvh_nodes_visited, RAY_AXIS),
            hits=jax.lax.psum(stats.hits, RAY_AXIS),
            stack_drops=jax.lax.psum(
                jnp.asarray(stats.stack_drops, jnp.int32), RAY_AXIS),
        )
        return hits, stats, occ

    sharded = jax.shard_map(
        local_cast,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,  # pallas_call outputs carry no vma info
        out_specs=(
            Hits(
                t=P(RAY_AXIS), position=P(RAY_AXIS), normal=P(RAY_AXIS),
                u=P(RAY_AXIS), v=P(RAY_AXIS), prim_id=P(RAY_AXIS),
                hit_layers=P(RAY_AXIS),
            ),
            RayStats(rays_cast=P(), tri_tests=P(), bvh_nodes_visited=P(),
                     hits=P(), stack_drops=P()),
            P(RAY_AXIS),
        ),
    )
    hits, stats, occ = sharded(
        rays_p.origin, rays_p.direction, rays_p.t_min, rays_p.t_max
    )
    if pad:
        hits = jax.tree.map(lambda x: x[:n], hits)
        occ = occ[:n]
        stats = stats.replace(rays_cast=jnp.int32(n))
    return hits, stats, occ


def build_sharded_scene(tri_array: np.ndarray, n_shards: int):
    """Partition a triangle soup into ``n_shards`` spatial chunks and
    build one WideScene per chunk, padded to common table shapes and
    stacked on a leading shard axis.

    This is the scene-parallel axis (SURVEY.md §2.10: "BLAS-per-chip with
    AllGather of candidate hits" — for scenes exceeding one chip's HBM):
    each chip holds 1/n of the triangles; every chip casts the FULL ray
    batch against its sub-scene and the closest hit is combined over ICI
    (``cast_rays_scene_sharded``).  Chunks are Morton-ordered by centroid
    so each shard is spatially compact (sub-scene BVHs stay tight).

    Padding discipline makes the kernel's no-op sentinels SHARD-UNIFORM:
    node rows pad with NaN (any padded slot is a never-hit box) and leaf
    rows pad with zeros (zero-edge triangles self-reject), so one static
    (dummy_enc, dummy_leaf) pointing into the padded tail works for every
    shard — required because shard_map traces ONE program for all chips.

    Returns (stacked: dict of (S, ...) arrays, meta: uniform WideScene
    static fields, id_maps (S, Lmax) int32 mapping shard-local prim ids
    to original triangle ids).
    """
    from ..dispatch.morton import morton_encode_3d
    from ..scene.scene import build_scene_from_tri_array

    tri_array = np.asarray(tri_array, np.float32)
    t = tri_array.shape[0]
    if t < n_shards:
        raise ValueError(
            f"build_sharded_scene: {t} triangles cannot fill {n_shards} "
            "shards (every shard needs >= 1 triangle) — use the "
            "replicated-scene data-parallel path for tiny scenes"
        )
    cent = tri_array.mean(axis=1)
    lo = cent.min(axis=0)
    ext = np.maximum(cent.max(axis=0) - lo, 1e-12)
    q = np.clip(((cent - lo) / ext * 1023.0), 0, 1023).astype(np.uint32)
    key = np.asarray(morton_encode_3d(
        jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1]), jnp.asarray(q[:, 2])
    ))
    order = np.argsort(key, kind="stable")
    bounds = np.linspace(0, t, n_shards + 1).astype(np.int64)

    wides = []
    id_maps = []
    for s in range(n_shards):
        idx = order[bounds[s]:bounds[s + 1]]
        # The scene-parallel axis stacks WIDE tables (uniform shapes +
        # NaN/zero padding sentinels); sub-scenes are built on the pallas
        # layout regardless of the session default backend.
        sc = build_scene_from_tri_array(
            tri_array[idx], prim_id=np.arange(len(idx), dtype=np.int32),
            backend="pallas",
        )
        wides.append(sc.wide)
        id_maps.append(idx.astype(np.int32))

    def stack(field, pad_value=0.0):
        arrs = [getattr(w, field) for w in wides]
        shapes = np.array([a.shape for a in arrs])
        target = tuple(int(x) for x in shapes.max(axis=0))
        out = []
        for a in arrs:
            pads = [(0, tg - sh) for sh, tg in zip(a.shape, target)]
            out.append(jnp.pad(a, pads, constant_values=pad_value))
        return jnp.stack(out)

    stacked = {
        "nodes": stack("nodes", pad_value=np.nan),   # padded slots never hit
        "leaf_tris": stack("leaf_tris"),             # zero tris self-reject
        "slot_prim_id": stack("slot_prim_id", pad_value=-1),
        "slot_layers": stack("slot_layers"),
        "slot_normal": stack("slot_normal"),
        "slot_tri": stack("slot_tri"),
    }
    maxmap = max(m.shape[0] for m in id_maps)
    id_maps = jnp.stack([
        jnp.pad(jnp.asarray(m), (0, maxmap - m.shape[0]))
        for m in id_maps
    ])
    npr = 2 if wides[0].branching == 8 else 8
    meta = {
        # uniform sentinels in the padded tail (see padding discipline)
        "dummy_enc": 2 * (int(stacked["nodes"].shape[1]) * npr - 1),
        "dummy_leaf": int(stacked["leaf_tris"].shape[1]) * 2 - 1,
        "stream_leaves": wides[0].stream_leaves,
        "stream_nodes": wides[0].stream_nodes,
        "branching": wides[0].branching,
    }
    return stacked, meta, id_maps


def cast_rays_scene_sharded(rays: Rays, stacked, meta, id_maps, mesh: Mesh,
                            interpret: bool | None = None):
    """Closest-hit cast with the SCENE sharded over the mesh.

    Rays are replicated to every chip; each chip traverses its sub-scene
    with the single-chip kernel; the global winner per ray is the
    lexicographic (t, global prim) minimum combined with two pmin
    collectives + a masked psum gather of the winner's fields — the ICI
    version of the reference merging per-thread nearest hits
    (ray_dispatcher.h:163-180).
    """
    from ..core.types import NO_HIT, T_MAX_DEFAULT
    from ..kernels.wide import WideScene

    n = rays.count
    assert id_maps.shape[0] == mesh.devices.size
    big = jnp.float32(3.0e38)
    dummy_tail = jnp.zeros((1, 1), jnp.float32)

    def local_cast(shard_tables, id_map, origin, direction, t_min, t_max):
        # tables arrive with a leading length-1 shard axis
        wide = WideScene(
            **{k: v[0] for k, v in shard_tables.items()},
            node_idx=dummy_tail, leaf_idx=dummy_tail,     # refit-only
            node_const=dummy_tail, leaf_const=dummy_tail,
            **meta,
        )
        local = Rays(origin=origin, direction=direction, t_min=t_min,
                     t_max=t_max)
        hits, stats, _ = cast_rays_wide(local, wide, interpret=interpret)
        # to GLOBAL prim ids (original triangle numbering)
        gprim = jnp.where(
            hits.prim_id >= 0, id_map[0][jnp.maximum(hits.prim_id, 0)],
            NO_HIT,
        )
        # lexicographic (t, prim) min across the scene axis
        t_loc = jnp.where(hits.prim_id >= 0, hits.t, big)
        t_best = jax.lax.pmin(t_loc, RAY_AXIS)
        cand = (t_loc == t_best) & (hits.prim_id >= 0)
        p_best = jax.lax.pmin(
            jnp.where(cand, gprim, jnp.int32(2**31 - 1)), RAY_AXIS
        )
        win = cand & (gprim == p_best)

        def pick(x):
            m = win[..., None] if x.ndim == 2 else win
            return jax.lax.psum(jnp.where(m, x, 0), RAY_AXIS)

        found = t_best < big
        hits_out = Hits(
            t=jnp.where(found, t_best, T_MAX_DEFAULT),
            position=pick(hits.position),
            normal=pick(hits.normal),
            u=pick(hits.u),
            v=pick(hits.v),
            prim_id=jnp.where(found, p_best, NO_HIT),
            hit_layers=pick(hits.hit_layers).astype(jnp.int32),
        )
        stats_out = RayStats(
            rays_cast=jnp.int32(n),
            tri_tests=jax.lax.psum(stats.tri_tests, RAY_AXIS),
            bvh_nodes_visited=jax.lax.psum(stats.bvh_nodes_visited,
                                           RAY_AXIS),
            hits=jnp.sum(found.astype(jnp.int32)),
            stack_drops=jax.lax.psum(
                jnp.asarray(stats.stack_drops, jnp.int32), RAY_AXIS),
        )
        return hits_out, stats_out

    rep = P()
    sharded = jax.shard_map(
        local_cast,
        mesh=mesh,
        in_specs=({k: P(RAY_AXIS) for k in stacked}, P(RAY_AXIS),
                  rep, rep, rep, rep),
        out_specs=(
            Hits(t=rep, position=rep, normal=rep, u=rep, v=rep,
                 prim_id=rep, hit_layers=rep),
            RayStats(rays_cast=rep, tri_tests=rep, bvh_nodes_visited=rep,
                     hits=rep, stack_drops=rep),
        ),
        check_vma=False,
    )
    return sharded(
        stacked, id_maps, rays.origin, rays.direction, rays.t_min,
        rays.t_max,
    )


def render_step_sharded(scene, cam, width, height, mesh,
                        lights=None, env=None, materials=None,
                        max_bounces=2, sample_index=0,
                        interpret: bool | None = None):
    """One full path-traced frame with pixels sharded over the mesh.

    The multi-chip "training step" analogue: raygen + multi-bounce
    path-trace runs entirely inside ``shard_map`` per chip on its pixel
    shard; the only cross-chip traffic is the stats psum.  Scene and
    shading tables are replicated (they are small next to HBM; see
    SURVEY.md §2.10 for the sharded-scene plan).
    """
    from ..render.camera import generate_rays
    from ..render.pathtrace import PathTracer, PathTraceParams
    from ..render.shade import default_materials, make_environment

    env = env if env is not None else make_environment()
    materials = materials if materials is not None else default_materials()
    rays = generate_rays(cam, width, height)
    n_dev = mesh.devices.size
    rays_p, pad = _pad_to(rays, n_dev * TILE)

    class _ShardScene:
        """Local-shard cast adapter around the replicated scene (routes
        to the scene's backend kernel — cluster or wide)."""

        def cast_rays(self, r, query_mask=-1):
            hits, stats, _ = _shard_cast(
                scene, r, int(query_mask), False, interpret
            )
            return hits, stats

        def any_hit_rays(self, r, query_mask=-1):
            _, _, occ = _shard_cast(
                scene, r, int(query_mask), True, interpret
            )
            return occ

    def local_frame(origin, direction, t_min, t_max):
        local = Rays(origin=origin, direction=direction, t_min=t_min,
                     t_max=t_max)
        pt = PathTracer(_ShardScene(), lights, env, materials)
        img = pt.trace_frame(
            PathTraceParams(width, height, max_bounces=max_bounces,
                            sample_index=sample_index),
            local,
        )
        return img

    sharded = jax.shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    img = sharded(rays_p.origin, rays_p.direction, rays_p.t_min, rays_p.t_max)
    return img[: rays.count]
