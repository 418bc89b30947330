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
from ..kernels.traverse_pallas import TILE, cast_rays_wide
from ..kernels.wide import WideScene

RAY_AXIS = "rays"


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
    wide: WideScene,
    mesh: Mesh,
    query_mask: int = -1,
    any_hit: bool = False,
    interpret: bool | None = None,
) -> tuple[Hits, RayStats, jnp.ndarray]:
    """Batch cast with the ray axis sharded over ``mesh``.

    The scene is closed over (replicated to all chips by shard_map); each
    chip casts its local shard with the single-chip kernel, and stats are
    psum-reduced.  Output hits land sharded over the same axis.
    """
    n_dev = mesh.devices.size
    rays_p, pad = _pad_to(rays, n_dev * TILE)
    n = rays.count

    def local_cast(origin, direction, t_min, t_max):
        local = Rays(origin=origin, direction=direction, t_min=t_min,
                     t_max=t_max)
        hits, stats, occ = cast_rays_wide(
            local, wide, query_mask=query_mask, any_hit=any_hit,
            interpret=interpret,
        )
        stats = RayStats(
            rays_cast=jax.lax.psum(stats.rays_cast, RAY_AXIS),
            tri_tests=jax.lax.psum(stats.tri_tests, RAY_AXIS),
            bvh_nodes_visited=jax.lax.psum(stats.bvh_nodes_visited, RAY_AXIS),
            hits=jax.lax.psum(stats.hits, RAY_AXIS),
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
                     hits=P()),
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
        """Local-shard cast adapter around the replicated wide scene."""

        def cast_rays(self, r, query_mask=-1):
            hits, stats, _ = cast_rays_wide(
                r, scene.wide, query_mask=int(query_mask),
                interpret=interpret,
            )
            return hits, stats

        def any_hit_rays(self, r, query_mask=-1):
            _, _, occ = cast_rays_wide(
                r, scene.wide, query_mask=int(query_mask), any_hit=True,
                interpret=interpret,
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
