"""Flat scene container — build triangles + BVH, cast rays.

TPU rewrite of ``RayScene`` (src/accel/ray_scene.h:34-210): owns the SoA
triangle arrays (in BVH slot order) and the BVH node arrays, exposes
closest-hit / any-hit casts, and keeps the reference's ``use_bvh=false``
brute-force validation mode (ray_scene.h:59,120-131) as the parity oracle.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.bvh import BVH, build_bvh, refit_bvh
from ..accel.frontier import (
    FrontierScene,
    build_frontier_scene,
    cast_rays_frontier,
)
from ..accel.traverse import cast_rays_bvh
from ..kernels.cluster import (
    ClusterScene,
    build_cluster_scene,
    refresh_cluster_scene,
)
from ..kernels.cluster_v2 import cast_rays_cluster_v2
from ..kernels.traverse_pallas import cast_rays_wide
from ..kernels.wide import (WideScene, build_wide8_scene, build_wide_scene, refresh_wide_scene)
from ..core.brute import any_hit_brute, cast_rays_brute
from ..core.types import (
    ALL_LAYERS,
    Hits,
    Rays,
    RayStats,
    Triangles,
    make_triangles,
)
from ..core.geometry import aabb_of_triangles


@dataclasses.dataclass
class RayScene:
    """Flat (single-level) scene: reordered triangles + BVH.

    ``tris`` is in BVH slot order; ``tris.prim_id`` carries the original
    triangle ids so hits report stable ids across rebuilds.
    """

    tris: Triangles
    bvh: BVH
    wide: WideScene | None = None
    cluster: ClusterScene | None = None
    use_bvh: bool = True       # validation switch (ray_scene.h:59)
    # "cluster" (dense-phase cluster kernel, kernels/cluster.py — the
    # production default) | "pallas" (packet megakernel) | "frontier" |
    # "frontier_q" (quantized CWBVH-style boxes) | "jnp" | "brute"
    backend: str = "cluster"
    _frontier: FrontierScene | None = None
    _frontier_q: FrontierScene | None = None

    @property
    def num_tris(self) -> int:
        return self.tris.count

    @property
    def frontier(self) -> FrontierScene:
        """Frontier-backend tables, built lazily on first use."""
        if self._frontier is None:
            self._frontier = build_frontier_scene(self.bvh, self.tris)
        return self._frontier

    @property
    def frontier_q(self) -> FrontierScene:
        """Quantized (CWBVH-equivalent) frontier tables, built lazily."""
        if self._frontier_q is None:
            self._frontier_q = build_frontier_scene(
                self.bvh, self.tris, quantize=True
            )
        return self._frontier_q

    def _frontier_for_backend(self) -> FrontierScene:
        return self.frontier_q if self.backend == "frontier_q" else self.frontier

    def _srows(self) -> int:
        """Ray-tile height for the packet kernel.  Sub-pixel-density
        scenes pay the TILE's traversal footprint per ray (PERF.md 1M
        analysis), so dense scenes route to half-height tiles —
        measured +6% at 1M tris, neutral below."""
        from ..kernels.traverse_pallas import SROWS

        return 8 if self.num_tris > 300_000 else SROWS

    def _cluster_kw(self, incoherent: bool = False) -> dict:
        """Density-routed cluster-kernel knobs (measured, PERF.md r4).

        Sub-pixel-density scenes (1M+): sparse row masks (~2.4/16 rows
        per drain) — the ctz bitloop drains only set rows and deeper
        drain batches pay off.  Super-pixel scenes: dense masks — static
        groups of 4 rows pipeline better than the serial skip-loop.
        INCOHERENT batches have sparse masks at any scene density (the
        dispatcher's sorted path passes the hint)."""
        if incoherent or self.num_tris > 300_000:
            return {"qd": 4, "dmode": "bitloop"}
        return {"dmode": "gr4", "qd": 4}

    def cast_rays(self, rays: Rays, query_mask=ALL_LAYERS,
                  incoherent: bool = False) -> tuple[Hits, RayStats]:
        """Batched closest-hit cast (ray_scene.h:96-131 semantics).

        Routes to the Pallas packet kernel, the frontier (dense BFS)
        backend, the jnp reference traversal, or the brute-force oracle
        (the TPU analogue of the reference's CPU/GPU/AUTO dispatcher,
        src/dispatch/ray_dispatcher.h:124-181).
        """
        if not self.use_bvh or self.backend == "brute":
            return cast_rays_brute(rays, self.tris, query_mask)
        if self.backend in ("frontier", "frontier_q"):
            hits, stats, _ = cast_rays_frontier(
                rays, self._frontier_for_backend(), self.tris, int(query_mask)
            )
            return hits, stats
        if self.backend == "cluster" and self.cluster is not None:
            hits, stats, _ = cast_rays_cluster_v2(
                rays, self.cluster, int(query_mask),
                **self._cluster_kw(incoherent)
            )
            return hits, stats
        if self.backend == "pallas" and self.wide is not None:
            hits, stats, _ = cast_rays_wide(
                rays, self.wide, int(query_mask), srows=self._srows()
            )
            return hits, stats
        hits, stats, _ = cast_rays_bvh(rays, self.tris, self.bvh, query_mask)
        return hits, stats

    def any_hit_rays(self, rays: Rays, query_mask=ALL_LAYERS,
                     incoherent: bool = False) -> jnp.ndarray:
        """Batched occlusion query (ray_scene.h:135-160 semantics)."""
        if not self.use_bvh or self.backend == "brute":
            return any_hit_brute(rays, self.tris, query_mask)
        if self.backend in ("frontier", "frontier_q"):
            _, _, occluded = cast_rays_frontier(
                rays, self._frontier_for_backend(), self.tris,
                int(query_mask), any_hit=True,
            )
            return occluded
        if self.backend == "cluster" and self.cluster is not None:
            _, _, occluded = cast_rays_cluster_v2(
                rays, self.cluster, int(query_mask), any_hit=True,
                **self._cluster_kw(incoherent),
            )
            return occluded
        if self.backend == "pallas" and self.wide is not None:
            _, _, occluded = cast_rays_wide(
                rays, self.wide, int(query_mask), any_hit=True,
                srows=self._srows(),
            )
            return occluded
        _, _, occluded = cast_rays_bvh(
            rays, self.tris, self.bvh, query_mask, any_hit=True
        )
        return occluded

    def refit(self, v0, v1, v2) -> "RayScene":
        """Refit the BVH to moved vertices (same topology/order).

        ``v0/v1/v2`` are (T,3) arrays in *original* triangle order; they are
        re-sorted into slot order with the build permutation, triangles are
        re-derived, and node AABBs are refit bottom-up — all in ONE jitted
        device computation (no host round trip; scene_tlas.h:180-196 is the
        reference's O(N) refit this replaces).
        """
        tris, bvh, wide, cluster = _refit_jit(
            self.bvh, self.wide, self.cluster, self.tris,
            jnp.asarray(v0, jnp.float32), jnp.asarray(v1, jnp.float32),
            jnp.asarray(v2, jnp.float32),
        )
        # Drop lazily-built frontier caches: they embed copies of the
        # pre-refit boxes/triangles and would silently serve stale
        # geometry (same bug class as the TLAS _two_level cache).
        return dataclasses.replace(
            self, tris=tris, bvh=bvh, wide=wide, cluster=cluster,
            _frontier=None, _frontier_q=None,
        )


@jax.jit
def _refit_jit(bvh, wide, cluster, old_tris, v0, v1, v2):
    perm = bvh.tri_order
    tris = make_triangles(
        v0[perm], v1[perm], v2[perm],
        prim_id=old_tris.prim_id, layers=old_tris.layers,
    )
    tmin, tmax = aabb_of_triangles(tris.v0, tris.v1, tris.v2)
    bvh2 = refit_bvh(bvh, tmin, tmax)
    wide2 = refresh_wide_scene(wide, bvh2, tris) if wide is not None else None
    cl2 = (refresh_cluster_scene(cluster, bvh2, tris)
           if cluster is not None else None)
    return tris, bvh2, wide2, cl2


def build_scene(v0, v1, v2, layers=None, prim_id=None, use_bvh=True,
                backend="cluster", branching=8,
                host_arrange: bool = False) -> RayScene:
    """Build a flat scene from (T,3) vertex arrays.

    The BVH build runs on host; the returned SoA arrays are device-resident.
    Mirrors ``RayScene::build`` (ray_scene.h:62-86).

    ``host_arrange``: assemble the cluster slabs in numpy instead of the
    jitted device refresh — zero XLA compiles, meant for SMALL scenes
    (per-mesh BLAS builds) where otherwise every distinct mesh shape pays
    a fresh remote compile (the round-3 instanced-build pathology).
    """
    from .. import _tune_malloc

    _tune_malloc()  # lazy, once: large-buffer heap reuse for this build
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    t = v0.shape[0]
    bvh = build_bvh(v0, v1, v2)
    host = getattr(bvh, "host", None)
    perm = host["tri_order"] if host else np.asarray(bvh.tri_order)
    if prim_id is None:
        prim_id = np.arange(t, dtype=np.int32)
    else:
        prim_id = np.asarray(prim_id, np.int32)
    if layers is None:
        layers = np.full((t,), ALL_LAYERS, np.int32)
    else:
        layers = np.asarray(layers, np.int32)
    # Derive edges/normals in numpy: the eager jnp path would dispatch ~10
    # tiny device ops per build (each paying remote-compile/dispatch latency
    # on tunneled devices); numpy + one final device put is ~100x faster.
    pv0, pv1, pv2 = v0[perm], v1[perm], v2[perm]
    e1 = pv1 - pv0
    e2 = pv2 - pv0
    nrm = np.cross(e1, e2)
    nlen = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / np.where(nlen > 0.0, nlen, 1.0)
    tris = Triangles(
        v0=jnp.asarray(pv0), edge1=jnp.asarray(e1), edge2=jnp.asarray(e2),
        normal=jnp.asarray(nrm.astype(np.float32)),
        prim_id=jnp.asarray(prim_id[perm]), layers=jnp.asarray(layers[perm]),
    )
    wide = None
    cluster = None
    if backend == "cluster":
        from ..kernels.cluster import cluster_tcap_for

        cluster = build_cluster_scene(
            bvh, tris,
            _np=(pv0, e1, e2, nrm, prim_id[perm], layers[perm]),
            tcap=cluster_tcap_for(t),
            host_arrange=host_arrange,
        )
    elif backend == "pallas":
        builder = build_wide8_scene if branching == 8 else build_wide_scene
        fit = _wide_vmem_fit(bvh, branching)
        host = (pv0, e1, e2, nrm, prim_id[perm], layers[perm])
        if fit == "resident":
            wide = builder(bvh, tris, _np=host)
        elif fit == "stream":
            # Big-scene mode: nodes stay VMEM-resident, leaf rows stream
            # from HBM with one DMA per leaf pop (slower per pop, unbounded
            # capacity -- the trade the reference makes with 512K-ray TDR
            # chunking, gpu_ray_caster.cpp:427-430).
            wide = builder(bvh, tris, _np=host, stream_leaves=True)
        else:
            # Very large scenes: both arrays stream from HBM per pop.
            wide = builder(bvh, tris, _np=host, stream_leaves=True,
                           stream_nodes=True)
    return RayScene(tris=tris, bvh=bvh, wide=wide, cluster=cluster,
                    use_bvh=use_bvh, backend=backend)


# The kernel needs scene arrays VMEM-resident plus ray tiles and headroom.
# v5e VMEM is 128 MB; with vmem_limit_bytes raised to 100 MB (the kernel
# CompilerParams) a 97.5 MB scene compiles and runs resident (measured).
# Round 1's 15 MB ceiling was only Mosaic's *default* budget.  Beyond the
# budget, leaf rows stream from HBM ("stream" mode); when even the nodes
# alone exceed it, everything streams.
_WIDE_VMEM_BUDGET = 96 * 1024 * 1024


def _wide_vmem_fit(bvh: BVH, branching: int = 8) -> str:
    # 'resident' | 'stream' | 'stream_all' -- how much of the layout fits
    host = getattr(bvh, "host", None)
    count = host["count"] if host else np.asarray(bvh.count)
    num_internal = int((count == 0).sum()) + 1
    num_leaf = int((count > 0).sum()) + 1
    if branching == 8:
        # each 8-wide node absorbs up to 7 binary internals; estimate
        # conservatively (collapse yields ~num_internal/6 in practice)
        nw = num_internal // 5 + 2
        node_bytes = -(-nw // 2) * 512         # 2 nodes per 512B row
    else:
        node_bytes = -(-num_internal // 8) * 512  # 8 nodes per 512B row
    leaf_bytes = -(-num_leaf // 2) * 512       # 2 leaves per 512B row
    if node_bytes + leaf_bytes <= _WIDE_VMEM_BUDGET:
        return "resident"
    if node_bytes <= _WIDE_VMEM_BUDGET - 1024 * 1024:
        return "stream"
    return "stream_all"


def build_scene_from_tri_array(tri_array, **kw) -> RayScene:
    """Convenience: build from a (T, 3, 3) vertex array (mesh loader output)."""
    tri_array = np.asarray(tri_array, np.float32)
    return build_scene(tri_array[:, 0], tri_array[:, 1], tri_array[:, 2], **kw)
