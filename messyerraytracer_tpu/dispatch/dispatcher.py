"""RayDispatcher — the batched cast pipeline with coherence scheduling.

TPU rewrite of ``src/dispatch/ray_dispatcher.h:38-464``.  The reference
routes between CPU thread-pool and Vulkan backends; here there is one TPU
backend and the dispatcher's job is *coherence scheduling* and stats:

  * incoherent batches >= MIN_BATCH_FOR_SORTING are Morton-sorted by
    direction, cast, and unshuffled (ray_dispatcher.h:130-150)
  * the ``coherent`` hint skips the sort (ray_query.h:72-76)
  * fully incoherent batches can additionally be cast through ascending
    DISTANCE WINDOWS (``windows``): pass k casts the live rays with
    t_max capped at radius R_k, so a spatially-sorted tile's traversal
    footprint is bounded by the window ball instead of the whole scene;
    rays that found a hit (provably the global closest — earlier windows
    covered [t_min, R_{k-1}] and found nothing) retire, survivors are
    compacted and re-cast with [R_k, R_{k+1}].  Exact-parity window
    composition; a TPU-native replacement for the reference's per-ray
    early-out that packet tiles cannot do (ray_dispatcher.h:130-150).
  * everything is one jitted dispatch per cast — the analogue of the
    reference reusing persistent buffers to avoid per-frame allocation
    (ray_dispatcher.h:406-411) is letting XLA own the buffers
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import ALL_LAYERS, Hits, Rays, RayStats
from ..scene.scene import RayScene
from .morton import (
    sort_rays_6d,
    sort_rays_by_direction,
    unshuffle_flags,
    unshuffle_hits,
)

MIN_BATCH_FOR_SORTING = 256  # ray_dispatcher.h:423-427


@dataclasses.dataclass
class RayDispatcher:
    """Owns a scene and routes batched casts through the coherence pipeline.

    ``backend`` mirrors the reference enum {CPU,GPU,AUTO}
    (ray_dispatcher.h:40-44) as {"pallas","jnp","brute","auto"}; "auto"
    picks the Pallas kernel when the scene has a wide layout built.

    ``sort`` picks the incoherent-batch coherence key: "6d" (default)
    sorts octant-major with origin Morton minor (measured 1.94 vs 0.93
    origin-major vs 0.84 direction-only vs 0.64 unsorted Mrays/s on 512K
    fully random rays, PERF.md r3); "6d-origin" keys origin-major
    (pairs with ``windows``); "direction" keeps the reference's key
    (ray_sort.h:64-76).

    ``windows`` — ascending scene-diagonal fractions for the distance-
    windowed multi-pass cast (empty = single full-range cast).  Applied
    only to sorted (incoherent) batches.
    """

    scene: RayScene
    backend: str = "auto"
    sort: str = "6d"
    windows: tuple = ()

    def _scene_for(self) -> RayScene:
        if self.backend == "auto":
            return self.scene
        return dataclasses.replace(self.scene, backend=self.backend)

    def _scene_diag(self, scene) -> float:
        """Scene-AABB diagonal, cached per BVH (constant per scene — the
        per-cast device norm + host readback serialized the pass
        pipeline)."""
        cache = getattr(self, "_diag_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_diag_cache", cache)
        key = id(scene.bvh)
        if key not in cache:
            host = getattr(scene.bvh, "host", None)
            if host is not None:
                lo, hi = host["aabb_min"][0], host["aabb_max"][0]
                cache[key] = float(np.linalg.norm(hi - lo))
            else:
                lo = scene.bvh.aabb_min[0]
                hi = scene.bvh.aabb_max[0]
                cache[key] = float(jnp.linalg.norm(hi - lo))
        return cache[key]

    def _sorted(self, rays: Rays):
        if self.sort in ("6d", "6d-origin"):
            bvh = getattr(self.scene, "bvh", None)
            if bvh is not None:
                return sort_rays_6d(rays, bvh.aabb_min[0], bvh.aabb_max[0],
                                    octant_major=self.sort == "6d")
        return sort_rays_by_direction(rays)

    def cast_rays(
        self,
        rays: Rays,
        query_mask=ALL_LAYERS,
        coherent: bool = False,
    ) -> tuple[Hits, RayStats]:
        """Closest-hit batch cast (ray_dispatcher.h:124-181 semantics)."""
        scene = self._scene_for()
        if (not coherent) and rays.count >= MIN_BATCH_FOR_SORTING:
            sorted_rays, perm = self._sorted(rays)
            if self.windows and getattr(scene, "bvh", None) is not None:
                hits, stats = self._cast_windowed(scene, sorted_rays,
                                                  query_mask)
            else:
                hits, stats = scene.cast_rays(sorted_rays, query_mask,
                                               incoherent=True)
            return unshuffle_hits(hits, perm), stats
        return scene.cast_rays(rays, query_mask)

    def _cast_windowed(self, scene, rays: Rays, query_mask):
        """Ascending-window multi-pass cast over PRE-SORTED rays.

        Window k covers per-ray t in [max(t_min, R_{k-1}), min(t_max,
        R_k)]; a closest hit found inside a window is the global closest
        (every earlier window was exhaustively searched and empty), so
        composition is exact, not approximate.  Survivors are compacted
        to the front (stable, preserving the coherence sort) and padded
        to the next power of two so recompiles stay O(log N) per scene.
        """
        n = rays.count
        diag = self._scene_diag(scene)
        # normalize: ascending, deduped, positive — mis-ordered or
        # duplicate fractions would re-search ranges proven empty
        # (full extra casts for nothing)
        fracs = sorted({float(f) for f in self.windows})
        assert all(f > 0.0 for f in fracs), \
            f"window fractions must be > 0, got {self.windows}"
        radii = [diag * f for f in fracs] + [float("inf")]
        o, d = rays.origin, rays.direction
        tmin0, tmax0 = rays.t_min, rays.t_max

        merged = None
        stats = None
        live = None
        r_prev = 0.0
        for r in radii:
            if merged is None:  # pass 1: all rays, no compaction
                sub = Rays(o, d, tmin0, jnp.minimum(tmax0, r))
                h, st = scene.cast_rays(sub, query_mask,
                                        incoherent=True)
                newly = h.prim_id >= 0
                merged, stats = h, st
                live = ~newly & (tmax0 > r)
            else:
                nlive = int(jnp.count_nonzero(live))
                if nlive == 0:
                    break
                # stable live-first order keeps the coherence sort
                order = jnp.argsort(~live, stable=True).astype(jnp.int32)
                m = min(n, max(2048, 1 << (nlive - 1).bit_length()))
                sel = order[:m]
                t_lo = jnp.maximum(tmin0[sel], r_prev)
                t_hi = jnp.minimum(tmax0[sel], r)
                ok = live[sel] & (t_lo <= t_hi)
                sub = Rays(o[sel], d[sel], t_lo,
                           jnp.where(ok, t_hi, -1.0))
                h, st = scene.cast_rays(sub, query_mask,
                                        incoherent=True)
                stats = stats + st
                newly = h.prim_id >= 0
                pos = jnp.where(newly, sel, n)  # n = dropped

                def sc(a, v, pos=pos):
                    return a.at[pos].set(v, mode="drop")

                merged = Hits(
                    t=sc(merged.t, h.t),
                    position=sc(merged.position, h.position),
                    normal=sc(merged.normal, h.normal),
                    u=sc(merged.u, h.u), v=sc(merged.v, h.v),
                    prim_id=sc(merged.prim_id, h.prim_id),
                    hit_layers=sc(merged.hit_layers, h.hit_layers),
                )
                retired = newly | (tmax0[sel] <= r)
                live = live.at[sel].set(live[sel] & ~retired,
                                        mode="drop")
            r_prev = r
        # rays_cast would multi-count re-cast survivors; report N once
        stats = RayStats(
            rays_cast=jnp.asarray(n, stats.rays_cast.dtype),
            tri_tests=stats.tri_tests,
            bvh_nodes_visited=stats.bvh_nodes_visited,
            hits=stats.hits,
        )
        return merged, stats

    def any_hit_rays(
        self,
        rays: Rays,
        query_mask=ALL_LAYERS,
        coherent: bool = False,
    ) -> jnp.ndarray:
        """Occlusion batch cast (ray_dispatcher.h:191-241 semantics)."""
        scene = self._scene_for()
        if (not coherent) and rays.count >= MIN_BATCH_FOR_SORTING:
            sorted_rays, perm = self._sorted(rays)
            occ = scene.any_hit_rays(sorted_rays, query_mask,
                                      incoherent=True)
            return unshuffle_flags(occ, perm)
        return scene.any_hit_rays(rays, query_mask)
