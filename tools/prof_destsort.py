"""Destination-sort oracle for incoherent rays (VERDICT r3 item 3).

The octant-major 6D key groups rays by (direction octant, origin
Morton); at 512K fully random rays the executed footprint is still
tri/ray ~4400 (PERF.md r3).  Two hypotheses the current key cannot
test:

  H1 (destination locality): rays that HIT near each other share the
     lower-tree footprint even when their origins differ — keying by
     the hit POINT (not the origin) packs rows around the destination.
  H2 (tight caps): most of the footprint is opened by rays whose
     t_max is unbounded; with per-ray near-exact caps the slab test
     tn <= cap prunes almost everything behind the hit.

Both get ORACLE measurements here (true hit point / true t from a
first cast, then re-cast with the oracle key / caps).  If the oracles
don't move the number, no proxy estimator can — drop the idea.  If
they do, a cheap first-pass estimator (coarse any-hit / voxel DDA) is
the follow-up.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.dispatch.morton import (
    apply_permutation,
    ray_position_morton,
    sort_perm_6d,
)
from messyerraytracer_tpu.kernels.cluster_v2 import cast_rays_cluster_v2
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k


def timeit(fn, *a, iters=3):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    tris = bench_scene_100k()
    scene = build_scene_from_tri_array(tris, backend="cluster")
    cs = scene.cluster
    bvh = scene.bvh
    lo, hi = bvh.aabb_min[0], bvh.aabb_max[0]

    n = 512 * 1024
    rng = np.random.default_rng(3)
    o = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1]) + 0.5
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(origin=jnp.asarray(o), direction=jnp.asarray(d),
                t_min=jnp.full((n,), 1e-3, jnp.float32),
                t_max=jnp.full((n,), 3e38, jnp.float32))

    @jax.jit
    def cast(rr):
        hits, _, _ = cast_rays_cluster_v2(rr, cs, dmode="bitloop", qd=4)
        return hits

    # ---- baseline: octant-major 6D origin sort -------------------------
    @jax.jit
    def base_perm(rr):
        return sort_perm_6d(rr, lo, hi)

    perm = base_perm(rays)
    sorted_rays = apply_permutation(rays, perm)
    dt = timeit(cast, sorted_rays)
    print(f"octant-6D sort cast : {dt*1e3:7.1f} ms "
          f"({n/dt/1e6:5.2f} Mrays/s)", flush=True)

    hits0 = cast(sorted_rays)
    t_sorted = hits0.t
    # unshuffle true t back to original order
    t_true = jnp.zeros_like(t_sorted).at[perm].set(t_sorted)
    hitmask = jnp.zeros_like(t_sorted, bool).at[perm].set(
        hits0.prim_id >= 0)

    diag = float(jnp.linalg.norm(hi - lo))
    t_for_key = jnp.where(hitmask, t_true, jnp.minimum(t_true, diag))

    # ---- H1 oracle: destination-Morton sort ----------------------------
    dest = rays.origin + rays.direction * t_for_key[:, None]
    okey = ray_position_morton(dest, lo, hi)
    octant = ((rays.direction[:, 0] < 0).astype(jnp.uint32) * 4
              + (rays.direction[:, 1] < 0).astype(jnp.uint32) * 2
              + (rays.direction[:, 2] < 0).astype(jnp.uint32))

    for name, key in (
        ("dest-major+octant ", (okey << 3) | octant),
        ("octant-major+dest ", (octant << 30) | okey),
    ):
        p = jnp.argsort(key)
        rs = apply_permutation(rays, p)
        dt = timeit(cast, rs)
        print(f"{name}: {dt*1e3:7.1f} ms ({n/dt/1e6:5.2f} Mrays/s)",
              flush=True)

    # ---- H2 oracle: near-exact t_max caps (octant-6D order) ------------
    slack = 1.001
    tcap = jnp.where(hitmask, t_true * slack, rays.t_max)
    capped = Rays(origin=rays.origin, direction=rays.direction,
                  t_min=rays.t_min, t_max=tcap)
    cs_rays = apply_permutation(capped, perm)
    dt = timeit(cast, cs_rays)
    print(f"oracle-capped cast  : {dt*1e3:7.1f} ms "
          f"({n/dt/1e6:5.2f} Mrays/s)", flush=True)

    # ---- H1+H2 combined -------------------------------------------------
    key = (octant << 30) | okey
    p = jnp.argsort(key)
    rs = apply_permutation(capped, p)
    dt = timeit(cast, rs)
    print(f"capped+octant+dest  : {dt*1e3:7.1f} ms "
          f"({n/dt/1e6:5.2f} Mrays/s)", flush=True)

    key = (okey << 3) | octant
    p = jnp.argsort(key)
    rs = apply_permutation(capped, p)
    dt = timeit(cast, rs)
    print(f"capped+dest+octant  : {dt*1e3:7.1f} ms "
          f"({n/dt/1e6:5.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
