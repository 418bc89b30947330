"""PT frame anatomy: where do the 205 ms go?

Times the one-jit wavefront frame under ablations:
  * full        — production: octant-major sorted bounce+shadow waves
  * nosort      — sort=False on all waves (round-3: 269 ms vs 218)
  * sort costs  — standalone argsort + apply_permutation + unshuffle at
                  wave size, to bound the sort/gather tax per bounce
  * casts only  — the 4 extend casts at realistic wave occupancy
"""

import argparse
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

import messyerraytracer_tpu as mrt  # noqa: F401
from messyerraytracer_tpu.core.types import Rays
from messyerraytracer_tpu.dispatch.morton import (
    apply_permutation,
    raster_block_permutation,
    sort_rays_6d,
    unshuffle_hits,
)
from messyerraytracer_tpu.render.shade import (
    LIGHT_DIRECTIONAL, default_materials, make_environment, make_lights,
)
from messyerraytracer_tpu.render.wavefront import WavefrontPathTracer
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k


def timeit(fn, fence, iters=4):
    out = fn()
    fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--bounces", type=int, default=3)
    args = ap.parse_args()

    tris = bench_scene_100k()
    scene = build_scene_from_tri_array(tris, backend="cluster")
    mats = default_materials()
    lights = make_lights([{"type": LIGHT_DIRECTIONAL,
                           "direction": (-0.4, -1.0, -0.2),
                           "color": (1.0, 1.0, 1.0), "energy": 1.5}])
    env = make_environment()

    w, h = args.w, args.h
    cam = mrt.CameraParams.look_at((0, 14, 30), (0, 2, 0),
                                   fov_degrees=60.0)
    rays = mrt.generate_rays(cam, w, h)
    perm = jnp.asarray(raster_block_permutation(w, h, 32))
    rays = Rays(origin=rays.origin[perm], direction=rays.direction[perm],
                t_min=rays.t_min[perm], t_max=rays.t_max[perm])
    n = rays.count

    pt = WavefrontPathTracer(scene, lights, env, mats)

    def fence_img(x):
        float(jnp.sum(x[0] if isinstance(x, tuple) else x))

    dt = timeit(lambda: pt.trace_frame(rays, args.bounces, 1), fence_img)
    print(f"full frame   : {dt*1e3:7.1f} ms", flush=True)

    # nosort variant: monkeypatch sort off inside the stages path
    orig_extend, orig_connect = pt.extend, pt.connect
    pt_ns = WavefrontPathTracer(scene, lights, env, mats)
    pt_ns.bounds = None   # disables wave sorting
    dt = timeit(lambda: pt_ns.trace_frame(rays, args.bounces, 2),
                fence_img)
    print(f"no wave sort : {dt*1e3:7.1f} ms", flush=True)

    # standalone: one extend-wave sort + cast + unshuffle at full size
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-18, 18, (n, 3)).astype(np.float32))
    d0 = rng.normal(size=(n, 3)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d = jnp.asarray(d0)
    wave = Rays(origin=o, direction=d,
                t_min=jnp.full((n,), 1e-3, jnp.float32),
                t_max=jnp.full((n,), 3e38, jnp.float32))
    bounds = (scene.bvh.aabb_min[0], scene.bvh.aabb_max[0])

    @jax.jit
    def sort_only(wv):
        s, p = sort_rays_6d(wv, *bounds)
        return s.origin, p

    dt = timeit(lambda: sort_only(wave), fence_img)
    print(f"argsort+apply: {dt*1e3:7.1f} ms  (per wave)", flush=True)

    @jax.jit
    def cast_sorted(wv):
        s, p = sort_rays_6d(wv, *bounds)
        hits, _ = scene.cast_rays(s, incoherent=True)
        return unshuffle_hits(hits, p).t

    dt = timeit(lambda: cast_sorted(wave), fence_img)
    print(f"sort+cast+uns: {dt*1e3:7.1f} ms  (random wave)", flush=True)

    @jax.jit
    def cast_raw(wv):
        hits, _ = scene.cast_rays(wv, incoherent=True)
        return hits.t

    dt = timeit(lambda: cast_raw(wave), fence_img)
    print(f"cast unsorted: {dt*1e3:7.1f} ms  (random wave)", flush=True)

    @jax.jit
    def unsh_only(wv):
        s, p = sort_rays_6d(wv, *bounds)
        hits, _ = scene.cast_rays(s, incoherent=True)
        return hits.t, p

    dt = timeit(lambda: unsh_only(wave), fence_img)
    print(f"sort+cast    : {dt*1e3:7.1f} ms  (no unshuffle)", flush=True)

    # primary cast alone (coherent)
    @jax.jit
    def cast_prim(rr):
        hits, _ = scene.cast_rays(rr)
        return hits.t

    dt = timeit(lambda: cast_prim(rays), fence_img)
    print(f"primary cast : {dt*1e3:7.1f} ms", flush=True)

    # ---- per-wave anatomy: time each REAL wave's cast ------------------
    from messyerraytracer_tpu.dispatch.morton import sort_perm_6d

    bounds2 = pt.bounds
    state = pt.generate(rays, 1)
    for bounce in range(args.bounces + 1):
        cast = Rays(origin=state.ray.origin,
                    direction=state.ray.direction,
                    t_min=state.ray.t_min,
                    t_max=jnp.where(state.active, state.ray.t_max, -1.0))
        live = int(jnp.sum(state.active))

        @jax.jit
        def cast_w(c):
            h, _ = scene.cast_rays(c, incoherent=bounce > 0)
            return h

        dt = timeit(lambda: cast_w(cast), lambda h: float(jnp.sum(h.t)))
        hits = cast_w(cast)
        print(f"extend b{bounce}  : {dt*1e3:7.1f} ms  live={live}",
              flush=True)
        state = pt.shade(state, hits, bounce, args.bounces)
        nsh = int(jnp.sum(state.shadow_valid))

        from messyerraytracer_tpu.dispatch.morton import (
            apply_permutation, unshuffle_flags,
        )

        @jax.jit
        def conn_w(sr, valid):
            if bounce == 0:
                return scene.any_hit_rays(sr)
            sp = sort_perm_6d(sr, *bounds2, live=valid)
            occ_s = scene.any_hit_rays(apply_permutation(sr, sp),
                                       incoherent=True)
            return unshuffle_flags(occ_s, sp)

        dt = timeit(lambda: conn_w(state.shadow_ray, state.shadow_valid),
                    lambda o: float(jnp.sum(o)))
        occ = conn_w(state.shadow_ray, state.shadow_valid)
        print(f"connect b{bounce} : {dt*1e3:7.1f} ms  valid={nsh}",
              flush=True)
        state = state.replace(visibility=~occ & state.shadow_valid)
        if bounce < args.bounces:
            perm = sort_perm_6d(state.ray, *bounds2, live=state.active)
            from messyerraytracer_tpu.render.wavefront import (
                WavefrontState,
            )

            state = WavefrontState(
                throughput=state.throughput[perm],
                accum=state.accum[perm],
                pending_nee=state.pending_nee[perm],
                rng=state.rng[perm],
                active=state.active[perm],
                ray=Rays(origin=state.ray.origin[perm],
                         direction=state.ray.direction[perm],
                         t_min=state.ray.t_min,
                         t_max=state.ray.t_max),
                shadow_ray=state.shadow_ray,
                shadow_valid=state.shadow_valid[perm],
                visibility=state.visibility[perm],
            )


if __name__ == "__main__":
    main()
