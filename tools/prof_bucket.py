"""Bucketed-cast prototype: lax.switch over live-prefix sizes.

PT waves carry a full-frame shape (307K) while live rays shrink to ~7%
by bounce 3; every XLA-side per-wave cost (sort gathers, pack, hit
assembly) and the kernel's per-tile floor scale with the FULL shape.
After the live-first sort, live rays occupy a prefix, so the cast can
run on a statically-sized prefix bucket chosen by a traced live count —
one lax.switch, each branch casting bucket_size rays and padding the
tail with misses.

This tool measures (a) the extra compile time of the switch (each
branch instantiates the cluster kernel at its own num_tiles) and
(b) runtime vs live count, to decide whether the frame jit adopts it.
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

from messyerraytracer_tpu.core.types import Rays, make_miss
from messyerraytracer_tpu.kernels.cluster_v2 import cast_rays_cluster_v2
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from tools.bench_backends import bench_scene_100k


def slice_rays(r, b):
    return Rays(origin=r.origin[:b], direction=r.direction[:b],
                t_min=r.t_min[:b], t_max=r.t_max[:b])


def pad_hits(h, n):
    b = h.count
    if b == n:
        return h
    m = make_miss(n - b)

    def cat(a, bb):
        return jnp.concatenate([a, bb])

    from messyerraytracer_tpu.core.types import Hits

    return Hits(t=cat(h.t, m.t), position=cat(h.position, m.position),
                normal=cat(h.normal, m.normal), u=cat(h.u, m.u),
                v=cat(h.v, m.v), prim_id=cat(h.prim_id, m.prim_id),
                hit_layers=cat(h.hit_layers, m.hit_layers))


def bucket_sizes(n, step=2048, levels=5):
    out = [n]
    t = -(-n // step)
    for _ in range(levels - 1):
        t = max(1, t // 2)
        out.append(t * step)
    return out


def main():
    tris = bench_scene_100k()
    scene = build_scene_from_tri_array(tris, backend="cluster")
    cs = scene.cluster
    n = 307200
    sizes = bucket_sizes(n)
    thr = jnp.asarray(sizes[1:], jnp.int32)  # descending

    rng = np.random.default_rng(3)
    o = rng.uniform(-18, 18, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    def wave(live):
        # live-prefix by construction (the PT frame's live-first sort
        # produces exactly this layout)
        tmax = np.full((n,), 3e38, np.float32)
        tmax[live:] = -1.0
        return Rays(origin=jnp.asarray(o), direction=jnp.asarray(d),
                    t_min=jnp.full((n,), 1e-3, jnp.float32),
                    t_max=jnp.asarray(tmax))

    def inner(rr):
        hits, _, _ = cast_rays_cluster_v2(rr, cs, dmode="bitloop", qd=4)
        return hits

    @jax.jit
    def cast_full(rr):
        return inner(rr).t

    @jax.jit
    def cast_bucketed(rr, live_cnt):
        branches = []
        for b in sizes:
            def f(rr, b=b):
                return pad_hits(inner(slice_rays(rr, b)), n).t
            branches.append(f)
        idx = jnp.sum(live_cnt <= thr).astype(jnp.int32)
        return jax.lax.switch(idx, branches, rr)

    def timeit(fn, *a, iters=4):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    w = wave(n)
    t0 = time.time()
    cast_full(w).block_until_ready()
    print(f"full cast compile: {time.time()-t0:.1f}s", flush=True)
    print(f"full cast        : {timeit(cast_full, w)*1e3:7.1f} ms",
          flush=True)

    t0 = time.time()
    cast_bucketed(w, jnp.int32(n)).block_until_ready()
    print(f"bucketed compile : {time.time()-t0:.1f}s "
          f"(sizes={sizes})", flush=True)

    for live in (n, 150000, 40000, 20000, 4000):
        w = wave(live)
        dt = timeit(cast_bucketed, w, jnp.int32(live))
        ref = timeit(cast_full, w)
        print(f"live={live:7d}: bucketed {dt*1e3:7.1f} ms   "
              f"full {ref*1e3:7.1f} ms", flush=True)
        # parity on the live prefix
        hb = cast_bucketed(w, jnp.int32(live))
        hf = cast_full(w)
        ok = bool(jnp.all(hb[:live] == hf[:live]))
        print(f"             prefix parity: {ok}", flush=True)


if __name__ == "__main__":
    main()
