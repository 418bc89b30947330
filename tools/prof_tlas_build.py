"""Profile the instanced-TLAS build phases (the bench headline scene)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    import messyerraytracer_tpu as mrt  # noqa: F401
    from messyerraytracer_tpu.accel.tlas import SceneTLAS
    from messyerraytracer_tpu.utils import meshes

    terrain = meshes.plane(20.0, y=0.0, subdiv=100)
    terrain[:, :, 1] = (np.sin(terrain[:, :, 0] * 0.9)
                        * np.cos(terrain[:, :, 2] * 0.8))
    sphere_hi = meshes.uv_sphere(1.6, 64, 64)
    sphere_lo = meshes.uv_sphere(1.0, 32, 32)
    rock = meshes.box((1.4, 1.0, 1.2))
    rng = np.random.default_rng(11)

    def xf(tx, ty, tz, s=1.0):
        m = np.eye(4, dtype=np.float32)
        m[0, 0] = m[1, 1] = m[2, 2] = s
        m[:3, 3] = (tx, ty, tz)
        return m

    tlas = SceneTLAS(backend="cluster")
    t0 = time.time()
    ms = [tlas.add_mesh(terrain), tlas.add_mesh(sphere_hi),
          tlas.add_mesh(sphere_lo), tlas.add_mesh(rock)]
    print(f"add_mesh x4: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    for gx in range(4):
        for gz in range(4):
            tlas.add_instance(ms[0], xf((gx - 1.5) * 20, 0.0,
                                        (gz - 1.5) * 20))
    for _ in range(60):
        c = rng.uniform(-35, 35, 2)
        tlas.add_instance(ms[1], xf(c[0], rng.uniform(1.5, 4.0), c[1],
                                    s=rng.uniform(0.6, 1.4)))
    for _ in range(99):
        c = rng.uniform(-35, 35, 2)
        tlas.add_instance(ms[2], xf(c[0], rng.uniform(0.8, 2.5), c[1],
                                    s=rng.uniform(0.5, 1.5)))
    for _ in range(40):
        c = rng.uniform(-35, 35, 2)
        tlas.add_instance(ms[3], xf(c[0], 0.5, c[1]))
    print(f"add_instance x215: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    tlas.build_tlas()
    print(f"build_tlas: {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    ct = tlas.build_instanced()
    jax.block_until_ready(ct.ablocks)
    print(f"build_instanced (cold): {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    tlas._ctlas = None
    ct = tlas.build_instanced()
    jax.block_until_ready(ct.ablocks)
    print(f"build_instanced (warm): {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
