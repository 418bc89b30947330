"""messyerraytracer_tpu — a TPU-native ray-casting and path-tracing framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
MessyerRaytracer (a Godot GDExtension C++ raytracer with CPU-SIMD and Vulkan
compute backends).  The reference's thread-pool + SSE packet path and its GPU
compute path collapse into a single TPU backend: ray generation, Morton-code
ray sorting, slab AABB tests, Moller-Trumbore intersection, and binned-SAH
BVH build / refit / traversal run over HBM-resident SoA scene arrays, with
the hot traversal loops as Pallas kernels.

Public API mirrors the reference's ``build_scene`` / ``cast_ray`` /
batch-cast surface with the same hit semantics
(t, position, normal, u/v, prim_id, layer masks) — see SURVEY.md.
"""

__version__ = "0.1.0"

from .core.types import (  # noqa: F401
    ALL_LAYERS,
    NO_HIT,
    Hits,
    Rays,
    RayStats,
    Triangles,
    make_rays,
    make_triangles,
)
from .render.camera import CameraParams, debug_grid_rays, generate_rays  # noqa: F401
