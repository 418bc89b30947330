"""Scene checkpointing: save/load built scenes without rebuilding.

The reference rebuilds from the live Godot scene tree on every build()
(the "Godot-Native Principle", SURVEY.md §5) and leaves TinyBVH's BVH file
cache unused (tiny_bvh.h:96-97).  For a headless TPU framework the
device-resident scene arrays ARE the state, so checkpointing is a plain
.npz round trip of every SoA array — build once (the only host-side step),
reload in milliseconds on any host.
"""

from __future__ import annotations

import numpy as np

from ..accel.bvh import BVH
from ..core.types import Triangles
from ..kernels.wide import WideScene
from .scene import RayScene

import jax.numpy as jnp

_FORMAT_VERSION = 2


def save_scene(path: str, scene: RayScene) -> None:
    """Serialize a built RayScene (tris + BVH + wide layout) to ``path``."""
    arrs = {
        "format_version": np.int32(_FORMAT_VERSION),
        "use_bvh": np.bool_(scene.use_bvh),
        "backend": np.bytes_(scene.backend.encode()),
        # triangles
        "tri_v0": np.asarray(scene.tris.v0),
        "tri_e1": np.asarray(scene.tris.edge1),
        "tri_e2": np.asarray(scene.tris.edge2),
        "tri_n": np.asarray(scene.tris.normal),
        "tri_pid": np.asarray(scene.tris.prim_id),
        "tri_lay": np.asarray(scene.tris.layers),
        # bvh
        "bvh_min": np.asarray(scene.bvh.aabb_min),
        "bvh_max": np.asarray(scene.bvh.aabb_max),
        "bvh_lf": np.asarray(scene.bvh.left_first),
        "bvh_cnt": np.asarray(scene.bvh.count),
        "bvh_order": np.asarray(scene.bvh.tri_order),
        "bvh_axis": np.asarray(scene.bvh.split_axis),
        "bvh_num_levels": np.int32(len(scene.bvh.levels)),
    }
    for i, lvl in enumerate(scene.bvh.levels):
        arrs[f"bvh_level_{i}"] = np.asarray(lvl)
    if scene.wide is not None:
        arrs.update(
            wide_nodes=np.asarray(scene.wide.nodes),
            wide_leaf=np.asarray(scene.wide.leaf_tris),
            wide_pid=np.asarray(scene.wide.slot_prim_id),
            wide_lay=np.asarray(scene.wide.slot_layers),
            wide_nrm=np.asarray(scene.wide.slot_normal),
            wide_tri=np.asarray(scene.wide.slot_tri),
            wide_nidx=np.asarray(scene.wide.node_idx),
            wide_lidx=np.asarray(scene.wide.leaf_idx),
            wide_nconst=np.asarray(scene.wide.node_const),
            wide_lconst=np.asarray(scene.wide.leaf_const),
            wide_dummy=np.int32(scene.wide.dummy_enc),
            wide_dummy_leaf=np.int32(scene.wide.dummy_leaf),
            wide_stream=np.bool_(scene.wide.stream_leaves),
            wide_stream_nodes=np.bool_(scene.wide.stream_nodes),
            wide_branching=np.int32(scene.wide.branching),
        )
    np.savez_compressed(path, **arrs)


def load_scene(path: str) -> RayScene:
    """Load a scene saved by ``save_scene``; arrays go straight to device."""
    z = np.load(path)
    assert int(z["format_version"]) in (1, 2), "scene format mismatch"
    tris = Triangles(
        v0=jnp.asarray(z["tri_v0"]), edge1=jnp.asarray(z["tri_e1"]),
        edge2=jnp.asarray(z["tri_e2"]), normal=jnp.asarray(z["tri_n"]),
        prim_id=jnp.asarray(z["tri_pid"]), layers=jnp.asarray(z["tri_lay"]),
    )
    levels = tuple(
        jnp.asarray(z[f"bvh_level_{i}"]) for i in range(int(z["bvh_num_levels"]))
    )
    bvh = BVH(
        aabb_min=jnp.asarray(z["bvh_min"]), aabb_max=jnp.asarray(z["bvh_max"]),
        left_first=jnp.asarray(z["bvh_lf"]), count=jnp.asarray(z["bvh_cnt"]),
        tri_order=jnp.asarray(z["bvh_order"]),
        split_axis=jnp.asarray(z["bvh_axis"]), levels=levels,
    )
    wide = None
    if "wide_nodes" in z:
        wide = WideScene(
            nodes=jnp.asarray(z["wide_nodes"]),
            leaf_tris=jnp.asarray(z["wide_leaf"]),
            slot_prim_id=jnp.asarray(z["wide_pid"]),
            slot_layers=jnp.asarray(z["wide_lay"]),
            slot_normal=jnp.asarray(z["wide_nrm"]),
            slot_tri=jnp.asarray(z["wide_tri"]),
            node_idx=jnp.asarray(z["wide_nidx"]),
            leaf_idx=jnp.asarray(z["wide_lidx"]),
            node_const=jnp.asarray(z["wide_nconst"]),
            leaf_const=jnp.asarray(z["wide_lconst"]),
            dummy_enc=int(z["wide_dummy"]),
            dummy_leaf=int(z["wide_dummy_leaf"]),
            stream_leaves=bool(z["wide_stream"]) if "wide_stream" in z else False,
            stream_nodes=bool(z["wide_stream_nodes"])
            if "wide_stream_nodes" in z else False,
            branching=int(z["wide_branching"])
            if "wide_branching" in z else 2,
        )
    backend = bytes(z["backend"]).decode()
    cluster = None
    if backend == "cluster":
        # Cluster tables are derived state: the host-side cluster cut is
        # cheap and the slabs are materialized on device by
        # refresh_cluster_scene, so rebuilding on load keeps checkpoints
        # small while the loaded scene casts through the SAME kernel (a
        # silent fallback to another backend would flip last-ulp t values).
        from ..kernels.cluster import build_cluster_scene, cluster_tcap_for

        # Same density-routed tcap as build_scene (scene.py): a different
        # cluster size means different anchors, which flips last-ulp t
        # values vs the saved scene's casts.
        cluster = build_cluster_scene(
            bvh, tris, tcap=cluster_tcap_for(tris.count)
        )
    return RayScene(
        tris=tris, bvh=bvh, wide=wide,
        use_bvh=bool(z["use_bvh"]),
        backend=backend, cluster=cluster,
    )
