"""Native (C++) wide8 table builder must be bit-identical to numpy's."""

import numpy as np
import jax.numpy as jnp
import pytest

import messyerraytracer_tpu.kernels.wide as W
import messyerraytracer_tpu.native as nat
from messyerraytracer_tpu.accel.bvh import build_bvh
from messyerraytracer_tpu.core.types import Triangles
from messyerraytracer_tpu.utils import meshes


def _slot_tris(v0, v1, v2, perm, t):
    pv0 = v0[perm]
    e1 = v1[perm] - pv0
    e2 = v2[perm] - pv0
    nrm = np.cross(e1, e2)
    nl = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / np.where(nl > 0, nl, 1)
    return Triangles(
        v0=jnp.asarray(pv0), edge1=jnp.asarray(e1), edge2=jnp.asarray(e2),
        normal=jnp.asarray(nrm.astype(np.float32)),
        prim_id=jnp.asarray(perm.astype(np.int32)),
        layers=jnp.asarray(np.full(t, -1, np.int32)),
    )


def _scenes():
    g = meshes.plane(40.0, y=0.0, subdiv=24)
    g[:, :, 1] = (np.sin(g[:, :, 0] * 0.6) * np.cos(g[:, :, 2] * 0.5)) * 1.5
    rng = np.random.default_rng(3)
    return {
        "terrain+sphere": np.concatenate(
            [g, meshes.uv_sphere(2.0, 10, 20, center=(0, 4, 0))]
        ),
        "tiny": meshes.uv_sphere(1.0, 4, 8),
        "soup": rng.uniform(-1, 1, (2000, 3, 3)).astype(np.float32),
    }


@pytest.mark.skipif(nat.get_native_lib() is None,
                    reason="no native toolchain")
@pytest.mark.parametrize("name", list(_scenes().keys()))
def test_native_tables_identical(name):
    tri = _scenes()[name]
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    bvh = build_bvh(v0, v1, v2)
    host = bvh.host
    t = tri.shape[0]
    tabs = nat.native_build_wide8_tables(
        host["aabb_min"], host["aabb_max"], host["left_first"],
        host["count"], t,
    )
    assert tabs is not None
    n_idx, n_const, l_idx, l_const, _, _, nw, num_leaf = tabs

    tris = _slot_tris(v0, v1, v2, host["tri_order"], t)
    saved = nat.native_build_wide8_tables
    nat.native_build_wide8_tables = lambda *a, **k: None
    try:
        ws = W.build_wide8_scene(bvh, tris)
    finally:
        nat.native_build_wide8_tables = saved

    np.testing.assert_array_equal(n_idx, np.asarray(ws.node_idx))
    np.testing.assert_array_equal(l_idx, np.asarray(ws.leaf_idx))
    np.testing.assert_array_equal(
        n_const, np.asarray(ws.node_const)
    )
    np.testing.assert_array_equal(l_const, np.asarray(ws.leaf_const))
    assert 2 * nw == ws.dummy_enc and num_leaf == ws.dummy_leaf
