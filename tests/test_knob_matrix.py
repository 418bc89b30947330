"""Blessed-knob parity matrix + probe gating (VERDICT r4 weak #7).

Every publicly reachable kernel-knob combination must return
oracle-identical hits; ``probe=`` timing modes (which intentionally
corrupt results) must be unreachable from the public casts without an
explicit tools-only acknowledgement flag.
"""

import numpy as np
import pytest

from messyerraytracer_tpu.core.brute import cast_rays_brute
from messyerraytracer_tpu.core.types import make_rays
from messyerraytracer_tpu.kernels import cluster as kcluster
from messyerraytracer_tpu.kernels.cluster import (
    build_cluster_scene,
    cast_rays_cluster,
)
from messyerraytracer_tpu.kernels.cluster_v2 import cast_rays_cluster_v2
from messyerraytracer_tpu.scene.scene import build_scene_from_tri_array
from messyerraytracer_tpu.utils import meshes


@pytest.fixture(scope="module")
def scene():
    g = meshes.plane(8.0, y=0.0, subdiv=8)
    g[:, :, 1] = np.sin(g[:, :, 0]) * 0.5
    sph = meshes.uv_sphere(1.0, 6, 10, center=(0, 1.2, 0))
    tris = np.concatenate([g, sph])
    base = build_scene_from_tri_array(tris, backend="pallas")
    cs = build_cluster_scene(base.bvh, base.tris, tcap=16)
    rng = np.random.default_rng(11)
    o = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 3.5, 256)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d)
    hb, _ = cast_rays_brute(rays, base.tris)
    return cs, rays, np.asarray(hb.prim_id), np.asarray(hb.t)


# the blessed combinations actually selected by RayScene._cluster_kw and
# the wavefront PT call sites (scene/scene.py, render/wavefront.py)
KNOBS = [
    {"dmode": "bitloop", "qd": 4, "popn": 1, "qroom": 16},
    {"dmode": "bitloop", "qd": 4, "popn": 2, "qroom": 16},
    {"dmode": "bitloop", "qd": 1, "popn": 1, "qroom": 8},
    {"dmode": "gr4", "qd": 4, "popn": 1, "qroom": 16},
    {"dmode": "all", "qd": 4, "popn": 1, "qroom": 16},
    {"dmode": "when", "qd": 2, "popn": 1, "qroom": 16},
]


class TestKnobMatrix:
    @pytest.mark.parametrize("kw", KNOBS,
                             ids=[f"{k['dmode']}-qd{k['qd']}-p{k['popn']}"
                                  f"-r{k['qroom']}" for k in KNOBS])
    def test_knob_combo_matches_oracle(self, scene, kw):
        cs, rays, pb, tb = scene
        h, s, _ = cast_rays_cluster_v2(rays, cs, **kw)
        np.testing.assert_array_equal(np.asarray(h.prim_id), pb)
        hit = pb >= 0
        np.testing.assert_allclose(np.asarray(h.t)[hit], tb[hit],
                                   rtol=1e-5)
        assert int(s.stack_drops) == 0

    def test_probe_rejected_on_public_casts(self, scene):
        cs, rays, _, _ = scene
        assert not kcluster.ALLOW_PROBES
        with pytest.raises(ValueError, match="probe"):
            cast_rays_cluster_v2(rays, cs, probe="nodma")
        with pytest.raises(ValueError, match="probe"):
            cast_rays_cluster(rays, cs, probe="spin")

    def test_probe_allowed_with_flag(self, scene):
        cs, rays, pb, _ = scene
        kcluster.ALLOW_PROBES = True
        try:
            # "nodrain" waits DMAs but skips the dense phase: runs
            # without error, returns all-miss (corrupt by design)
            h, _, _ = cast_rays_cluster_v2(rays, cs, probe="nodrain")
            assert (np.asarray(h.prim_id) == -1).all()
        finally:
            kcluster.ALLOW_PROBES = False
