"""Vectorized shading library — TPU rewrite of ``ShadePass``.

Every function in the reference's per-pixel shading namespace
(src/modules/graphics/shade_pass.h) becomes a batched jnp expression over
(N,)-shaped pixel arrays, so a full-frame shade is a handful of fused XLA
elementwise passes instead of a parallel-for over pixels:

  * sky: analytic zenith/horizon/ground gradient (shade_pass.h:243-276)
    or equirect HDR panorama with bilinear sampling (:180-237)
  * Cook-Torrance pieces: GGX NDF, Schlick Fresnel, height-correlated
    Smith GGX (:283-311), identical constants (1e-7 denominators)
  * Godot-matching distance/spot attenuation (:456-473)
  * ``cook_torrance_multi_light``: NEE over <= 16 lights with per-light
    shadow masks (:597-660)
  * surface extraction: F0 = 0.04*specular*2 lerp metallic->albedo,
    metals have no diffuse (:560-587)
  * 5 tonemappers matching the Godot Environment enum
    LINEAR/REINHARD/FILMIC/ACES/AGX (:404-447) + sRGB gamma
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..utils.struct import pytree_dataclass

PI = 3.14159265358979


# ============================================================================
# Environment
# ============================================================================

@pytree_dataclass(meta_fields=("tonemap_mode", "has_panorama"))
class EnvironmentData:
    """Sky + ambient description (shade_pass.h:56-79).

    When ``has_panorama`` the (H, W, 3) float32 ``panorama`` array is
    sampled equirect; otherwise the analytic gradient is used.
    """

    sky_zenith: jnp.ndarray    # (3,)
    sky_horizon: jnp.ndarray   # (3,)
    sky_ground: jnp.ndarray    # (3,)
    ambient_color: jnp.ndarray  # (3,)
    ambient_energy: jnp.ndarray  # ()
    panorama: jnp.ndarray      # (H, W, 3) or (1, 1, 3) placeholder
    panorama_energy: jnp.ndarray  # ()
    tonemap_mode: int = 0      # 0=LINEAR 1=REINHARD 2=FILMIC 3=ACES 4=AGX
    has_panorama: bool = False


def make_environment(
    sky_zenith=(0.38, 0.45, 0.55),
    sky_horizon=(0.64, 0.65, 0.67),
    sky_ground=(0.2, 0.17, 0.13),
    ambient_color=(1.0, 1.0, 1.0),
    ambient_energy=1.0,
    panorama=None,
    panorama_energy=1.0,
    tonemap_mode=0,
) -> EnvironmentData:
    has_pan = panorama is not None
    if panorama is None:
        panorama = np.zeros((1, 1, 3), np.float32)
    return EnvironmentData(
        sky_zenith=jnp.asarray(sky_zenith, jnp.float32),
        sky_horizon=jnp.asarray(sky_horizon, jnp.float32),
        sky_ground=jnp.asarray(sky_ground, jnp.float32),
        ambient_color=jnp.asarray(ambient_color, jnp.float32),
        ambient_energy=jnp.asarray(ambient_energy, jnp.float32),
        panorama=jnp.asarray(panorama, jnp.float32),
        panorama_energy=jnp.asarray(panorama_energy, jnp.float32),
        tonemap_mode=int(tonemap_mode),
        has_panorama=has_pan,
    )


def direction_to_equirect_uv(d):
    """Unit direction -> equirect (u, v) in [0,1) (shade_pass.h:180-200)."""
    u = (jnp.arctan2(d[:, 0], -d[:, 2]) / (2.0 * PI)) + 0.5
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) / PI
    return u, v


def sample_panorama(pan: jnp.ndarray, u, v, energy):
    """Bilinear equirect sample with repeat wrap in u, clamp in v
    (shade_pass.h:202-237)."""
    h, w = pan.shape[0], pan.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0w = jnp.mod(x0, w)
    x1w = jnp.mod(x0 + 1, w)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    c00 = pan[y0c, x0w]
    c10 = pan[y0c, x1w]
    c01 = pan[y1c, x0w]
    c11 = pan[y1c, x1w]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return (top * (1 - fy) + bot * fy) * energy


def sky_color(directions: jnp.ndarray, env: EnvironmentData) -> jnp.ndarray:
    """(N,3) sky radiance for (N,3) directions (shade_pass.h:243-276)."""
    if env.has_panorama:
        u, v = direction_to_equirect_uv(directions)
        return sample_panorama(env.panorama, u, v, env.panorama_energy)
    t = directions[:, 1] * 0.5 + 0.5
    s_hi = ((t - 0.5) * 2.0)[:, None]
    s_lo = (t * 2.0)[:, None]
    upper = env.sky_horizon + (env.sky_zenith - env.sky_horizon) * s_hi
    lower = env.sky_ground + (env.sky_horizon - env.sky_ground) * s_lo
    return jnp.where((t > 0.5)[:, None], upper, lower)


def ambient_color_at(normals: jnp.ndarray, env: EnvironmentData) -> jnp.ndarray:
    """Hemisphere ambient (or panorama IBL sample) per surface normal
    (shade_pass.h:679-707)."""
    if env.has_panorama:
        u, v = direction_to_equirect_uv(normals)
        return sample_panorama(env.panorama, u, v, env.panorama_energy)
    blend = (normals[:, 1] * 0.5 + 0.5)[:, None]
    return env.sky_ground + (env.sky_zenith - env.sky_ground) * blend


# ============================================================================
# Materials / lights (SoA)
# ============================================================================

@pytree_dataclass
class Materials:
    """PBR material table (api/material_data.h:19-67), SoA over mat ids.

    ``albedo_tex``/``normal_tex`` index a ``TextureAtlas`` (the reference's
    decompressed albedo/normal ``Ref<Image>``, material_data.h:32-41):
    atlas id 0 is reserved white, so an untextured material uses
    albedo_tex=0 (albedo x white = albedo) and normal_tex=0 means "no
    normal map" (checked explicitly, like the reference's null Image).
    """

    albedo: jnp.ndarray       # (M, 3)
    metallic: jnp.ndarray     # (M,)
    roughness: jnp.ndarray    # (M,)
    specular: jnp.ndarray     # (M,)
    emission: jnp.ndarray     # (M, 3) premultiplied by emission_energy
    albedo_tex: jnp.ndarray   # (M,) int32 atlas id (0 = white)
    normal_tex: jnp.ndarray   # (M,) int32 atlas id (0 = none)
    normal_scale: jnp.ndarray  # (M,) normal-map strength


def make_materials(albedo, metallic=None, roughness=None, specular=None,
                   emission=None, albedo_tex=None, normal_tex=None,
                   normal_scale=None) -> Materials:
    albedo = jnp.asarray(albedo, jnp.float32).reshape(-1, 3)
    m = albedo.shape[0]

    def arr(x, default):
        if x is None:
            return jnp.full((m,), default, jnp.float32)
        return jnp.broadcast_to(jnp.asarray(x, jnp.float32), (m,))

    def iarr(x):
        if x is None:
            return jnp.zeros((m,), jnp.int32)
        return jnp.broadcast_to(jnp.asarray(x, jnp.int32), (m,))

    if emission is None:
        emission = jnp.zeros((m, 3), jnp.float32)
    else:
        emission = jnp.asarray(emission, jnp.float32).reshape(-1, 3)
    return Materials(
        albedo=albedo,
        metallic=arr(metallic, 0.0),
        roughness=arr(roughness, 0.7),
        specular=arr(specular, 0.5),
        emission=emission,
        albedo_tex=iarr(albedo_tex),
        normal_tex=iarr(normal_tex),
        normal_scale=arr(normal_scale, 1.0),
    )


def default_materials() -> Materials:
    """Single default material (Godot BaseMaterial3D defaults)."""
    return make_materials(albedo=[[0.75, 0.75, 0.75]])


LIGHT_DIRECTIONAL = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2
MAX_SCENE_LIGHTS = 16  # api/light_data.h:59


@pytree_dataclass
class Lights:
    """Scene light table, SoA, fixed-capacity (api/light_data.h:20-65).

    ``direction`` for DIRECTIONAL points *toward* the light.
    ``color`` is premultiplied color x energy, linear space.
    """

    type: jnp.ndarray        # (L,) int32
    position: jnp.ndarray    # (L, 3)
    direction: jnp.ndarray   # (L, 3)
    color: jnp.ndarray       # (L, 3)
    range: jnp.ndarray       # (L,)
    attenuation: jnp.ndarray  # (L,)
    spot_angle: jnp.ndarray  # (L,) outer half-angle, radians
    spot_atten: jnp.ndarray  # (L,)

    @property
    def count(self) -> int:
        return self.type.shape[0]


def make_lights(entries) -> Lights:
    """Build a light table from dicts with keys
    type/position/direction/color/energy/range/attenuation/spot_angle/
    spot_angle_attenuation."""
    n = len(entries)
    assert 0 < n <= MAX_SCENE_LIGHTS, "1..16 lights (light_data.h:59)"
    f = np.zeros
    typ = f((n,), np.int32)
    pos = f((n, 3), np.float32)
    dirn = f((n, 3), np.float32)
    col = f((n, 3), np.float32)
    rng = np.full((n,), 10.0, np.float32)
    att = np.ones((n,), np.float32)
    sa = np.full((n,), 0.785398, np.float32)
    saa = np.ones((n,), np.float32)
    for i, e in enumerate(entries):
        typ[i] = e.get("type", LIGHT_DIRECTIONAL)
        pos[i] = e.get("position", (0, 0, 0))
        d = np.asarray(e.get("direction", (0, -1, 0)), np.float32)
        dirn[i] = d / max(np.linalg.norm(d), 1e-12)
        col[i] = np.asarray(e.get("color", (1, 1, 1)), np.float32) * e.get(
            "energy", 1.0
        )
        rng[i] = e.get("range", 10.0)
        att[i] = e.get("attenuation", 1.0)
        sa[i] = e.get("spot_angle", 0.785398)
        saa[i] = e.get("spot_angle_attenuation", 1.0)
    return Lights(
        type=jnp.asarray(typ), position=jnp.asarray(pos),
        direction=jnp.asarray(dirn), color=jnp.asarray(col),
        range=jnp.asarray(rng), attenuation=jnp.asarray(att),
        spot_angle=jnp.asarray(sa), spot_atten=jnp.asarray(saa),
    )


# ============================================================================
# BRDF pieces (shade_pass.h:283-311) — all batched
# ============================================================================

def distribution_ggx(n_dot_h, roughness):
    a = roughness * roughness
    a2 = a * a
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom + 1e-7)


def fresnel_schlick(cos_theta, f0):
    t = 1.0 - cos_theta
    t2 = t * t
    return f0 + (1.0 - f0) * (t2 * t2 * t)


def geometry_smith_ggx(n_dot_v, n_dot_l, roughness):
    a = roughness * roughness
    a2 = a * a

    def g1(ndx):
        return 2.0 * ndx / (ndx + jnp.sqrt(a2 + (1.0 - a2) * ndx * ndx) + 1e-7)

    return g1(n_dot_v) * g1(n_dot_l)


def distance_attenuation(distance, rng, exp):
    """Godot OmniLight falloff (shade_pass.h:456-462)."""
    ratio = distance / rng
    base = jnp.maximum(1.0 - ratio * ratio, 0.0)
    return jnp.power(base, exp)


def spot_attenuation(light_to_point_dir, spot_forward, spot_angle, exp):
    """Spot cone falloff (shade_pass.h:465-473)."""
    cos_outer = jnp.cos(spot_angle)
    cos_angle = jnp.sum((-light_to_point_dir) * spot_forward, axis=-1)
    t = (cos_angle - cos_outer) / (1.0 - cos_outer)
    return jnp.where(
        cos_angle <= cos_outer, 0.0, jnp.power(jnp.maximum(t, 0.0), exp)
    )


# ============================================================================
# Surface extraction (shade_pass.h:482-587)
# ============================================================================

@pytree_dataclass
class Surface:
    """Batched SurfaceInfo: everything shading needs per hit pixel."""

    position: jnp.ndarray   # (N, 3)
    normal: jnp.ndarray     # (N, 3)
    view_dir: jnp.ndarray   # (N, 3) toward camera
    n_dot_v: jnp.ndarray    # (N,)
    albedo: jnp.ndarray     # (N, 3)
    metallic: jnp.ndarray   # (N,)
    roughness: jnp.ndarray  # (N,)
    f0: jnp.ndarray         # (N, 3)
    diff: jnp.ndarray       # (N, 3)
    emission: jnp.ndarray   # (N, 3)
    uv: jnp.ndarray         # (N, 2) texture UVs (0 when no attributes)


def extract_surface(hits, ray_dirs, materials: Materials,
                    mat_ids: jnp.ndarray, attrs=None, atlas=None) -> Surface:
    """Batched surface prep (shade_pass.h:482-587): smooth-normal
    interpolation, faceforward, normal-map perturbation via TBN, albedo
    texture sample, F0/diffuse derivation.

    ``mat_ids``: (N,) material index per pixel (already gathered by prim).
    ``attrs``: optional ``TriangleAttributes`` (UV/vertex-normal/tangent
    tables indexed by prim_id — triangle_uv.h / triangle_normals.h /
    triangle_tangents.h).  ``atlas``: optional ``TextureAtlas`` sampled by
    the material's ``albedo_tex``/``normal_tex`` ids
    (texture_sampler.h:45-88 semantics, batched).
    """
    uv = jnp.zeros((hits.t.shape[0], 2), jnp.float32)
    if attrs is not None:
        # smooth shading normal from vertex normals (shade_pass.h:496-504)
        from ..core.attributes import (
            interpolate_normal,
            interpolate_tangent,
            interpolate_uv,
            perturb_normal,
        )

        pid = jnp.maximum(hits.prim_id, 0).astype(jnp.int32)
        n = interpolate_normal(attrs, pid, hits.u, hits.v)
        uv = interpolate_uv(attrs, pid, hits.u, hits.v)
    else:
        n = hits.normal
    # Face-forward: flip the shading normal toward the viewer.
    flip = jnp.sum(n * ray_dirs, axis=-1) > 0.0
    n = jnp.where(flip[:, None], -n, n)

    albedo = materials.albedo[mat_ids]
    metallic = materials.metallic[mat_ids]
    roughness = jnp.maximum(materials.roughness[mat_ids], 0.04)
    specular = materials.specular[mat_ids]
    emission = materials.emission[mat_ids]

    if atlas is not None and attrs is not None:
        # Textures need real UVs: with no attribute tables every pixel's
        # uv is (0,0) and a textured material would be modulated by one
        # texel — the reference samples only when UVs exist
        # (shade_pass.h:516-524), so gate the whole block on attrs.
        from .textures import sample_bilinear

        # albedo texture modulates the flat color (shade_pass.h:516-524);
        # atlas id 0 is white so untextured materials are a no-op sample
        albedo = albedo * sample_bilinear(
            atlas, materials.albedo_tex[mat_ids], uv[:, 0], uv[:, 1]
        )
        # normal-map perturbation via the TBN basis
        # (shade_pass.h:527-553): sample in [0,1], decode to [-1,1]
        ntex = materials.normal_tex[mat_ids]
        nsamp = sample_bilinear(atlas, ntex, uv[:, 0], uv[:, 1])
        tang, sign, has_t = interpolate_tangent(attrs, pid, hits.u, hits.v)
        perturbed = perturb_normal(
            n, tang, sign, nsamp * 2.0 - 1.0,
            materials.normal_scale[mat_ids][:, None],
        )
        n = jnp.where(((ntex > 0) & has_t)[:, None], perturbed, n)

    view = -ray_dirs
    n_dot_v = jnp.maximum(jnp.sum(n * view, axis=-1), 1e-4)

    dielectric_f0 = (0.04 * specular * 2.0)[:, None]
    f0 = dielectric_f0 * (1.0 - metallic[:, None]) + albedo * metallic[:, None]
    diff = albedo * (1.0 - metallic[:, None])
    return Surface(
        position=hits.position, normal=n, view_dir=view, n_dot_v=n_dot_v,
        albedo=albedo, metallic=metallic, roughness=roughness,
        f0=f0, diff=diff, emission=emission, uv=uv,
    )


def light_sample(surf_pos, lights: Lights, li: int):
    """Per-light direction/attenuation/validity at surface points.

    Returns (light_dir (N,3), radiance_scale (N,), valid (N,), dist (N,)).
    Mirrors the per-light head of cook_torrance_multi_light
    (shade_pass.h:607-635).
    """
    is_dir = lights.type[li] == LIGHT_DIRECTIONAL
    to_light = lights.position[li] - surf_pos
    dist = jnp.linalg.norm(to_light, axis=-1)
    safe = jnp.maximum(dist, 1e-12)
    pdir = to_light / safe[:, None]
    ldir = jnp.where(is_dir, lights.direction[li], pdir)
    atten = distance_attenuation(dist, lights.range[li], lights.attenuation[li])
    is_spot = lights.type[li] == LIGHT_SPOT
    spot = spot_attenuation(
        -pdir, lights.direction[li], lights.spot_angle[li], lights.spot_atten[li]
    )
    atten = jnp.where(is_spot, atten * spot, atten)
    atten = jnp.where(is_dir, 1.0, atten)
    valid = is_dir | ((dist > 1e-6) & (dist <= lights.range[li]))
    valid = valid & (atten >= 1e-6)
    return ldir, atten, valid, dist


def light_sample_picked(surf_pos, lights: Lights, li: jnp.ndarray):
    """Per-pixel picked-light sampling: ``li`` is an (N,) int32 index array.

    One gathered evaluation of the stochastic single-light estimator
    (pt_shade.comp.glsl:697-717) — O(1) per pixel instead of evaluating
    every light and selecting.  Returns
    (light_dir (N,3), atten (N,), valid (N,), dist (N,), color (N,3),
    is_directional (N,)).
    """
    typ = lights.type[li]
    is_dir = typ == LIGHT_DIRECTIONAL
    to_light = lights.position[li] - surf_pos
    dist = jnp.linalg.norm(to_light, axis=-1)
    safe = jnp.maximum(dist, 1e-12)
    pdir = to_light / safe[:, None]
    ldirn = lights.direction[li]
    ldir = jnp.where(is_dir[:, None], ldirn, pdir)
    atten = distance_attenuation(dist, lights.range[li], lights.attenuation[li])
    spot = spot_attenuation(-pdir, ldirn, lights.spot_angle[li],
                            lights.spot_atten[li])
    atten = jnp.where(typ == LIGHT_SPOT, atten * spot, atten)
    atten = jnp.where(is_dir, 1.0, atten)
    valid = is_dir | ((dist > 1e-6) & (dist <= lights.range[li]))
    valid = valid & (atten >= 1e-6)
    return ldir, atten, valid, dist, lights.color[li], is_dir


def cook_torrance_single(surf: Surface, ldir, radiance):
    """Cook-Torrance BRDF x radiance x n_dot_l for one light direction per
    pixel (shade_pass.h:607-658 loop body).  Returns (contrib (N,3),
    n_dot_l (N,)); the caller applies validity/shadow masks."""
    n_dot_l = jnp.sum(surf.normal * ldir, axis=-1)
    h = surf.view_dir + ldir
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    n_dot_h = jnp.maximum(jnp.sum(surf.normal * h, axis=-1), 0.0)
    v_dot_h = jnp.maximum(jnp.sum(surf.view_dir * h, axis=-1), 0.0)
    d_term = distribution_ggx(n_dot_h, surf.roughness)
    g_term = geometry_smith_ggx(surf.n_dot_v, n_dot_l, surf.roughness)
    f = fresnel_schlick(v_dot_h[:, None], surf.f0)
    spec_scale = (
        d_term * g_term / (4.0 * surf.n_dot_v * n_dot_l + 1e-7)
    )[:, None]
    contrib = (
        (surf.diff * (1.0 - f) / PI + f * spec_scale)
        * radiance
        * n_dot_l[:, None]
    )
    return contrib, n_dot_l


def cook_torrance_multi_light(surf: Surface, lights: Lights,
                              lit_mask: jnp.ndarray | None) -> jnp.ndarray:
    """Direct illumination summed over all lights (shade_pass.h:597-660).

    ``lit_mask``: (L, N) bool — visibility from shadow rays (None = all lit,
    the ShadowContext null case).  Returns (N,3) linear radiance.
    """
    n = surf.position.shape[0]
    out = jnp.zeros((n, 3), jnp.float32)
    for li in range(lights.count):
        ldir, atten, valid, _ = light_sample(surf.position, lights, li)
        contrib, n_dot_l = cook_torrance_single(
            surf, ldir, lights.color[li] * atten[:, None]
        )
        valid = valid & (n_dot_l > 0.0)
        if lit_mask is not None:
            valid = valid & lit_mask[li]
        out = out + jnp.where(valid[:, None], contrib, 0.0)
    return out


# ============================================================================
# Tone mapping (shade_pass.h:404-447) + gamma
# ============================================================================

TONEMAP_LINEAR = 0
TONEMAP_REINHARD = 1
TONEMAP_FILMIC = 2
TONEMAP_ACES = 3
TONEMAP_AGX = 4


def _hable_partial(x):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def tonemap(c: jnp.ndarray, mode: int) -> jnp.ndarray:
    """Apply tonemapper ``mode`` (static int) to linear RGB (N,3)."""
    if mode == TONEMAP_LINEAR:
        return c
    if mode == TONEMAP_REINHARD:
        return c / (c + 1.0)
    if mode == TONEMAP_FILMIC:
        w = 11.2
        return _hable_partial(c) / _hable_partial(w)
    if mode == TONEMAP_ACES:
        mapped = (c * (2.51 * c + 0.03)) / (c * (2.43 * c + 0.59) + 0.14)
        return jnp.clip(mapped, 0.0, 1.0)
    if mode == TONEMAP_AGX:
        x = jnp.maximum(c, 0.0)
        x2 = x * x
        return jnp.minimum(x2 / (x2 + 0.09 * x + 0.0009), 1.0)
    raise ValueError(f"tonemap mode {mode}")


def to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB gamma approx (shade_pass.h:722-725)."""
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)
