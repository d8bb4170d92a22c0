"""Lighting model: emission, soft-shadow direct lighting, Phong/Blinn
specular, attenuation, hemisphere sampling and refraction directions.

Faithful to cast_ray's lighting block (render.c:158-301) with the
reference's idiosyncrasies preserved (SURVEY.md §3.5):

* direct light only on outside hits; blocked lights contribute nothing;
  transparent blockers tint the light by ∏kt;
* light attenuation divides by (offset + |d|) or (offset + |d|²)
  (render.c:191-200) but *segment* attenuation divides the accumulated hit
  color by (offset + t) or (offset + t)² (render.c:292-301) — note the
  square is of the sum there;
* specular uses C powf/fmaxf semantics (negative bases, NaN→0);
* hemisphere sampling uses inclination=acos(2u−1), azimuth=u·π
  (render.c:281-282) through the normal-aligned rotation
  (render.c:240-268);
* sphere light points use the reference's idiosyncratic spherical sampling
  with near-always direction flip (object.c:293-304).

Randomness: deterministic ``jax.random`` keys (threaded per purpose) replace
the reference's raced libc rand() — we match the estimand, not the noise
stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.core import cmath, vec
from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render.config import (
    ATTEN_LINEAR, ATTEN_NONE, ATTEN_SQUARE, GI_PATH, REFLECTION_BLINN,
    REFLECTION_PHONG, RenderConfig)
from c_raytracer_tpu.scene import types as T
from c_raytracer_tpu.textures import texture_color


def attenuate_light(cfg: RenderConfig, intensity, dist):
    """Incoming-light attenuation (render.c:191-200)."""
    if cfg.light_attenuation == ATTEN_NONE:
        return intensity
    off = jnp.float32(cfg.attenuation_offset)
    if cfg.light_attenuation == ATTEN_LINEAR:
        return intensity / (off + dist)[..., None]
    return intensity / (off + dist * dist)[..., None]


def attenuate_segment(cfg: RenderConfig, color, t):
    """Per-segment attenuation of the accumulated hit color
    (render.c:292-301); note sqr divides by (offset+t)²."""
    if cfg.light_attenuation == ATTEN_NONE:
        return color
    off = jnp.float32(cfg.attenuation_offset)
    if cfg.light_attenuation == ATTEN_LINEAR:
        return color / (off + t)[..., None]
    s = off + t
    return color / (s * s)[..., None]


def reflect_dir(d, n, b):
    """Mirror direction: d − 2(n·d)n (render.c:313-314)."""
    return d - n * (2.0 * b)[..., None]


def refract_dir(d, n, b, is_outside, ior):
    """Snell rotation in the plane of incidence (render.c:324-337).

    Returns (direction, valid).  The reference produces NaN directions on
    total internal reflection (asin of >1) and on exactly-normal incidence
    (normalizing a zero cross product); NaN rays miss everything and
    contribute nothing.  We mark those lanes invalid instead (identical
    image) and keep all arithmetic NaN-free so reverse-mode gradients stay
    clean.
    """
    # clamp |b|<=1 (float error can push the dot past 1).  arccos/arcsin
    # have infinite slope at ±1; double-where so the masked boundary lanes
    # contribute zero gradient instead of NaN (gradients exist a.e.).
    ab = jnp.abs(b)
    interior = ab < 1.0
    incident = jnp.where(
        interior, jnp.arccos(jnp.where(interior, ab, 0.5)), 0.0)
    ratio = jnp.where(is_outside, 1.0 / ior, ior)
    sin_r = jnp.sin(incident) * ratio
    tir = jnp.abs(sin_r) > 1.0
    sin_interior = jnp.abs(sin_r) < 1.0
    refracted = jnp.where(
        sin_interior,
        jnp.arcsin(jnp.where(sin_interior, sin_r, 0.5)),
        jnp.where(sin_r > 0, vec.PI / 2, -vec.PI / 2))
    delta = refracted - incident
    cr = vec.cross(d, n)
    m = vec.safe_mag(cr)
    degenerate = m == 0.0
    c = cr / jnp.where(degenerate, 1.0, m)[..., None]
    c = jnp.where(is_outside[..., None], c, -c)
    f = vec.cross(c, d)
    out = d * jnp.cos(delta)[..., None] + f * jnp.sin(delta)[..., None]
    om = vec.safe_mag(out)
    out = out / jnp.where(om == 0.0, 1.0, om)[..., None]
    return out, ~(tir | degenerate)


def gi_rotation(normal, eps):
    """Normal-aligned rotation matrix (render.c:240-268): maps +Y to the
    normal; the near-(0,−1,0) special case uses the 180° X-flip.

    normal: (..., 3); eps: (...,) per-hit object epsilon.
    Returns (..., 3, 3).
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    down = (ny - eps) < -1.0
    mul = 1.0 / jnp.where(down, 1.0, 1.0 + ny)  # guarded divisor
    r = jnp.stack([
        jnp.stack([1.0 - nx * nx * mul, nx, -nx * nz * mul], -1),
        jnp.stack([-nx, 1.0 - (nx * nx + nz * nz) * mul, -nz], -1),
        jnp.stack([-nx * nz * mul, nz, 1.0 - nz * nz * mul], -1),
    ], -2)
    flip = jnp.asarray(np.array([
        [1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], np.float32))
    return jnp.where(down[..., None, None], flip, r)


def sample_hemisphere(key, normal, eps):
    """One cosine-ish hemisphere direction per lane (render.c:281-283).

    normal: (..., 3).  Returns (dir, cos) where cos = n·dir ≥ 0.
    """
    u = jax.random.uniform(key, normal.shape[:-1] + (2,), jnp.float32)
    inclination = jnp.arccos(u[..., 0] * 2.0 - 1.0)
    azimuth = u[..., 1] * vec.PI
    local = vec.spherical_to_cartesian(
        jnp.float32(1.0), inclination, azimuth)
    rot = gi_rotation(normal, eps)
    d = jnp.einsum("...ij,...j->...i", rot, local)
    return d, vec.dot(normal, d)


def _sphere_light_point(key, center, radius, hit_pt):
    """Random sphere-surface point (object.c:293-304): the reference's
    direction flip triggers whenever dot(center−point, dir) ≠ 0 — i.e.
    essentially always."""
    u = jax.random.uniform(key, hit_pt.shape[:-1] + (2,), jnp.float32)
    inclination = u[..., 0] * (2.0 * vec.PI)
    azimuth = u[..., 1] * (2.0 * vec.PI)
    ldir = vec.spherical_to_cartesian(radius, inclination, azimuth)
    toward = center - hit_pt
    flip = vec.dot(toward, ldir) != 0.0
    ldir = jnp.where(flip[..., None], -ldir, ldir)
    return center + ldir


def _triangle_light_point(key, v0, e1, e2, hit_pt):
    """Uniform barycentric point (object.c:403-419)."""
    u = jax.random.uniform(key, hit_pt.shape[:-1] + (2,), jnp.float32)
    p, q = u[..., 0], u[..., 1]
    over = p + q > 1.0
    p = jnp.where(over, 1.0 - p, p)
    q = jnp.where(over, 1.0 - q, q)
    return v0 + e1 * p[..., None] + e2 * q[..., None]


def direct_light(ix, static: T.SceneStatic, cfg: RenderConfig,
                 key, hit_pt, normal, ray_d, gid, mat, is_outside, tex_col,
                 active):
    """Soft-shadow direct lighting over all emitters (render.c:170-229).

    All inputs (P, ...) per-lane; returns (P, 3) summed contribution.
    Per emitter: ke/num_lights intensity per sample, num_lights samples
    scanned in chunks of cfg.light_chunk.
    """
    ds = ix.ds
    P = hit_pt.shape[0]
    total = jnp.zeros((P, 3), jnp.float32)
    transparent_mask = jnp.asarray(
        np.asarray(static.is_transparent, bool))
    kt_by_mat = ds.materials.kt
    phong = cfg.reflection_model == REFLECTION_PHONG

    for e_i, egid in enumerate(static.emitter_prims):
        num_lights = static.num_lights[egid]
        if num_lights == 0:
            continue  # zero-sample emitter: loop never runs (render.c:176)
        e_mat = static.material_index[egid]
        intensity = ds.materials.ke[e_mat] / jnp.float32(num_lights)
        ekey = jax.random.fold_in(key, e_i)

        lc = min(cfg.light_chunk, num_lights)
        nchunks = -(-num_lights // lc)
        # lane mask for the padded tail of the last chunk
        lane_idx = jnp.arange(lc)

        # static emitter type dispatch
        is_sphere_emitter = egid < static.n_spheres

        def light_dirs(chunk_i, _egid=egid, _ekey=ekey,
                       _is_sph=is_sphere_emitter, _lc=lc):
            """Chunk's sampled light directions (deterministic per key, so
            the shadow and shading passes can both regenerate them)."""
            ckey = jax.random.fold_in(_ekey, chunk_i)
            keys = jax.random.split(ckey, _lc)
            if _is_sph:
                lp = jax.vmap(
                    lambda k: _sphere_light_point(
                        k, ds.sph_center[_egid], ds.sph_radius[_egid],
                        hit_pt),
                    out_axes=1)(keys)
            else:
                ti = _egid - static.n_spheres
                lp = jax.vmap(
                    lambda k: _triangle_light_point(
                        k, ds.tri_v0[ti], ds.tri_e1[ti], ds.tri_e2[ti],
                        hit_pt),
                    out_axes=1)(keys)
            lvec = lp - hit_pt[:, None, :]
            ldist = vec.safe_mag(lvec)
            ldir = lvec / jnp.where(ldist == 0.0, 1.0, ldist)[..., None]
            return ldir, ldist

        if ix.has_clusters:
            # shared-origin sweep: all chunks' occlusion in one pass with
            # per-pixel visit lists (accel/intersect.py shadow_query)
            elo, ehi = ix.emitter_bounds(egid)
            shadow_all = ix.shadow_query(
                transparent_mask, kt_by_mat, hit_pt, elo, ehi,
                lambda ci, _egid=egid, _f=light_dirs: (
                    *_f(ci), jnp.full((hit_pt.shape[0], lc), _egid,
                                      jnp.int32)),
                nchunks, lc)
        else:
            shadow_all = None

        def chunk_body(carry, chunk_i, _egid=egid, _e_mat=e_mat,
                       _intensity=intensity, _lc=lc,
                       _num_lights=num_lights, _dirs=light_dirs,
                       _shadow=shadow_all):
            acc = carry
            ldir, ldist = _dirs(chunk_i)
            a = vec.dot(ldir, normal[:, None, :])

            if _shadow is None:
                blocked, tint = ix.any_tint(
                    transparent_mask, kt_by_mat,
                    jnp.broadcast_to(hit_pt[:, None, :], ldir.shape), ldir,
                    ldist, jnp.full(ldist.shape, _egid, jnp.int32))
            else:
                blocked = _shadow[0][:, chunk_i]
                tint = _shadow[1][:, chunk_i]

            incoming = _intensity * tint
            incoming = attenuate_light(cfg, incoming, ldist)

            diffuse = (tex_col[:, None, :] * incoming
                       * cmath.fmaxf_zero(a)[..., None])

            if phong:
                reflected = normal[:, None, :] * (2.0 * a)[..., None] - ldir
                spec_mul = -vec.dot(reflected, ray_d[:, None, :])
            else:  # Blinn half-vector variant (render.c:215-220)
                hv = ray_d[:, None, :] - ldir
                hm = vec.safe_mag(hv)
                reflected = hv / jnp.where(hm == 0.0, 1.0, hm)[..., None]
                spec_mul = -vec.dot(normal[:, None, :], reflected)
            shin = ds.materials.shininess[mat]
            spec = (ds.materials.ks[mat][:, None, :] * incoming
                    * cmath.fmaxf_zero(
                        cmath.c_powf(spec_mul, shin[:, None]))[..., None])

            ok = (active & is_outside & (gid != _egid))[:, None] & ~blocked
            # mask padded tail lanes of the final chunk
            sample_idx = chunk_i * _lc + lane_idx
            ok = ok & (sample_idx < _num_lights)[None, :]
            contrib = jnp.where(ok[..., None], diffuse + spec, 0.0)
            return acc + jnp.sum(contrib, axis=1), None

        # remat each chunk in the backward pass: per-chunk residuals are
        # (P, lc, ...)-shaped and explode HBM at production resolutions
        body = jax.checkpoint(chunk_body) if cfg.remat else chunk_body
        acc, _ = jax.lax.scan(
            body, jnp.zeros((P, 3), jnp.float32),
            jnp.arange(nchunks))
        total = total + acc
    return total


def shade_basic(ix, static: T.SceneStatic, cfg: RenderConfig,
                key, o, d, t, gid, normal, active):
    """Emission + direct lighting for a batch of hits — the shade of a
    terminal (remaining_bounces==0) ray in path mode, and the base of the
    full shade.  Returns (color (P,3), aux dict)."""
    ds = ix.ds
    hit = gid >= 0
    active = active & hit
    g = jnp.maximum(gid, 0)
    mat = ds.mat_idx[g]
    # miss lanes carry t=FLT_MAX; clamp them so hit points stay finite
    # (their contribution is masked, but inf would poison reverse-mode)
    t = jnp.where(hit, t, 1.0)
    hit_pt = o + d * t[..., None]
    b = vec.dot(normal, d)
    is_outside = cmath.signbit(b)

    tex_col = texture_color(
        ds.materials, static.tex_type, static.tex_func, mat, hit_pt)

    color = ds.materials.ke[mat]  # emittance (render.c:164)
    color = color + direct_light(
        ix, static, cfg, key, hit_pt, normal, d, gid, mat, is_outside,
        tex_col, active)
    color = jnp.where(active[..., None], color, 0.0)
    aux = dict(hit_pt=hit_pt, mat=mat, b=b, is_outside=is_outside,
               tex_col=tex_col, hit=hit)
    return color, aux
