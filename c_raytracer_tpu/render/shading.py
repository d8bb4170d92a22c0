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

TPU shape discipline: everything runs on SoA ``V3`` component arrays with
the ray axis last-minor; light-sample batches are (lc, P) — the sample
axis LEADS so XLA's (8, 128) tiling stays dense (a trailing lc=8 axis
would pad 16×).  Material properties are fetched by statically-unrolled
selects over the (tiny) material table, never by gather.

Randomness: deterministic ``jax.random`` keys (threaded per purpose)
replace the reference's raced libc rand() — we match the estimand, not the
noise stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.core import cmath, remat, rng
from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.core.v3 import V3
from c_raytracer_tpu.render.config import (
    ATTEN_LINEAR, ATTEN_NONE, REFLECTION_PHONG, RenderConfig)
from c_raytracer_tpu.scene import types as T
from c_raytracer_tpu.textures import texture_color_soa

PI = v3m.PI


def mat3(table, mat) -> V3:
    """(M, 3) material table → V3 per lane, by unrolled select (no gather;
    the M is tiny and static)."""
    rows = [v3m.splat(table[m]) for m in range(table.shape[0])]
    return v3m.select_v3(mat, rows)


def mat1(table, mat):
    """(M,) material table → per-lane scalar, by unrolled select."""
    vals = [table[m] for m in range(table.shape[0])]
    return v3m.select_scalar(mat, vals,
                             init=jnp.zeros(jnp.shape(mat), table.dtype))


def attenuate_light(cfg: RenderConfig, intensity: V3, dist) -> V3:
    """Incoming-light attenuation (render.c:191-200)."""
    if cfg.light_attenuation == ATTEN_NONE:
        return intensity
    off = jnp.float32(cfg.attenuation_offset)
    if cfg.light_attenuation == ATTEN_LINEAR:
        return intensity * (1.0 / (off + dist))
    return intensity * (1.0 / (off + dist * dist))


def attenuate_segment(cfg: RenderConfig, color: V3, t) -> V3:
    """Per-segment attenuation of the accumulated hit color
    (render.c:292-301); note sqr divides by (offset+t)²."""
    if cfg.light_attenuation == ATTEN_NONE:
        return color
    off = jnp.float32(cfg.attenuation_offset)
    if cfg.light_attenuation == ATTEN_LINEAR:
        return color * (1.0 / (off + t))
    s = off + t
    return color * (1.0 / (s * s))


def reflect_dir(d: V3, n: V3, b) -> V3:
    """Mirror direction: d − 2(n·d)n (render.c:313-314)."""
    return d - n * (2.0 * b)


def refract_dir(d: V3, n: V3, b, is_outside, ior):
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
        jnp.where(sin_r > 0, PI / 2, -PI / 2))
    delta = refracted - incident
    cr = v3m.cross(d, n)
    m = v3m.safe_mag(cr)
    degenerate = m == 0.0
    c = cr * (1.0 / jnp.where(degenerate, 1.0, m))
    c = v3m.where(is_outside, c, -c)
    f = v3m.cross(c, d)
    out = d * jnp.cos(delta) + f * jnp.sin(delta)
    om = v3m.safe_mag(out)
    out = out * (1.0 / jnp.where(om == 0.0, 1.0, om))
    return out, ~(tir | degenerate)


def sample_hemisphere(key, normal: V3, eps):
    """One hemisphere direction per lane (render.c:281-283) through the
    normal-aligned rotation (render.c:240-268): maps +Y to the normal; the
    near-(0,−1,0) special case uses the 180° X-flip.

    normal: V3 (P,); eps: (P,) per-hit object epsilon.
    Returns (dir V3, cos) where cos = n·dir.
    """
    P = jnp.shape(normal.x)
    u = rng.uniform(key, (2,) + P, jnp.float32)
    inclination = jnp.arccos(u[0] * 2.0 - 1.0)
    azimuth = u[1] * PI
    lo = v3m.spherical_to_cartesian(jnp.float32(1.0), inclination, azimuth)

    nx, ny, nz = normal.x, normal.y, normal.z
    down = (ny - eps) < -1.0
    mul = 1.0 / jnp.where(down, 1.0, 1.0 + ny)  # guarded divisor
    # rotation rows (render.c:240-268)
    rx = V3(1.0 - nx * nx * mul, nx, -nx * nz * mul)
    ry = V3(-nx, 1.0 - (nx * nx + nz * nz) * mul, -nz)
    rz = V3(-nx * nz * mul, nz, 1.0 - nz * nz * mul)
    d = V3(v3m.dot(rx, lo), v3m.dot(ry, lo), v3m.dot(rz, lo))
    d_flip = V3(lo.x, -lo.y, -lo.z)          # 180° X rotation
    d = v3m.where(down, d_flip, d)
    return d, v3m.dot(normal, d)


def _sphere_light_point_from_u(u, center: V3, radius, hit_pt: V3):
    """Sphere-surface points from pre-drawn uniforms u (2, lc, *P) —
    split out so the fused TPU shadow kernel and its jnp VJP reference can
    consume the SAME uniform draw (render/fused_shadow.py)."""
    inclination = u[0] * (2.0 * PI)
    azimuth = u[1] * (2.0 * PI)
    ldir = v3m.spherical_to_cartesian(radius, inclination, azimuth)
    toward = center - hit_pt                       # (P,) broadcast to (lc, P)
    flip = v3m.dot(toward.map(lambda a: a[None]), ldir) != 0.0
    ldir = v3m.where(flip, -ldir, ldir)
    return ldir + center


def _sphere_light_point(key, center: V3, radius, hit_pt: V3, lc):
    """Random sphere-surface points (object.c:293-304): the reference's
    direction flip triggers whenever dot(center−point, dir) ≠ 0 — i.e.
    essentially always.  Returns V3 (lc, *P)."""
    P = jnp.shape(hit_pt.x)
    u = rng.uniform(key, (2, lc) + P, jnp.float32)
    return _sphere_light_point_from_u(u, center, radius, hit_pt)


def _triangle_light_point(key, v0: V3, e1: V3, e2: V3, hit_pt: V3, lc):
    """Uniform barycentric points (object.c:403-419).  Returns V3 (lc, *P)."""
    P = jnp.shape(hit_pt.x)
    u = rng.uniform(key, (2, lc) + P, jnp.float32)
    p, q = u[0], u[1]
    over = p + q > 1.0
    p = jnp.where(over, 1.0 - p, p)
    q = jnp.where(over, 1.0 - q, q)
    return v0 + e1 * p + e2 * q


def _packed_sphere_chunk_ref(phong, lc, ns, npl, egid, atten_kind):
    """jnp reference of the fused shadow chunk in PACKED form
    (u (2,lc,P), px (17,P), scal_f (F,), n_valid (1,)) -> (3, P) — the
    function the fused kernel's custom VJP differentiates
    (render/fused_shadow.py; same formula chain as the kernel)."""
    EM = 8

    def ref(u, px, scal_f, n_valid):
        hit_pt = V3(px[0], px[1], px[2])
        normal = V3(px[3], px[4], px[5])
        ray_d = V3(px[6], px[7], px[8])
        tex = V3(px[9], px[10], px[11])
        ks = V3(px[12], px[13], px[14])
        shin = px[15]
        okf = px[16] > 0
        ec = V3(scal_f[0], scal_f[1], scal_f[2])
        erad = scal_f[3]
        inten = V3(scal_f[4], scal_f[5], scal_f[6])
        off = scal_f[7]

        lp = _sphere_light_point_from_u(u, ec, erad, hit_pt)
        lvec = lp - hit_pt.map(lambda x: x[None])
        ldist = v3m.safe_mag(lvec)
        ldir = lvec * (1.0 / jnp.where(ldist == 0.0, 1.0, ldist))
        nrm_b = normal.map(lambda x: x[None])
        a = v3m.dot(ldir, nrm_b)

        from c_raytracer_tpu.geometry import primitives as G
        o_b = hit_pt.map(lambda x: x[None])
        blocked = jnp.zeros(jnp.shape(u[0]), bool)
        for i in range(ns):
            if i == egid:
                continue
            base = EM + 5 * i
            c = V3(scal_f[base], scal_f[base + 1], scal_f[base + 2])
            t, hit = G._sphere_test_soa(o_b, ldir, c, scal_f[base + 3],
                                        scal_f[base + 4])
            blocked = blocked | (hit & (t < ldist))
        for i in range(npl):
            base = EM + 5 * ns + 5 * i
            n = V3(scal_f[base], scal_f[base + 1], scal_f[base + 2])
            t, hit, _ = G._plane_test_soa(o_b, ldir, n, scal_f[base + 3],
                                          scal_f[base + 4])
            blocked = blocked | (hit & (t < ldist))

        if atten_kind == "none":
            att = jnp.ones_like(ldist)
        elif atten_kind == "lin":
            att = 1.0 / (off + ldist)
        else:
            att = 1.0 / (off + ldist * ldist)
        incoming = inten * att

        rd_b = ray_d.map(lambda x: x[None])
        if phong:
            reflected = nrm_b * (2.0 * a) - ldir
            spec_mul = -v3m.dot(reflected, rd_b)
        else:
            hv = rd_b - ldir
            hm = v3m.safe_mag(hv)
            reflected = hv * (1.0 / jnp.where(hm == 0.0, 1.0, hm))
            spec_mul = -v3m.dot(nrm_b, reflected)
        cos_d = cmath.fmaxf_zero(a)
        spec_p = cmath.fmax0_powf(spec_mul, shin[None])

        lane = jax.lax.broadcasted_iota(jnp.int32, jnp.shape(u[0]), 0)
        ok = okf[None] & ~blocked & (lane < n_valid[0])
        diffuse = tex.map(lambda x: x[None]) * incoming * cos_d
        spec = ks.map(lambda x: x[None]) * incoming * spec_p
        contrib = v3m.where(ok, diffuse + spec, 0.0)
        return jnp.stack([jnp.sum(contrib.x, axis=0),
                          jnp.sum(contrib.y, axis=0),
                          jnp.sum(contrib.z, axis=0)], axis=0)

    return ref


def _fused_eligible(ix, static, cfg, egid, lc, P) -> bool:
    """Whether this emitter's shadow chunks can run the fused TPU kernel
    (render/fused_shadow.py) — dense opaque sphere/plane scene, sphere
    emitter, TPU target, block-alignable shapes."""
    if getattr(cfg, "fused_shadow", "off") != "on":
        return False
    if rng._target_platform() != "tpu":
        return False
    if ix.clusters is not None or ix.shards is not None:
        return False
    if static.n_triangles or any(static.is_transparent):
        return False
    if egid >= static.n_spheres:
        return False
    if lc % 8 or len(P) != 1:
        return False
    from c_raytracer_tpu.render import fused_shadow
    return fused_shadow.pick_block(P[0]) is not None


def direct_light(ix, static: T.SceneStatic, cfg: RenderConfig,
                 key, hit_pt: V3, normal: V3, ray_d: V3, gid, mat,
                 is_outside, tex_col: V3, active) -> V3:
    """Soft-shadow direct lighting over all emitters (render.c:170-229).

    All per-lane inputs are (P,); returns (V3 (P,) summed contribution,
    shadow_spill scalar int32 — the worst per-pixel visit truncation
    across emitters in BOTH sweep modes that can truncate: the union
    sweep's per-pixel union spill and the per_ray sweep's in-range
    segment spill.  0 proves every kt blocker was swept; the shared-mode
    capsule list and brute-force paths carry 0 by construction).
    Per emitter: ke/num_lights intensity per sample, num_lights samples
    scanned in chunks of cfg.light_chunk, each chunk an (lc, P) SoA batch.
    """
    ds = ix.ds
    P = jnp.shape(hit_pt.x)
    total = v3m.zeros(P)
    spill_max = jnp.int32(0)
    phong = cfg.reflection_model == REFLECTION_PHONG

    for e_i, egid in enumerate(static.emitter_prims):
        num_lights = static.num_lights[egid]
        if num_lights == 0:
            continue  # zero-sample emitter: loop never runs (render.c:176)
        e_mat = static.material_index[egid]
        intensity = v3m.splat(ds.materials.ke[e_mat]) * (
            1.0 / jnp.float32(num_lights))
        ekey = jax.random.fold_in(key, e_i)

        # chunk size: sublane-aligned (multiple of 8) — a ragged sample
        # axis pads every (lc, P) tile and measurably slows the sweep
        lc = min(cfg.light_chunk, -(-num_lights // 8) * 8)
        nchunks = -(-num_lights // lc)
        # lane mask for the padded tail of the last chunk: (lc, 1)
        lane_idx = jnp.arange(lc)[:, None] if len(P) else jnp.arange(lc)

        # static emitter type dispatch
        is_sphere_emitter = egid < static.n_spheres

        def light_dirs(chunk_i, _egid=egid, _ekey=ekey,
                       _is_sph=is_sphere_emitter, _lc=lc):
            """Chunk's sampled light directions (deterministic per key, so
            the shadow and shading passes can both regenerate them).
            Returns (ldir V3 (lc, P), ldist (lc, P))."""
            ckey = jax.random.fold_in(_ekey, chunk_i)
            if _is_sph:
                lp = _sphere_light_point(
                    ckey, v3m.splat(ds.sph_center[_egid]),
                    ds.sph_radius[_egid], hit_pt, _lc)
            else:
                ti = _egid - static.n_spheres
                lp = _triangle_light_point(
                    ckey, v3m.splat(ds.tri_v0[ti]),
                    v3m.splat(ds.tri_e1[ti]), v3m.splat(ds.tri_e2[ti]),
                    hit_pt, _lc)
            lvec = lp - hit_pt.map(lambda a: a[None])
            ldist = v3m.safe_mag(lvec)
            ldir = lvec * (1.0 / jnp.where(ldist == 0.0, 1.0, ldist))
            return ldir, ldist

        if ix.use_shared_shadows:
            # shared-origin sweep: all chunks' occlusion in one pass with
            # per-pixel visit lists (accel/intersect.py shadow_query).
            # Transparent scenes use per-chunk any_tint instead
            # (shadow_mode auto: thin per-sample segments keep the kt
            # product exact at small visit budgets, see config.py)
            elo, ehi = ix.emitter_bounds(egid)
            blocked_all, tint_all, sp = ix.shadow_query(
                hit_pt, elo, ehi, light_dirs, egid, nchunks, lc)
            shadow_all = (blocked_all, tint_all)
            spill_max = jnp.maximum(spill_max, sp)
        else:
            shadow_all = None

        ksv = mat3(ds.materials.ks, mat)            # (P,) V3
        shin = mat1(ds.materials.shininess, mat)    # (P,)

        if shadow_all is None and _fused_eligible(ix, static, cfg, egid,
                                                  lc, P):
            # fused Pallas path: sample + occlusion + shade + reduce in one
            # kernel (render/fused_shadow.py); the uniforms are drawn
            # OUTSIDE the custom-vjp boundary so forward (kernel) and
            # backward (jnp reference VJP) see the same sample set
            from c_raytracer_tpu.render import fused_shadow
            np_eps = np.asarray(static.epsilon, np.float32)
            ns, npl = static.n_spheres, static.n_planes
            okf = (active & is_outside & (gid != egid)).astype(jnp.float32)
            px = jnp.stack([
                hit_pt.x, hit_pt.y, hit_pt.z,
                normal.x, normal.y, normal.z,
                ray_d.x, ray_d.y, ray_d.z,
                tex_col.x, tex_col.y, tex_col.z,
                ksv.x, ksv.y, ksv.z, shin, okf], 0)
            parts = [ds.sph_center[egid], ds.sph_radius[egid][None],
                     jnp.stack([intensity.x, intensity.y, intensity.z]),
                     jnp.asarray([cfg.attenuation_offset], jnp.float32)]
            for i in range(ns):
                parts += [ds.sph_center[i], ds.sph_radius[i][None],
                          jnp.asarray([np_eps[i]])]
            for i in range(npl):
                parts += [ds.pln_n[i], ds.pln_d[i][None],
                          jnp.asarray([np_eps[ns + i]])]
            scal_f = jnp.concatenate(parts).astype(jnp.float32)
            ref = _packed_sphere_chunk_ref(phong, lc, ns, npl, egid,
                                           cfg.light_attenuation)
            fused = fused_shadow.make_fused_chunk(
                ref, lc, ns, npl, egid, phong, cfg.light_attenuation)

            def fused_chunk_body(acc, chunk_i, _f=fused, _px=px,
                                 _sf=scal_f, _ekey=ekey, _lc=lc,
                                 _nl=num_lights):
                ckey = jax.random.fold_in(_ekey, chunk_i)
                u = rng.uniform(ckey, (2, _lc) + P, jnp.float32)
                nv = jnp.asarray([_nl], jnp.int32) - chunk_i * _lc
                out = _f(u, _px, _sf, nv)
                return acc + V3(out[0], out[1], out[2]), None

            fbody = (remat.checkpoint(fused_chunk_body, cfg.remat_names)
                     if cfg.remat else fused_chunk_body)
            acc, _ = jax.lax.scan(fbody, v3m.zeros(P), jnp.arange(nchunks))
            total = total + acc
            continue

        def chunk_body(carry, chunk_i, _egid=egid,
                       _intensity=intensity, _lc=lc,
                       _num_lights=num_lights, _dirs=light_dirs,
                       _shadow=shadow_all):
            acc, sp = carry
            ldir, ldist = _dirs(chunk_i)
            # materialize the sampled directions ONCE: they feed the shadow
            # sweep, the diffuse cosine and the specular term, and without
            # the barrier XLA rematerializes the sin/cos sampling math into
            # each consumer fusion (3× the transcendental ALU; scene1 1024²
            # measured the three per-channel reduce fusions at 66% of the
            # frame)
            ldir_t, ldist = jax.lax.optimization_barrier(
                ((ldir.x, ldir.y, ldir.z), ldist))
            ldir = V3(*(remat.name_shadow_samples(c) for c in ldir_t))
            ldist = remat.name_shadow_samples(ldist)
            nrm_b = normal.map(lambda a: a[None])
            a = v3m.dot(ldir, nrm_b)

            if _shadow is None:
                blocked, tint, qspill = ix.any_tint(
                    hit_pt.map(lambda x: x[None]), ldir, ldist, _egid,
                    with_spill=True)
                # per_ray mode's runtime kt-truncation guard: count only
                # real sample lanes of shading-relevant pixels (the padded
                # tail and self-lit/inside lanes never contribute light)
                lane_real = ((active & is_outside & (gid != _egid))[None]
                             & (chunk_i * _lc + lane_idx < _num_lights))
                sp = jnp.maximum(
                    sp, jnp.max(jnp.where(lane_real, qspill, 0)))
                # save the mask across remat boundaries: backward then
                # skips the occlusion re-trace entirely (core/remat.py)
                blocked = remat.name_occlusion(blocked)
            else:
                blocked = _shadow[0][chunk_i]
                tn = _shadow[1]
                # opaque scenes carry no tint (merged into blocked)
                tint = (V3(tn[0][chunk_i], tn[1][chunk_i], tn[2][chunk_i])
                        if tn is not None else jnp.float32(1.0))

            incoming = _intensity * tint
            incoming = attenuate_light(cfg, incoming, ldist)

            rd_b = ray_d.map(lambda x: x[None])
            if phong:
                reflected = nrm_b * (2.0 * a) - ldir
                spec_mul = -v3m.dot(reflected, rd_b)
            else:  # Blinn half-vector variant (render.c:215-220)
                hv = rd_b - ldir
                hm = v3m.safe_mag(hv)
                reflected = hv * (1.0 / jnp.where(hm == 0.0, 1.0, hm))
                spec_mul = -v3m.dot(nrm_b, reflected)
            # one powf / cosine per sample, shared by all three channel
            # reductions (same rationale as the ldir barrier above)
            cos_d, spec_p = jax.lax.optimization_barrier(
                (cmath.fmaxf_zero(a),
                 cmath.fmax0_powf(spec_mul, shin[None])))
            cos_d = remat.name_shade_terms(cos_d)
            spec_p = remat.name_shade_terms(spec_p)
            diffuse = tex_col.map(lambda x: x[None]) * incoming * cos_d
            spec = ksv.map(lambda x: x[None]) * incoming * spec_p

            ok = (active & is_outside & (gid != _egid))[None] & ~blocked
            # mask padded tail lanes of the final chunk
            sample_idx = chunk_i * _lc + lane_idx
            ok = ok & (sample_idx < _num_lights)
            contrib = v3m.where(ok, diffuse + spec, 0.0)
            return (acc + contrib.map(lambda x: jnp.sum(x, axis=0)),
                    sp), None

        # remat each chunk in the backward pass (saving only the named
        # occlusion masks): per-chunk MT/shade residuals are (lc, P)-shaped
        # and explode HBM at production resolutions
        body = (remat.checkpoint(chunk_body, cfg.remat_names)
                if cfg.remat else chunk_body)
        (acc, sp), _ = jax.lax.scan(body, (v3m.zeros(P), jnp.int32(0)),
                                    jnp.arange(nchunks))
        total = total + acc
        spill_max = jnp.maximum(spill_max, sp)
    return total, spill_max


def shade_basic(ix, static: T.SceneStatic, cfg: RenderConfig,
                key, o: V3, d: V3, t, gid, mat, normal: V3, active):
    """Emission + direct lighting for a batch of hits — the shade of a
    terminal (remaining_bounces==0) ray in path mode, and the base of the
    full shade.  Returns (color V3 (P,), aux dict)."""
    ds = ix.ds
    hit = gid >= 0
    active = active & hit
    # miss lanes carry t=FLT_MAX; clamp them so hit points stay finite
    # (their contribution is masked, but inf would poison reverse-mode)
    t = jnp.where(hit, t, 1.0)
    hit_pt = o + d * t
    b = v3m.dot(normal, d)
    is_outside = cmath.signbit(b)

    tex_col = texture_color_soa(ds.materials, static, mat, hit_pt)

    color = mat3(ds.materials.ke, mat)  # emittance (render.c:164)
    direct, shadow_spill = direct_light(
        ix, static, cfg, key, hit_pt, normal, d, gid, mat, is_outside,
        tex_col, active)
    color = color + direct
    color = v3m.where(active, color, 0.0)
    aux = dict(hit_pt=hit_pt, mat=mat, b=b, is_outside=is_outside,
               tex_col=tex_col, hit=hit, shadow_spill=shadow_spill)
    return color, aux
