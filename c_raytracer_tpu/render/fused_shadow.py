"""Fused soft-shadow chunk kernel (Pallas, TPU).

One light-sample chunk of ``direct_light`` (shading.py) — sphere-emitter
point sampling, the sphere/plane occlusion sweep, attenuation, diffuse and
Phong/Blinn specular, and the masked per-channel sample reduction
(render.c:170-229) — in a single Pallas kernel.  Everything between the
uniform draw and the (P,) channel sums stays in VMEM: the XLA path, even
after the optimization-barrier dedup (PERFORMANCE.md round 3), still
materializes the sampled directions, the occlusion mask and the shared
shade terms to HBM between fusions.

Scope (callers fall back to the jnp path otherwise, `eligible()`):
  * TPU target, no triangles, sphere emitter, no transparent material
    (opaque occlusion is a pure ``blocked`` bool — no kt tint product);
  * sample-chunk lc a multiple of 8 and a pixel count divisible by a
    lane-aligned block.

Differentiability: ``fused_chunk`` is a ``jax.custom_vjp`` whose forward
runs the kernel and whose backward differentiates the jnp reference
(`shading._sphere_chunk_math`) at the SAME pre-drawn uniforms — the
uniform draw is an explicit input precisely so the two passes see one
sample set.  The kernel and the reference compute the same f32 formulas;
they may differ by ulps (pow vs exp·log), which only perturbs the
linearization point of the VJP, not the estimand.

Gradient-correctness is pinned by tests/test_render.py's CPU grad gates
(CPU always takes the jnp path) and the TPU-gated parity test
(TestFusedShadow) comparing kernel vs reference forward on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PI2 = np.float32(2.0) * np.float32(3.1415927)
_BLOCKS = (2048, 1024, 512, 256, 128)

# packed scal_f layout: emitter [cx cy cz rad ir ig ib] + atten offset,
# then 5 floats per occluder sphere [cx cy cz r eps], then 5 per plane
# [nx ny nz d eps]
_EMIT_F = 8


def pick_block(n_pixels: int) -> int | None:
    for b in _BLOCKS:
        if n_pixels % b == 0:
            return b
    return None


def _kernel(ni_ref, scal_ref, u_ref, px_ref, out_ref, *,
            lc, ns_occ, npl, egid, phong, atten_kind):
    """One pixel-block: (lc, B) sample lanes against (1, B) pixel data."""
    ecx, ecy, ecz = scal_ref[0], scal_ref[1], scal_ref[2]
    erad = scal_ref[3]
    ir, ig, ib = scal_ref[4], scal_ref[5], scal_ref[6]
    off = scal_ref[7]
    n_valid = ni_ref[0]

    hx, hy, hz = px_ref[0:1, :], px_ref[1:2, :], px_ref[2:3, :]
    nx, ny, nz = px_ref[3:4, :], px_ref[4:5, :], px_ref[5:6, :]
    dx, dy, dz = px_ref[6:7, :], px_ref[7:8, :], px_ref[8:9, :]
    tr, tg, tb = px_ref[9:10, :], px_ref[10:11, :], px_ref[11:12, :]
    kr, kg, kb = px_ref[12:13, :], px_ref[13:14, :], px_ref[14:15, :]
    shin = px_ref[15:16, :]
    okf = px_ref[16:17, :]

    u0 = u_ref[0]                                   # (lc, B)
    u1 = u_ref[1]

    # sphere light point (object.c:293-304) — identical formula chain to
    # shading._sphere_light_point_from_u
    inclination = u0 * PI2
    azimuth = u1 * PI2
    si = jnp.sin(inclination)
    ci = jnp.cos(inclination)
    sa = jnp.sin(azimuth)
    ca = jnp.cos(azimuth)
    l0x = erad * ca * si
    l0y = erad * sa * si
    l0z = erad * ci
    twx, twy, twz = ecx - hx, ecy - hy, ecz - hz    # (1, B)
    flip = (twx * l0x + twy * l0y + twz * l0z) != 0.0
    l0x = jnp.where(flip, -l0x, l0x)
    l0y = jnp.where(flip, -l0y, l0y)
    l0z = jnp.where(flip, -l0z, l0z)
    lvx = l0x + ecx - hx
    lvy = l0y + ecy - hy
    lvz = l0z + ecz - hz
    m2 = lvx * lvx + lvy * lvy + lvz * lvz
    ok_m = m2 > 0
    ldist = jnp.where(ok_m, jnp.sqrt(jnp.where(ok_m, m2, 1.0)), 0.0)
    inv = 1.0 / jnp.where(ldist == 0.0, 1.0, ldist)
    lx, ly, lz = lvx * inv, lvy * inv, lvz * inv    # (lc, B)

    a = lx * nx + ly * ny + lz * nz

    # occlusion sweep, statically unrolled (any_hit_tint_soa semantics:
    # all opaque, exclude only the emitter; eps per prim)
    blocked = jnp.zeros(u0.shape, bool)
    for i in range(ns_occ):
        if i == egid:
            continue
        base = _EMIT_F + 5 * i
        cx_i, cy_i, cz_i = scal_ref[base], scal_ref[base + 1], \
            scal_ref[base + 2]
        r_i, eps_i = scal_ref[base + 3], scal_ref[base + 4]
        rx, ry, rz = hx - cx_i, hy - cy_i, hz - cz_i      # (1, B)
        b = -(lx * rx + ly * ry + lz * rz)                # (lc, B)
        cc = rx * rx + ry * ry + rz * rz - r_i * r_i
        det = b * b - cc
        okd = det > 0
        sq = jnp.where(okd, jnp.sqrt(jnp.where(okd, det, 1.0)), 0.0)
        t_near = b - sq
        t = jnp.where(t_near > eps_i, t_near, b + sq)
        hit = (det >= 0) & (t > eps_i)
        blocked = blocked | (hit & (t < ldist))
    for i in range(npl):
        base = _EMIT_F + 5 * ns_occ + 5 * i
        nx_i, ny_i, nz_i = scal_ref[base], scal_ref[base + 1], \
            scal_ref[base + 2]
        d_i, eps_i = scal_ref[base + 3], scal_ref[base + 4]
        ap = lx * nx_i + ly * ny_i + lz * nz_i            # (lc, B)
        parallel = jnp.abs(ap) < eps_i
        od = hx * nx_i + hy * ny_i + hz * nz_i            # (1, B)
        t = (d_i - od) / jnp.where(parallel, 1.0, ap)
        hit = ~parallel & (t > eps_i)
        blocked = blocked | (hit & (t < ldist))

    # attenuation (render.c:191-200)
    if atten_kind == "none":
        att = jnp.ones_like(ldist)
    elif atten_kind == "lin":
        att = 1.0 / (off + ldist)
    else:
        att = 1.0 / (off + ldist * ldist)
    in_r, in_g, in_b = ir * att, ig * att, ib * att

    cos_d = jnp.where(a > 0, a, 0.0)

    if phong:
        rfx = nx * (2.0 * a) - lx
        rfy = ny * (2.0 * a) - ly
        rfz = nz * (2.0 * a) - lz
        spec_mul = -(rfx * dx + rfy * dy + rfz * dz)
    else:
        hvx, hvy, hvz = dx - lx, dy - ly, dz - lz
        hm2 = hvx * hvx + hvy * hvy + hvz * hvz
        okh = hm2 > 0
        hm = jnp.where(okh, jnp.sqrt(jnp.where(okh, hm2, 1.0)), 0.0)
        ih = 1.0 / jnp.where(hm == 0.0, 1.0, hm)
        spec_mul = -(nx * hvx + ny * hvy + nz * hvz) * ih

    # fmax0_powf forward (cmath.py c_powf + fmaxf_zero semantics)
    bse = spec_mul
    is_zero = bse == 0.0
    safe = jnp.where(is_zero, 1.0, jnp.abs(bse))
    mag = jnp.exp(shin * jnp.log(safe))
    zero_val = jnp.where(shin > 0, 0.0,
                         jnp.where(shin == 0, 1.0, jnp.float32(jnp.inf)))
    mag = jnp.where(is_zero, zero_val, mag)
    is_int = shin == jnp.floor(shin)
    is_odd = jnp.mod(jnp.abs(shin), 2.0) == 1.0
    signed = jnp.where(is_odd, -mag, mag)
    negr = jnp.where(is_int, signed, jnp.float32(jnp.nan))
    pw = jnp.where(bse < 0, negr, mag)
    spec_p = jnp.where(pw > 0, pw, 0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, u0.shape, 0)
    ok = (okf > 0) & ~blocked & (lane < n_valid)
    okz = jnp.where(ok, 1.0, 0.0)
    out_ref[0, :] = jnp.sum(okz * (tr * in_r * cos_d + kr * in_r * spec_p),
                            axis=0)
    out_ref[1, :] = jnp.sum(okz * (tg * in_g * cos_d + kg * in_g * spec_p),
                            axis=0)
    out_ref[2, :] = jnp.sum(okz * (tb * in_b * cos_d + kb * in_b * spec_p),
                            axis=0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _run(n_valid, scal_f, u, px, lc, ns_occ, npl, egid, phong,
         atten_kind):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = px.shape[1]
    B = pick_block(P)
    kern = functools.partial(
        _kernel, lc=lc, ns_occ=ns_occ, npl=npl, egid=egid, phong=phong,
        atten_kind=atten_kind)
    out = pl.pallas_call(
        kern,
        grid=(P // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, lc, B), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((px.shape[0], B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, P), jnp.float32),
    )(n_valid, scal_f, u, px)
    return out


def make_fused_chunk(jnp_reference, lc, ns_occ, npl, egid, phong,
                     atten_kind):
    """Build the custom-vjp fused chunk op.

    ``jnp_reference(u, px, scal_f, n_valid) -> (3, P)`` is the pure-jnp
    math (shading._sphere_chunk_math packed form) differentiated in the
    backward pass; the Pallas kernel computes the forward value."""

    @jax.custom_vjp
    def fused(u, px, scal_f, n_valid):
        return _run(n_valid, scal_f, u, px, lc, ns_occ, npl, egid,
                    phong, atten_kind)

    def fwd(u, px, scal_f, n_valid):
        return fused(u, px, scal_f, n_valid), (u, px, scal_f, n_valid)

    def bwd(res, g):
        u, px, scal_f, n_valid = res
        _, vjp = jax.vjp(
            lambda U, PX, SC: jnp_reference(U, PX, SC, n_valid),
            u, px, scal_f)
        du, dpx, dsc = vjp(g)
        return du, dpx, dsc, None

    fused.defvjp(fwd, bwd)
    return fused
