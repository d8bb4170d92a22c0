"""Primitive intersection, fully batched.

The reference dispatches per-object through a vtable
(object.c:84-122) and recurses through a BVH; on TPU every ray-primitive
test is one lane of a vector program.  This module provides:

* ``DeviceScene`` — derived device arrays (triangle edges/normals computed
  from the differentiable vertices, per-primitive epsilon/material tables);
* ``closest_hit_soa`` — closest intersection over all primitives with the
  reference's exact accept rules (sphere: object.c:306-321; triangle
  Möller-Trumbore: object.c:422-441; plane: object.c:473-488), triangle
  chunked so (rays × triangles) intermediates stay memory-bounded;
* ``any_hit_tint_soa`` — shadow-ray query: opaque blockers block, transparent
  blockers tint the carried light by kt (accel.c:360-387, object.c:183-197);
* ``intersect_prim`` — single-primitive re-test for rays inside an object
  (render.c:143-144).

Gradients flow through distances and normals w.r.t. SceneParams; discrete
hit decisions are piecewise-constant (differentiable a.e.).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.core import vec
from c_raytracer_tpu.scene import types as T

FLT_MAX = jnp.float32(np.finfo(np.float32).max)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceScene:
    """Device-side SoA geometry + per-primitive attribute tables."""

    # spheres
    sph_center: jax.Array   # (Ns, 3)
    sph_radius: jax.Array   # (Ns,)
    sph_eps: jax.Array      # (Ns,)
    # triangles
    tri_v0: jax.Array       # (Nt, 3)
    tri_e1: jax.Array       # (Nt, 3)  B - A (object.c:331)
    tri_e2: jax.Array       # (Nt, 3)  C - A
    tri_n: jax.Array        # (Nt, 3)  normalized cross(e1, e2)
    tri_eps: jax.Array      # (Nt,)
    # planes
    pln_n: jax.Array        # (Np, 3)
    pln_d: jax.Array        # (Np,)
    pln_eps: jax.Array      # (Np,)
    # per-global-primitive tables
    mat_idx: jax.Array      # (N,) int32
    num_lights: jax.Array   # (N,) int32
    prim_eps: jax.Array     # (N,) per-primitive epsilon (gathered by gid)
    # per-material convenience (gathered at shade time)
    materials: T.Materials
    ambient: jax.Array      # (3,)


def device_scene(params: T.SceneParams, static: T.SceneStatic) -> DeviceScene:
    """Derive device arrays from the differentiable scene params."""
    # params are host-side NumPy until jit traces them; promote so eager
    # (un-jitted) use gets device arrays that traced indexing can consume
    params = jax.tree.map(jnp.asarray, params)
    ns, nt, npl = static.n_spheres, static.n_triangles, static.n_planes
    eps = jnp.asarray(np.asarray(static.epsilon, np.float32))
    v = params.tri_vertices
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = vec.cross(e1, e2)
    n = n / jnp.maximum(vec.mag(n), 1e-30)[..., None]
    return DeviceScene(
        sph_center=params.sphere_center,
        sph_radius=params.sphere_radius,
        sph_eps=eps[:ns],
        tri_v0=v[:, 0], tri_e1=e1, tri_e2=e2, tri_n=n,
        tri_eps=eps[ns:ns + nt],
        pln_n=params.plane_normal, pln_d=params.plane_d,
        pln_eps=eps[ns + nt:],
        mat_idx=jnp.asarray(np.asarray(static.material_index, np.int32)),
        num_lights=jnp.asarray(np.asarray(static.num_lights, np.int32)),
        prim_eps=eps,
        materials=params.materials,
        ambient=params.ambient,
    )


def _safe_sqrt(x):
    """sqrt(max(x, 0)) with clean gradients at/below zero.

    Double-where: without it a zero cotangent times d/dx sqrt(0) = inf
    yields NaN for every missed sphere lane."""
    ok = x > 0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), 0.0)


def sphere_intersect(o, d, center, radius, eps):
    """line_intersects_sphere (object.c:306-321), batched (R, Ns).

    Returns (t, hit).  Near positive root preferred, else far root; both
    must clear the per-sphere epsilon.
    """
    rel = o[..., None, :] - center  # (R, Ns, 3)
    b = -vec.dot(d[..., None, :], rel)
    c = vec.magsqr(rel) - radius * radius
    det = b * b - c
    sq = _safe_sqrt(det)
    t_near = b - sq
    t = jnp.where(t_near > eps, t_near, b + sq)
    hit = (det >= 0) & (t > eps)
    return t, hit


def sphere_normal(o, d, t, center, radius):
    """Outward normal at hit point (object.c:258-261); not flipped for
    inside hits."""
    p = o + d * t[..., None]
    return (p - center) / radius[..., None]


def triangle_intersect(o, d, v0, e1, e2, eps):
    """Möller-Trumbore (object.c:422-441), batched (R, Nt).

    Exact accept rules: |a| <= eps-interval rejects as parallel (strict
    ``a < eps && a > -eps``), u in [0,1], v >= 0, u+v <= 1, t > eps.
    """
    h = jnp.cross(d[..., None, :], e2)        # (R, Nt, 3)
    a = vec.dot(e1, h)
    parallel = (a < eps) & (a > -eps)
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = o[..., None, :] - v0
    u = f * vec.dot(s, h)
    q = jnp.cross(s, e1)
    v = f * vec.dot(d[..., None, :], q)
    t = f * vec.dot(e2, q)
    hit = (~parallel & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
           & (t > eps))
    return t, hit


def plane_intersect(o, d, n, dist, eps):
    """plane_get_intersection (object.c:473-488), batched (R, Np).

    Returns (t, hit, flip) where flip indicates the normal must be negated
    (ray hits the back side: ``signbit(a)`` false)."""
    a = vec.dot(d[..., None, :], n)
    parallel = jnp.abs(a) < eps
    t = (dist - vec.dot(o[..., None, :], n)) / jnp.where(parallel, 1.0, a)
    hit = ~parallel & (t > eps)
    flip = ~jnp.signbit(a)
    return t, hit, flip


def intersect_prim(ds: DeviceScene, o, d, gid):
    """Re-test a single primitive per ray (render.c:143-144, rays inside an
    object).  gid may be -1 (no inside object): returns miss.

    Returns (t, hit, normal)."""
    ns = ds.sph_center.shape[0]
    nt = ds.tri_v0.shape[0]
    npl = ds.pln_n.shape[0]

    g = jnp.maximum(gid, 0)
    zero_t = jnp.zeros(o.shape[:-1])
    zero_h = jnp.zeros(o.shape[:-1], bool)

    # sphere candidate (per-ray gathered params, same math as
    # sphere_intersect but without the primitive broadcast axis)
    if ns:
        si = jnp.clip(g, 0, ns - 1)
        center = ds.sph_center[si]
        radius = ds.sph_radius[si]
        eps = ds.sph_eps[si]
        rel = o - center
        b = -vec.dot(d, rel)
        c = vec.magsqr(rel) - radius * radius
        det = b * b - c
        sq = _safe_sqrt(det)
        t_near = b - sq
        st = jnp.where(t_near > eps, t_near, b + sq)
        sh = (det >= 0) & (st > eps)
        sn = sphere_normal(o, d, st, center, radius)
    else:
        st, sh, sn = zero_t, zero_h, jnp.zeros_like(o)

    # triangle candidate
    if nt:
        ti = jnp.clip(g - ns, 0, nt - 1)
        v0, e1, e2 = ds.tri_v0[ti], ds.tri_e1[ti], ds.tri_e2[ti]
        eps = ds.tri_eps[ti]
        h = jnp.cross(d, e2)
        a = vec.dot(e1, h)
        parallel = (a < eps) & (a > -eps)
        f = 1.0 / jnp.where(parallel, 1.0, a)
        s = o - v0
        u = f * vec.dot(s, h)
        q = jnp.cross(s, e1)
        v = f * vec.dot(d, q)
        tt = f * vec.dot(e2, q)
        th = (~parallel & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
              & (tt > eps))
        tn = ds.tri_n[ti]
    else:
        tt, th, tn = zero_t, zero_h, jnp.zeros_like(o)

    # plane candidate
    if npl:
        pi = jnp.clip(g - ns - nt, 0, npl - 1)
        n = ds.pln_n[pi]
        eps = ds.pln_eps[pi]
        a = vec.dot(d, n)
        parallel = jnp.abs(a) < eps
        pt = (ds.pln_d[pi] - vec.dot(o, n)) / jnp.where(parallel, 1.0, a)
        ph = ~parallel & (pt > eps)
        pn = jnp.where(jnp.signbit(a)[..., None], n, -n)
    else:
        pt, ph, pn = zero_t, zero_h, jnp.zeros_like(o)

    is_s = gid < ns
    is_t = (gid >= ns) & (gid < ns + nt)
    is_p = gid >= ns + nt
    t = jnp.where(is_s, st, jnp.where(is_t, tt, pt))
    hit = (gid >= 0) & jnp.where(is_s, sh, jnp.where(is_t, th, ph))
    n = jnp.where(is_s[..., None], sn,
                  jnp.where(is_t[..., None], tn, pn))
    return t, hit, n


# ===========================================================================
# SoA (structure-of-arrays) hot path
# ===========================================================================
#
# The AoS functions above keep the reference-shaped (..., 3) API for tests
# and cold paths; the renderer's hot loop uses these SoA versions instead:
# component arrays with the ray axis last-minor (dense (8, 128) tiles), the
# per-scene handful of spheres/planes statically UNROLLED (their centers/
# radii stay traced for gradients, but loop bounds, material ids and
# transparency flags become jit constants), and winner selection as running
# min-folds — no argmin / take_along_axis / gather anywhere (XLA lowers
# small gathers to kCustom fusions that dominated the profile: 3 gathers =
# 55% of a scene1 frame).

from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.core.v3 import V3


def _pad_np(x, mult, fill):
    """Pad a host array's leading axis to a multiple of ``mult``."""
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = np.concatenate([x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
    return x


def _sphere_test_soa(o: V3, d: V3, c: V3, radius, eps):
    """line_intersects_sphere (object.c:306-321) on component arrays.

    c/radius/eps are scalars (unrolled prim) or broadcastable arrays.
    Returns (t, hit) shaped like o.x."""
    rel = o - c
    b = -(v3m.dot(d, rel))
    cc = v3m.magsqr(rel) - radius * radius
    det = b * b - cc
    ok = det > 0
    sq = jnp.where(ok, jnp.sqrt(jnp.where(ok, det, 1.0)), 0.0)
    t_near = b - sq
    t = jnp.where(t_near > eps, t_near, b + sq)
    hit = (det >= 0) & (t > eps)
    return t, hit


def _plane_test_soa(o: V3, d: V3, n: V3, dist, eps):
    """plane_get_intersection (object.c:473-488).  Returns (t, hit, a)
    where sign of ``a = d·n`` decides the normal flip."""
    a = v3m.dot(d, n)
    parallel = jnp.abs(a) < eps
    t = (dist - v3m.dot(o, n)) / jnp.where(parallel, 1.0, a)
    hit = ~parallel & (t > eps)
    return t, hit, a


def _mt_test_soa(o: V3, d: V3, v0: V3, e1: V3, e2: V3, eps):
    """Möller-Trumbore (object.c:422-441) on component arrays."""
    h = v3m.cross(d, e2)
    a = v3m.dot(e1, h)
    parallel = (a < eps) & (a > -eps)
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = o - v0
    u = f * v3m.dot(s, h)
    q = v3m.cross(s, e1)
    v = f * v3m.dot(d, q)
    t = f * v3m.dot(e2, q)
    hit = (~parallel & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
           & (t > eps))
    return t, hit


def _tri_chunks_soa(ds: DeviceScene, static, chunk: int):
    """Split triangle arrays into scan-able (nchunks, C) components plus
    static per-chunk constants (eps, material id, validity)."""
    nt = ds.tri_v0.shape[0]
    C = min(chunk, max(8, -(-nt // 8) * 8))
    nchunks = -(-nt // C)
    pad = nchunks * C - nt

    def p(x, fill):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x

    comp = {}
    for name, arr in (("v0", ds.tri_v0), ("e1", ds.tri_e1),
                      ("e2", ds.tri_e2), ("n", ds.tri_n)):
        a = p(arr, 0.0)
        comp[name] = V3(a[:, 0].reshape(nchunks, C),
                        a[:, 1].reshape(nchunks, C),
                        a[:, 2].reshape(nchunks, C))
    ns = static.n_spheres
    # static constants: padded epsilon 1.0 makes degenerate rows miss
    eps_np = _pad_np(np.asarray(static.epsilon[ns:ns + nt], np.float32),
                     C, 1.0).reshape(nchunks, C)
    mat_np = _pad_np(
        np.asarray(static.material_index[ns:ns + nt], np.int32),
        C, 0).reshape(nchunks, C)
    valid_np = _pad_np(np.ones(nt, bool), C, False).reshape(nchunks, C)
    return comp, jnp.asarray(eps_np), mat_np, valid_np, nchunks, C


def closest_hit_soa(ds: DeviceScene, static, o: V3, d: V3, *,
                    tri_chunk: int = 512, include_triangles: bool = True):
    """Closest intersection over all primitives, SoA.

    o, d: V3 of (P,).  Returns (t, gid, mat, normal V3); t = FLT_MAX and
    gid = -1 (mat = 0) on miss.  Fold order matches the AoS version
    (planes, spheres, triangles; strictly-smaller t wins — accel.c:328),
    with the winner's material index carried through the fold so shading
    needs no per-ray gather."""
    P = o.x.shape
    bt = jnp.full(P, FLT_MAX)
    bg = jnp.full(P, -1, jnp.int32)
    bm = jnp.zeros(P, jnp.int32)
    bn = v3m.zeros(P)

    ns, nt = ds.sph_center.shape[0], ds.tri_v0.shape[0]
    npl = ds.pln_n.shape[0]

    for i in range(npl):
        n = v3m.splat(ds.pln_n[i])
        t, hit, a = _plane_test_soa(o, d, n, ds.pln_d[i], ds.pln_eps[i])
        t = jnp.where(hit, t, FLT_MAX)
        better = t < bt
        sgn = jnp.where(jnp.signbit(a), 1.0, -1.0)  # flip on back side
        bt = jnp.where(better, t, bt)
        bg = jnp.where(better, ns + nt + i, bg)
        bm = jnp.where(better, static.material_index[ns + nt + i], bm)
        bn = v3m.where(better, n * sgn, bn)

    for i in range(ns):
        c = v3m.splat(ds.sph_center[i])
        r = ds.sph_radius[i]
        t, hit = _sphere_test_soa(o, d, c, r, ds.sph_eps[i])
        t = jnp.where(hit, t, FLT_MAX)
        better = t < bt
        # outward normal at hit point (object.c:258-261); clamp miss-lane t
        tn = jnp.where(t < FLT_MAX, t, 1.0)
        nrm = (o + d * tn - c) * (1.0 / r)
        bt = jnp.where(better, t, bt)
        bg = jnp.where(better, i, bg)
        bm = jnp.where(better, static.material_index[i], bm)
        bn = v3m.where(better, nrm, bn)

    if nt and include_triangles:
        comp, eps_c, mat_np, valid_np, nchunks, C = _tri_chunks_soa(
            ds, static, tri_chunk)
        iota_c = jnp.arange(C, dtype=jnp.int32)[:, None]

        def body(best, args):
            bt, bg, bm, bn = best
            v0, e1, e2, nn, eps, mat_c, base = args
            t, hit = _mt_test_soa(
                o.map(lambda a: a[None]), d.map(lambda a: a[None]),
                v0.map(lambda a: a[:, None]), e1.map(lambda a: a[:, None]),
                e2.map(lambda a: a[:, None]), eps[:, None])    # (C, P)
            t = jnp.where(hit, t, FLT_MAX)
            tmin = t.min(axis=0)                               # (P,)
            # first-winner one-hot (ties are measure-zero; pick the first
            # like argmin does)
            win = (t == tmin[None]) & (t < FLT_MAX)
            first = win & (jnp.cumsum(win.astype(jnp.int32), axis=0) == 1)
            ff = first.astype(jnp.float32)
            gidw = jnp.sum(jnp.where(first, iota_c, 0), axis=0) + base
            matw = jnp.sum(jnp.where(first, mat_c[:, None], 0), axis=0)
            nw = V3(jnp.sum(ff * nn.x[:, None], axis=0),
                    jnp.sum(ff * nn.y[:, None], axis=0),
                    jnp.sum(ff * nn.z[:, None], axis=0))
            better = tmin < bt
            best = (jnp.where(better, tmin, bt),
                    jnp.where(better, gidw + ns, bg),
                    jnp.where(better, matw, bm),
                    v3m.where(better, nw, bn))
            return best, None

        xs = (comp["v0"], comp["e1"], comp["e2"], comp["n"], eps_c,
              jnp.asarray(mat_np),
              jnp.arange(nchunks, dtype=jnp.int32) * C)
        (bt, bg, bm, bn), _ = jax.lax.scan(body, (bt, bg, bm, bn), xs)

    return bt, bg, bm, bn


def any_hit_tint_soa(ds: DeviceScene, static, o: V3, d: V3, max_dist,
                     exclude_gid, *, tri_chunk: int = 512,
                     include_triangles: bool = True):
    """Shadow query (is_light_blocked, render.c:126-134), SoA.

    Opaque hits at t < max_dist block; transparent hits multiply the tint
    by their material kt (accel.c:369-374).  Per-primitive transparency is
    a jit constant (material_index and is_transparent are static), so the
    opaque/transparent split costs no runtime dispatch at all.

    Returns (blocked, tint V3), shapes of o.x."""
    P = jnp.shape(d.x)
    exclude_gid = jnp.asarray(exclude_gid, jnp.int32)
    blocked = jnp.zeros(P, bool)
    tint = v3m.ones(P)
    ns, nt = ds.sph_center.shape[0], ds.tri_v0.shape[0]
    npl = ds.pln_n.shape[0]

    def fold_one(t, hit, gid, mi):
        nonlocal blocked, tint
        in_range = hit & (t < max_dist) & (exclude_gid != gid)
        if static.is_transparent[mi]:
            kt = v3m.splat(ds.materials.kt[mi])
            tint = tint * v3m.where(in_range, kt, 1.0)
        else:
            blocked = blocked | in_range

    for i in range(npl):
        n = v3m.splat(ds.pln_n[i])
        t, hit, _ = _plane_test_soa(o, d, n, ds.pln_d[i], ds.pln_eps[i])
        fold_one(t, hit, ns + nt + i, static.material_index[ns + nt + i])

    for i in range(ns):
        c = v3m.splat(ds.sph_center[i])
        t, hit = _sphere_test_soa(o, d, c, ds.sph_radius[i], ds.sph_eps[i])
        fold_one(t, hit, i, static.material_index[i])

    if nt and include_triangles:
        comp, eps_c, mat_np, valid_np, nchunks, C = _tri_chunks_soa(
            ds, static, tri_chunk)
        transp_np = np.asarray(static.is_transparent, bool)[mat_np]
        transp_np &= valid_np                               # (nchunks, C)
        any_transp = bool(transp_np.any())
        if any_transp:
            # per-chunk kt rows: differentiable gather with static indices,
            # hoisted out of the scan.  NOT a one-hot matmul — the TPU MXU
            # truncates f32 operands to bfloat16 at default precision,
            # quantizing kt (see accel/traverse.pack_clusters)
            kt_chunks = ds.materials.kt[jnp.asarray(mat_np)]  # (nchunks,C,3)
        # rays may be multi-dim (e.g. (lc, P)); the chunk axis C leads
        cdim = (C,) + (1,) * len(P)
        iota_c = jnp.arange(C, dtype=jnp.int32).reshape(cdim)

        def body(acc, args):
            blocked, tint = acc
            if any_transp:
                v0, e1, e2, eps, transp, ktc, base = args
            else:
                v0, e1, e2, eps, base = args
            ex = lambda a: a.reshape(cdim)                 # noqa: E731
            t, hit = _mt_test_soa(
                o.map(lambda a: a[None]), d.map(lambda a: a[None]),
                v0.map(ex), e1.map(ex), e2.map(ex), ex(eps))   # (C, *P)
            gid = base + iota_c + ns
            in_range = (hit & (t < max_dist[None])
                        & (exclude_gid[None] != gid))
            if not any_transp:
                # no transparent triangle anywhere: single any()-reduce,
                # no material data touched
                return (blocked | jnp.any(in_range, axis=0), tint), None
            blocked = blocked | jnp.any(in_range & ~ex(transp), axis=0)
            tr = in_range & ex(transp)
            tint = V3(
                tint.x * jnp.prod(jnp.where(tr, ex(ktc[:, 0]), 1.0), axis=0),
                tint.y * jnp.prod(jnp.where(tr, ex(ktc[:, 1]), 1.0), axis=0),
                tint.z * jnp.prod(jnp.where(tr, ex(ktc[:, 2]), 1.0), axis=0))
            return (blocked, tint), None

        xs = (comp["v0"], comp["e1"], comp["e2"], eps_c)
        if any_transp:
            xs += (jnp.asarray(transp_np), kt_chunks)
        xs += (jnp.arange(nchunks, dtype=jnp.int32) * C,)
        (blocked, tint), _ = jax.lax.scan(body, (blocked, tint), xs)

    return blocked, tint


def intersect_prim_soa(ds: DeviceScene, o: V3, d: V3, gid):
    """SoA wrapper for the inside-object re-test (stack mode only; the
    per-ray parameter gathers are unavoidable there and the path is cold).
    Returns (t, hit, normal V3)."""
    from c_raytracer_tpu.core.v3 import from_aos, to_aos
    t, hit, n = intersect_prim(ds, to_aos(o), to_aos(d), gid)
    return t, hit, from_aos(n)
