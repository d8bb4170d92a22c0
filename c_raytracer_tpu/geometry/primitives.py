"""Primitive intersection, fully batched.

The reference dispatches per-object through a vtable
(object.c:84-122) and recurses through a BVH; on TPU every ray-primitive
test is one lane of a vector program.  This module provides:

* ``DeviceScene`` — derived device arrays (triangle edges/normals computed
  from the differentiable vertices, per-primitive epsilon/material tables);
* ``closest_hit`` — closest intersection over all primitives with the
  reference's exact accept rules (sphere: object.c:306-321; triangle
  Möller-Trumbore: object.c:422-441; plane: object.c:473-488), primitive
  chunked so (rays × triangles) intermediates stay memory-bounded;
* ``any_hit_tint`` — shadow-ray query: opaque blockers block, transparent
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


def _chunked_min_triangles(ds: DeviceScene, o, d, best, chunk: int):
    """Scan over triangle chunks carrying (best_t, best_gid, best_normal)."""
    nt = ds.tri_v0.shape[0]
    if nt == 0:
        return best
    nchunks = -(-nt // chunk)
    pad = nchunks * chunk - nt
    def padded(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) if pad else x
    v0 = padded(ds.tri_v0, 0.0).reshape(nchunks, chunk, 3)
    e1 = padded(ds.tri_e1, 0.0).reshape(nchunks, chunk, 3)
    e2 = padded(ds.tri_e2, 0.0).reshape(nchunks, chunk, 3)
    nn = padded(ds.tri_n, 0.0).reshape(nchunks, chunk, 3)
    # padded epsilon 1.0 makes degenerate (a==0) rows parallel -> miss
    ep = padded(ds.tri_eps, 1.0).reshape(nchunks, chunk)
    gid0 = jnp.int32(ds.sph_center.shape[0])

    def body(best, args):
        v0c, e1c, e2c, nnc, epc, base = args
        t, hit = triangle_intersect(o, d, v0c, e1c, e2c, epc)
        t = jnp.where(hit, t, FLT_MAX)
        i = jnp.argmin(t, axis=-1)                      # (R,)
        tmin = jnp.take_along_axis(t, i[..., None], -1)[..., 0]
        nrm = nnc[i]                                    # (R, 3)
        bt, bg, bn = best
        better = tmin < bt
        best = (
            jnp.where(better, tmin, bt),
            jnp.where(better, base + i.astype(jnp.int32) + gid0, bg),
            jnp.where(better[..., None], nrm, bn),
        )
        return best, None

    bases = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    best, _ = jax.lax.scan(
        body, best, (v0, e1, e2, nn, ep, bases))
    return best


def closest_hit(ds: DeviceScene, o, d, *, tri_chunk: int = 4096,
                include_triangles: bool = True):
    """Closest intersection over all primitives.

    Returns (t, gid, normal): t = FLT_MAX and gid = -1 on miss.  Planes are
    tested first (render.c:118-124 tests unbound objects before the BVH),
    then spheres, then triangles; later tests win only with strictly
    smaller t (accel.c:328).  ``include_triangles=False`` returns the
    sphere/plane pre-pass only (the cluster traversal in accel/ folds the
    triangles instead).
    """
    R = o.shape[:-1]
    best_t = jnp.full(R, FLT_MAX)
    best_gid = jnp.full(R, -1, jnp.int32)
    best_n = jnp.zeros(R + (3,))

    ns = ds.sph_center.shape[0]
    nt = ds.tri_v0.shape[0]

    if ds.pln_n.shape[0]:
        t, hit, flip = plane_intersect(o, d, ds.pln_n, ds.pln_d, ds.pln_eps)
        t = jnp.where(hit, t, FLT_MAX)
        i = jnp.argmin(t, axis=-1)
        tmin = jnp.take_along_axis(t, i[..., None], -1)[..., 0]
        n = ds.pln_n[i]
        flip_sel = jnp.take_along_axis(flip, i[..., None], -1)[..., 0]
        n = jnp.where(flip_sel[..., None], -n, n)
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_gid = jnp.where(better, (ns + nt) + i.astype(jnp.int32), best_gid)
        best_n = jnp.where(better[..., None], n, best_n)

    if ns:
        t, hit = sphere_intersect(
            o, d, ds.sph_center, ds.sph_radius, ds.sph_eps)
        t = jnp.where(hit, t, FLT_MAX)
        i = jnp.argmin(t, axis=-1)
        tmin = jnp.take_along_axis(t, i[..., None], -1)[..., 0]
        # clamp miss-lane t for the normal: inf hit points poison grads
        t_n = jnp.where(tmin < FLT_MAX, tmin, 1.0)
        n = sphere_normal(o, d, t_n, ds.sph_center[i], ds.sph_radius[i])
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_gid = jnp.where(better, i.astype(jnp.int32), best_gid)
        best_n = jnp.where(better[..., None], n, best_n)

    if include_triangles:
        best_t, best_gid, best_n = _chunked_min_triangles(
            ds, o, d, (best_t, best_gid, best_n), tri_chunk)
    return best_t, best_gid, best_n


def any_hit_tint(ds: DeviceScene, transparent_mask, kt_by_mat,
                 o, d, max_dist, exclude_gid, *, tri_chunk: int = 4096,
                 include_triangles: bool = True):
    """Shadow query (is_light_blocked, render.c:126-134).

    Any opaque primitive with a hit at t < max_dist blocks; transparent
    hits multiply the carried tint by their material kt (accel.c:369-374).
    ``exclude_gid`` is the emitter (accel.c:367); the shaded object itself
    is NOT excluded (only its epsilon offsets the origin).

    Returns (blocked, tint): blocked (R,) bool, tint (R,3).
    transparent_mask: (M,) bool per material; kt_by_mat: (M,3).
    """
    R = o.shape[:-1]
    blocked = jnp.zeros(R, bool)
    tint = jnp.ones(R + (3,))
    ns = ds.sph_center.shape[0]
    nt = ds.tri_v0.shape[0]

    def fold(t, hit, gids):
        """Accumulate one primitive-batch of (R, K) results."""
        nonlocal blocked, tint
        mat = ds.mat_idx[gids]                       # (K,) or (R, K)
        in_range = hit & (t < max_dist[..., None]) \
            & (gids != exclude_gid[..., None])
        transp = transparent_mask[mat]
        blocked = blocked | jnp.any(in_range & ~transp, axis=-1)
        # product of kt over transparent blockers
        kts = jnp.where((in_range & transp)[..., None],
                        kt_by_mat[mat], 1.0)        # (R, K, 3)
        tint = tint * jnp.prod(kts, axis=-2)

    if ds.pln_n.shape[0]:
        t, hit, _ = plane_intersect(o, d, ds.pln_n, ds.pln_d, ds.pln_eps)
        fold(t, hit, ns + nt + jnp.arange(ds.pln_n.shape[0], dtype=jnp.int32))
    if ns:
        t, hit = sphere_intersect(
            o, d, ds.sph_center, ds.sph_radius, ds.sph_eps)
        fold(t, hit, jnp.arange(ns, dtype=jnp.int32))
    if nt and include_triangles:
        nchunks = -(-nt // tri_chunk)
        pad = nchunks * tri_chunk - nt
        def padded(x, fill):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) \
                if pad else x
        v0 = padded(ds.tri_v0, 0.0).reshape(nchunks, tri_chunk, 3)
        e1 = padded(ds.tri_e1, 0.0).reshape(nchunks, tri_chunk, 3)
        e2 = padded(ds.tri_e2, 0.0).reshape(nchunks, tri_chunk, 3)
        ep = padded(ds.tri_eps, 1.0).reshape(nchunks, tri_chunk)

        def body(carry, args):
            blocked, tint = carry
            v0c, e1c, e2c, epc, base = args
            t, hit = triangle_intersect(o, d, v0c, e1c, e2c, epc)
            gids = base + jnp.arange(tri_chunk, dtype=jnp.int32) + ns
            mat = ds.mat_idx[jnp.minimum(gids, ds.mat_idx.shape[0] - 1)]
            valid = (gids < ns + nt)
            in_range = hit & (t < max_dist[..., None]) \
                & (gids != exclude_gid[..., None]) & valid
            transp = transparent_mask[mat]
            blocked = blocked | jnp.any(in_range & ~transp, axis=-1)
            ktv = jnp.where((in_range & transp)[..., None],
                            kt_by_mat[mat], 1.0)
            tint = tint * jnp.prod(ktv, axis=-2)
            return (blocked, tint), None

        bases = jnp.arange(nchunks, dtype=jnp.int32) * tri_chunk
        (blocked, tint), _ = jax.lax.scan(
            body, (blocked, tint), (v0, e1, e2, ep, bases))
    return blocked, tint


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
