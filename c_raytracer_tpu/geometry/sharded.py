"""Primitive-range sharding: triangle arrays split over a mesh axis.

SURVEY.md §2.5 row 3 — the TP/EP analogue of the reference's shared
in-process scene (object.c:124-131): at dragon scale the triangle arrays
are sharded across devices instead of replicated.  Each shard folds its
own triangle range (closest hit: running min over t; shadows: blocked-OR
and kt tint product, accel.c:322-387) and the per-shard results combine
with cross-device reductions:

* closest hit — global min over t, ties broken toward the lowest global
  primitive id (the reference's strictly-smaller-t fold order,
  accel.c:328); the winner's material id / normal come from the one owner
  shard via a masked sum (a psum under SPMD);
* shadows — ``blocked`` is an any-reduce; the transparent kt tint is an
  ordered product over shards (accel.c:369-374).

Everything is expressed with stacked ``(n_shards, m, ...)`` arrays; an
optional ``NamedSharding`` over the leading axis lets XLA's auto-SPMD
partitioner place each shard's fold on its device and insert the
all-reduces (the scaling-book recipe: annotate shardings, let XLA insert
collectives).  With no sharding the same code runs stacked on one device —
tests use that for equality against the replicated fold.

Exactness vs the replicated fold (tests/test_parallel.py):

* closest hit is bit-exact — same t values, and the min-gid tie-break
  reproduces the replicated "first strictly-smaller t wins" order;
* ``blocked`` is bit-exact (boolean OR);
* the kt tint is bit-exact whenever at most one shard carries non-unit
  factors for a ray (multiplying by exact 1.0 is the identity); with
  transparent blockers spread across shards the product regroups at shard
  boundaries (float multiply is not associative) and matches to ~1 ulp.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.core.v3 import V3
from c_raytracer_tpu.geometry import primitives as G

INT32_MAX = np.int32(np.iinfo(np.int32).max)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriShards:
    """Triangle arrays stacked (n_shards, m) with per-shard constants.

    Device fields are differentiable views of DeviceScene's triangle
    arrays; pad rows carry epsilon 1.0 so they can never pass the
    Möller-Trumbore parallel test (|a| < eps with a unit-scale a) and
    gid -1 so they never win a fold."""

    v0: V3                    # components (n_shards, m)
    e1: V3
    e2: V3
    n: V3
    eps: jax.Array            # (n_shards, m) f32
    mat: jax.Array            # (n_shards, m) int32
    gid: jax.Array            # (n_shards, m) int32 GLOBAL prim id (pad: -1)
    kt: jax.Array | None      # (n_shards, m, 3) per-triangle kt rows
    transp: jax.Array | None  # (n_shards, m) bool
    chunk: int = dataclasses.field(metadata=dict(static=True), default=8)
    # the NamedSharding placing the shard axis (hashable jit-constant);
    # re-applied by downstream re-packers (accel/traverse.py
    # pack_clusters_sharded) so derived stacked arrays stay on their
    # owner devices
    sharding: object | None = dataclasses.field(
        metadata=dict(static=True), default=None)


def shard_triangles(ds: G.DeviceScene, static, n_shards: int, *,
                    tri_chunk: int = 2048, sharding=None) -> TriShards:
    """Split the triangle arrays into ``n_shards`` contiguous ranges.

    ``sharding`` (a NamedSharding whose spec names the shard axis first,
    e.g. ``NamedSharding(mesh, P("pr"))``) is applied to every stacked
    array; None keeps the stacked arrays unconstrained (single-device
    tests, or meshes without a pr axis).  ``tri_chunk`` is the TOTAL
    triangles streamed per scan step across all shards (matches the
    replicated fold's memory at C = tri_chunk / n_shards per shard).
    """
    nt = ds.tri_v0.shape[0]
    ns = static.n_spheres
    # per-shard chunk, sublane-aligned; shard length a whole multiple of it
    C = max(8, -(-min(tri_chunk // n_shards, -(-nt // n_shards)) // 8) * 8)
    m = -(-max(-(-nt // n_shards), 1) // C) * C
    pad = n_shards * m - nt

    def phost(x, fill):
        x = np.asarray(x)
        if pad:
            x = np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x.reshape((n_shards, m) + x.shape[1:])

    def pdev(x, fill):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x.reshape((n_shards, m) + x.shape[1:])

    eps_np = phost(np.asarray(static.epsilon[ns:ns + nt], np.float32), 1.0)
    mat_np = phost(np.asarray(static.material_index[ns:ns + nt], np.int32),
                   0)
    gid_np = phost(np.arange(ns, ns + nt, dtype=np.int32), -1)
    transp_np = np.asarray(static.is_transparent, bool)[mat_np]
    transp_np &= gid_np >= 0
    any_transp = bool(transp_np.any())

    con = (lambda a: jax.lax.with_sharding_constraint(a, sharding)
           ) if sharding is not None else (lambda a: a)

    def pv3(x):
        a = pdev(x, 0.0)
        return V3(con(a[..., 0]), con(a[..., 1]), con(a[..., 2]))

    kt = None
    transp = None
    if any_transp:
        # static-index gather of per-triangle kt rows (differentiable wrt
        # materials; NOT a one-hot matmul — the MXU would truncate kt to
        # bfloat16, see accel/traverse.pack_clusters)
        kt = con(ds.materials.kt[jnp.asarray(mat_np)])   # (S, m, 3)
        transp = con(jnp.asarray(transp_np))

    return TriShards(
        v0=pv3(ds.tri_v0), e1=pv3(ds.tri_e1), e2=pv3(ds.tri_e2),
        n=pv3(ds.tri_n),
        eps=con(jnp.asarray(eps_np)), mat=con(jnp.asarray(mat_np)),
        gid=con(jnp.asarray(gid_np)), kt=kt, transp=transp, chunk=C,
        sharding=sharding)


def _scan_chunks(sh: TriShards, fields):
    """Reshape stacked (S, m, ...) arrays to (nchunks, S, C, ...) scan xs.

    The swapaxes keeps the shard axis in every scan slice so an axis-0
    sharding constraint on the stacked arrays propagates into the fold
    (each device streams only its own triangle range)."""
    S, m = sh.eps.shape
    nchunks = m // sh.chunk

    def r(a):
        a = a.reshape((S, nchunks, sh.chunk) + a.shape[2:])
        return jnp.swapaxes(a, 0, 1)

    return tuple(x.map(r) if isinstance(x, V3) else r(x) for x in fields), \
        nchunks


def closest_hit_sharded(ds: G.DeviceScene, static, sh: TriShards,
                        o: V3, d: V3):
    """Closest hit over the whole scene with pr-sharded triangles.

    Spheres/planes (a handful; outside the BVH in the reference too,
    object.h:84) fold replicated; the per-shard triangle folds combine by
    global min-t with min-gid tie-break, then challenge the sphere/plane
    best with the replicated fold's strictly-smaller rule (accel.c:328).
    Returns (t, gid, mat, normal V3) exactly like closest_hit_soa."""
    bt, bg, bm, bn = G.closest_hit_soa(ds, static, o, d,
                                       include_triangles=False)
    P = jnp.shape(o.x)
    S = sh.eps.shape[0]
    xs, _ = _scan_chunks(sh, (sh.v0, sh.e1, sh.e2, sh.n, sh.eps, sh.mat,
                              sh.gid))

    # per-shard carries (S, *P)
    ts0 = jnp.full((S,) + P, G.FLT_MAX)
    gs0 = jnp.full((S,) + P, INT32_MAX, jnp.int32)
    ms0 = jnp.zeros((S,) + P, jnp.int32)
    nv0 = v3m.zeros((S,) + P)

    cdim = (S, sh.chunk) + (1,) * len(P)

    def body(best, args):
        ts, gs, ms, nv = best
        v0, e1, e2, nn, eps, mat_c, gid_c = args      # (S, C) comps
        ex = lambda a: a.reshape(cdim)                 # noqa: E731
        t, hit = G._mt_test_soa(
            o.map(lambda a: a[None, None]), d.map(lambda a: a[None, None]),
            v0.map(ex), e1.map(ex), e2.map(ex), ex(eps))   # (S, C, *P)
        t = jnp.where(hit, t, G.FLT_MAX)
        tmin = t.min(axis=1)                               # (S, *P)
        # first winner within the chunk = lowest gid (gids ascend in-shard)
        win = (t == tmin[:, None]) & (t < G.FLT_MAX)
        first = win & (jnp.cumsum(win.astype(jnp.int32), axis=1) == 1)
        ff = first.astype(jnp.float32)
        gidw = jnp.sum(jnp.where(first, ex(gid_c), 0), axis=1)
        matw = jnp.sum(jnp.where(first, ex(mat_c), 0), axis=1)
        nw = V3(jnp.sum(ff * ex(nn.x), axis=1),
                jnp.sum(ff * ex(nn.y), axis=1),
                jnp.sum(ff * ex(nn.z), axis=1))
        better = tmin < ts                                 # strictly smaller
        return (jnp.where(better, tmin, ts),
                jnp.where(better, gidw, gs),
                jnp.where(better, matw, ms),
                v3m.where(better, nw, nv)), None

    (ts, gs, ms, nv), _ = jax.lax.scan(body, (ts0, gs0, ms0, nv0), xs)

    # cross-shard reduce: min t, then min gid among the t-winners (lowest
    # global id = the replicated fold's first-strictly-smaller winner);
    # the masked sums pick the single owner shard (psum over pr under SPMD)
    tm = ts.min(axis=0)                                    # (*P,)
    gcand = jnp.where(ts == tm[None], gs, INT32_MAX)
    gm = gcand.min(axis=0)
    win = (ts == tm[None]) & (gs == gm[None]) & (tm < G.FLT_MAX)[None]
    matw = jnp.sum(jnp.where(win, ms, 0), axis=0)
    wf = win.astype(jnp.float32)
    nw = V3(jnp.sum(wf * nv.x, axis=0), jnp.sum(wf * nv.y, axis=0),
            jnp.sum(wf * nv.z, axis=0))
    better = tm < bt                                       # tris fold last
    return (jnp.where(better, tm, bt),
            jnp.where(better, gm, bg),
            jnp.where(better, matw, bm),
            v3m.where(better, nw, bn))


def intersect_prim_sharded(ds: G.DeviceScene, static, sh: TriShards,
                           o: V3, d: V3, gid):
    """Inside-object re-test (render.c:143-144) with pr-sharded triangles.

    The replicated re-test (primitives.intersect_prim) gathers per-ray
    triangle parameters from the FULL triangle arrays — the one consumer
    that would keep a replicated copy of the geometry live on every device
    of a pr mesh.  Here each shard gathers only from its own (m,) slice
    (rays whose gid falls outside the shard read a clipped dummy row and
    are masked), and the single owner shard's result is selected by a
    masked sum over the shard axis — a psum over ``pr`` under SPMD.

    Spheres/planes stay replicated (a handful; outside the BVH in the
    reference too, object.h:84).  Returns (t, hit, normal V3) exactly like
    intersect_prim_soa."""
    ns, nt = static.n_spheres, static.n_triangles
    S, m = sh.eps.shape
    P = jnp.shape(o.x)
    g = jnp.maximum(gid, 0)
    zero_t = jnp.zeros(P, jnp.float32)
    zero_h = jnp.zeros(P, bool)
    zero_v = v3m.zeros(P)

    # triangle candidate: per-shard local gather + ownership mask
    if nt:
        li = g - ns                                     # global tri index

        def shard_test(k, v0, e1, e2, nrm, eps):
            lo = k * m
            owner = (li >= lo) & (li < lo + m)
            lidx = jnp.clip(li - lo, 0, m - 1)
            take = lambda comp: comp[lidx]              # noqa: E731
            t, hit = G._mt_test_soa(o, d, v0.map(take), e1.map(take),
                                    e2.map(take), eps[lidx])
            return t, hit & owner, nrm.map(take), owner

        ts, hs, nv, ow = jax.vmap(shard_test)(
            jnp.arange(S), sh.v0, sh.e1, sh.e2, sh.n, sh.eps)  # (S, *P)
        # owner-masked where, NOT ts * owner_float: a non-finite t on a
        # non-owner lane (Möller-Trumbore's f=1/a can overflow for
        # near-parallel rays) would make inf*0 = NaN poison the sum,
        # whereas the replicated path only ever reads the gid-owner row
        tt = jnp.sum(jnp.where(ow, ts, 0.0), axis=0)
        th = jnp.any(hs, axis=0)
        tn = V3(jnp.sum(jnp.where(ow, nv.x, 0.0), axis=0),
                jnp.sum(jnp.where(ow, nv.y, 0.0), axis=0),
                jnp.sum(jnp.where(ow, nv.z, 0.0), axis=0))
    else:
        tt, th, tn = zero_t, zero_h, zero_v

    # sphere candidate (tiny replicated table, per-ray gather)
    if ns:
        si = jnp.clip(g, 0, ns - 1)
        c = V3(ds.sph_center[si, 0], ds.sph_center[si, 1],
               ds.sph_center[si, 2])
        radius = ds.sph_radius[si]
        st, shit = G._sphere_test_soa(o, d, c, radius, ds.sph_eps[si])
        stc = jnp.where(st < G.FLT_MAX, st, 1.0)
        sn = (o + d * stc - c) * (1.0 / radius)
    else:
        st, shit, sn = zero_t, zero_h, zero_v

    # plane candidate
    npl = static.n_planes
    if npl:
        pi = jnp.clip(g - ns - nt, 0, npl - 1)
        n = V3(ds.pln_n[pi, 0], ds.pln_n[pi, 1], ds.pln_n[pi, 2])
        pt, phit, a = G._plane_test_soa(o, d, n, ds.pln_d[pi],
                                        ds.pln_eps[pi])
        pn = v3m.where(jnp.signbit(a), n, -n)
    else:
        pt, phit, pn = zero_t, zero_h, zero_v

    is_s = gid < ns
    is_t = (gid >= ns) & (gid < ns + nt)
    t = jnp.where(is_s, st, jnp.where(is_t, tt, pt))
    hit = (gid >= 0) & jnp.where(is_s, shit, jnp.where(is_t, th, phit))
    nrm = v3m.where(is_s, sn, v3m.where(is_t, tn, pn))
    return t, hit, nrm


def any_hit_tint_sharded(ds: G.DeviceScene, static, sh: TriShards,
                         o: V3, d: V3, max_dist, exclude_gid):
    """Shadow query with pr-sharded triangles (is_light_blocked,
    render.c:126-134).  Same contract as any_hit_tint_soa: returns
    (blocked, tint V3) shaped like d components."""
    blocked, tint = G.any_hit_tint_soa(ds, static, o, d, max_dist,
                                       exclude_gid,
                                       include_triangles=False)
    P = jnp.shape(d.x)
    S = sh.eps.shape[0]
    any_transp = sh.kt is not None
    fields = (sh.v0, sh.e1, sh.e2, sh.eps, sh.gid)
    if any_transp:
        fields += (sh.transp, sh.kt)
    xs, _ = _scan_chunks(sh, fields)

    # rays may be multi-dim with broadcast-shaped origins (e.g. origin
    # (1, P) vs dirs (lc, P)); two added leading axes align everything
    # against the (S, C, ...) triangle blocks by trailing-dim broadcast
    cdim = (S, sh.chunk) + (1,) * len(P)
    exclude_gid = jnp.asarray(exclude_gid, jnp.int32)
    max_dist = jnp.asarray(max_dist)

    blk0 = jnp.zeros((S,) + P, bool)
    tnt0 = v3m.ones((S,) + P) if any_transp else None

    def body(acc, args):
        blk, tnt = acc
        if any_transp:
            v0, e1, e2, eps, gid_c, transp, ktc = args
        else:
            v0, e1, e2, eps, gid_c = args
        ex = lambda a: a.reshape(cdim)                 # noqa: E731
        t, hit = G._mt_test_soa(
            o.map(lambda a: a[None, None]), d.map(lambda a: a[None, None]),
            v0.map(ex), e1.map(ex), e2.map(ex), ex(eps))   # (S, C, *P)
        in_range = (hit & (t < max_dist[None, None])
                    & (exclude_gid[None, None] != ex(gid_c)))
        if not any_transp:
            return (blk | jnp.any(in_range, axis=1), tnt), None
        transp_c = ex(transp)
        blk = blk | jnp.any(in_range & ~transp_c, axis=1)
        tr = in_range & transp_c
        ktx = ktc[..., 0].reshape(cdim)
        kty = ktc[..., 1].reshape(cdim)
        ktz = ktc[..., 2].reshape(cdim)
        tnt = V3(tnt.x * jnp.prod(jnp.where(tr, ktx, 1.0), axis=1),
                 tnt.y * jnp.prod(jnp.where(tr, kty, 1.0), axis=1),
                 tnt.z * jnp.prod(jnp.where(tr, ktz, 1.0), axis=1))
        return (blk, tnt), None

    (blk, tnt), _ = jax.lax.scan(body, (blk0, tnt0), xs)
    blocked = blocked | jnp.any(blk, axis=0)
    if any_transp:
        # ordered left-fold over the (static, small) shard count: rays
        # whose non-unit factors sit in one shard stay bit-exact vs the
        # replicated chunk fold; others regroup (~1 ulp)
        for k in range(S):
            tint = tint * V3(tnt.x[k], tnt.y[k], tnt.z[k])
    return blocked, tint
