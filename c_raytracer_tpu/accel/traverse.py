"""Device-side acceleration traversal: sorted, vectorized cluster sweeps.

The reference traverses a binary LBVH recursively per ray with
nearer-child-first pruning (accel.c:322-353) and an any-hit early-exit
shadow walk (accel.c:360-387).  Per-ray pointer chasing is the wrong shape
for a vector machine, so the TPU-native structure replaces the tree with
**clusters**: Morton-ordered triangles grouped into fixed blocks of C
(build.py), each with an AABB re-fit on device from the differentiable
vertices.  Traversal per wavefront:

1. slab-test every ray against every cluster AABB — one dense (R, K)
   vectorized test (the reference's bounding_cuboid_intersects,
   accel.c:111-158, with the same per-node epsilon inflation);
2. sort each ray's overlapped clusters by entry distance and keep the
   nearest V (``lax.top_k`` — the "sorted node-batch" sweep);
3. ``lax.scan`` over the V visit slots: gather the cluster's packed
   triangle block and run Möller-Trumbore on all C lanes, carrying the
   running best hit (closest) or the blocked/kt-tint accumulators (shadow).

Everything is fixed-shape and branch-free; hit *selection* is wrapped in
stop_gradient while hit distances/normals stay differentiable w.r.t. the
vertices (the same contract as the brute-force path in
geometry/primitives.py).

Exactness: a ray that overlaps more than V clusters may miss a hit in the
(V+1)-th-nearest one.  V defaults high enough that reference scenes are
exact (tests/test_accel.py pins brute-force equality); raise
``RenderConfig.bvh_visits`` for adversarial geometry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.core import remat as remat_mod

FLT_MAX = jnp.float32(np.finfo(np.float32).max)

# packed field rows in ClusterSet.blk: v0, e1, e2, n (3 each), eps; scenes
# with transparent materials append kt (3) and a 0/1 transparency flag so
# shadow sweeps gather ONE block instead of block + two material gathers
_F_V0, _F_E1, _F_E2, _F_N, _F_EPS, _F_KT, _F_TRANSP = 0, 3, 6, 9, 12, 13, 16
_NF_OPAQUE = 13
_NF_TRANSP = 17


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterSet:
    """Morton-ordered triangle clusters, packed for per-ray block gathers."""

    blk: jax.Array      # (K, 13|17, C) float32 packed triangle fields
    lo: jax.Array       # (K, 3) cluster AABB min, inflated by eps
    hi: jax.Array       # (K, 3) cluster AABB max, inflated by eps
    gid0: jax.Array     # () int32 global prim id of triangle 0 (= n_spheres)
    flat: jax.Array     # (K·C, 13|17) the same fields, triangle-major —
    #                     shortlist gathers pull per-triangle rows
    bound: jax.Array    # (K, C, 4) per-triangle bounding sphere (centroid,
    #                     radius; padding lanes get radius -1) for
    #                     segment-capsule scoring; selection-only (no grads)

    @property
    def has_transp(self) -> bool:
        """Static: whether kt/transp rows are packed (shape-derived).

        Uses the second-to-last axis so it also works on a pr-stacked set
        whose ``blk`` carries a leading shard axis (S, K, F, C)."""
        return self.blk.shape[-2] == _NF_TRANSP


def _pack_from_arrays(v0, e1, e2, n, eps, valid, kt, transp, C: int):
    """Packing core shared by the replicated and pr-sharded builds.

    v0/e1/e2/n: (M, 3); eps/valid: (M,); kt: (M, 3) | None; transp: (M,)
    bool | None.  Rows where ``valid`` is False are dead padding (their
    eps is forced to 1 so Möller-Trumbore's parallel test rejects them and
    their bounding radius to -1 so no capsule overlaps them).  Pads to a
    whole number of clusters of C.  Returns (blk, lo, hi, flat, bound) —
    vmappable over a leading shard axis."""
    M = v0.shape[0]
    K = max(1, -(-M // C))
    pad = K * C - M

    def p(x, fill):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x

    v0, e1, e2, n = p(v0, 0.0), p(e1, 0.0), p(e2, 0.0), p(n, 0.0)
    eps = jnp.where(p(valid, False), p(eps, 1.0), 1.0)
    valid = p(valid, False)

    rows = [v0, e1, e2, n, eps[:, None]]
    nfields = _NF_OPAQUE
    if kt is not None:
        tf = jnp.where(valid, p(transp, False), False)
        rows += [p(kt, 0.0), tf.astype(jnp.float32)[:, None]]
        nfields = _NF_TRANSP

    flat = jnp.concatenate(rows, axis=1)                # (K*C, F)
    blk = flat.reshape(K, C, nfields).transpose(0, 2, 1)  # (K, F, C)

    # per-triangle bounding spheres for shortlist scoring (selection only)
    v1, v2 = v0 + e1, v0 + e2
    cen = (v0 + v1 + v2) * jnp.float32(1.0 / 3.0)
    rad = jnp.sqrt(jnp.maximum(jnp.maximum(
        jnp.sum((v0 - cen) ** 2, -1), jnp.sum((v1 - cen) ** 2, -1)),
        jnp.sum((v2 - cen) ** 2, -1)))
    rad = jnp.where(valid, rad + eps, -1.0)   # eps-inflated like the
    #                                           cluster AABBs; pads never
    #                                           overlap any capsule
    bound = jax.lax.stop_gradient(
        jnp.concatenate([cen, rad[:, None]], -1).reshape(K, C, 4))

    # AABB refit: per-triangle min/max over its 3 vertices, masked padding,
    # reduced per cluster; inflated by the cluster's max epsilon (the
    # reference inflates node slabs by node->epsilon, accel.c:120-156).
    verts = jnp.stack([v0, v0 + e1, v0 + e2], axis=1)   # (K*C, 3, 3)
    vm = valid[:, None]
    vmin = jnp.where(vm, verts.min(1), FLT_MAX).reshape(K, C, 3).min(1)
    vmax = jnp.where(vm, verts.max(1), -FLT_MAX).reshape(K, C, 3).max(1)
    ceps = jnp.where(valid, eps, 0.0).reshape(K, C).max(1)[:, None]
    lo = jax.lax.stop_gradient(vmin - ceps)
    hi = jax.lax.stop_gradient(vmax + ceps)
    return blk, lo, hi, flat, bound


def pack_clusters(ds, static, cluster_size: int) -> ClusterSet:
    """Pack the (already device-resident) triangle arrays into clusters of
    ``cluster_size`` and re-fit cluster AABBs from the current vertices.

    Padding lanes get eps=1 which makes Möller-Trumbore's parallel test
    (|a| < eps with a == 0) reject them unconditionally."""
    ns = static.n_spheres
    nt = ds.tri_v0.shape[0]
    mat_np = np.asarray(static.material_index[ns:ns + nt], np.int32)
    transp_np = np.asarray(static.is_transparent, bool)[mat_np]
    kt = None
    transp = None
    if transp_np.any():
        # kt per triangle: differentiable gather with *static* indices,
        # once per pack (P-independent, so cost is negligible).  NOT a
        # one-hot matmul: the TPU MXU truncates f32 operands to bfloat16
        # at default precision, which quantized kt (0.6 -> 0.6015625) and
        # broke exact brute-force parity of the tint product on hardware.
        kt = ds.materials.kt[jnp.asarray(mat_np)]          # (nt, 3)
        transp = jnp.asarray(transp_np)

    blk, lo, hi, flat, bound = _pack_from_arrays(
        ds.tri_v0, ds.tri_e1, ds.tri_e2, ds.tri_n, ds.tri_eps,
        jnp.ones(nt, bool), kt, transp, cluster_size)
    return ClusterSet(blk=blk, lo=lo, hi=hi,
                      gid0=jnp.int32(ns), flat=flat, bound=bound)


def pack_clusters_sharded(sh, static, cluster_size: int) -> ClusterSet:
    """Per-shard cluster pack: TriShards (geometry/sharded.py) → a stacked
    ClusterSet whose every array carries a leading shard axis.

    Each shard's contiguous triangle range (already Morton-ordered by
    reorder_scene — any contiguous slice of a Morton order is spatially
    tight) is packed independently, so the pr-sharded intersector can run
    the SAME sorted cluster sweep per shard (vmapped over the shard axis;
    under SPMD each device sweeps only its own range) instead of the
    brute-force range fold.  gid stays global: shard s covers global prim
    ids [ns + s·m, ns + (s+1)·m), so gid0 is per-shard.  The TriShards
    sharding constraint is re-applied to every stacked output so XLA keeps
    the packed blocks on their owner devices."""
    S, m = sh.eps.shape
    v0 = jnp.stack([sh.v0.x, sh.v0.y, sh.v0.z], -1)        # (S, m, 3)
    e1 = jnp.stack([sh.e1.x, sh.e1.y, sh.e1.z], -1)
    e2 = jnp.stack([sh.e2.x, sh.e2.y, sh.e2.z], -1)
    n = jnp.stack([sh.n.x, sh.n.y, sh.n.z], -1)
    valid = sh.gid >= 0

    if sh.kt is not None:
        fn = lambda *a: _pack_from_arrays(*a, cluster_size)  # noqa: E731
        blk, lo, hi, flat, bound = jax.vmap(fn)(
            v0, e1, e2, n, sh.eps, valid, sh.kt, sh.transp)
    else:
        fn = lambda *a: _pack_from_arrays(                   # noqa: E731
            *a, None, None, cluster_size)
        blk, lo, hi, flat, bound = jax.vmap(fn)(
            v0, e1, e2, n, sh.eps, valid)

    ns = static.n_spheres
    gid0 = jnp.int32(ns) + jnp.arange(S, dtype=jnp.int32) * jnp.int32(m)
    con = (lambda a: jax.lax.with_sharding_constraint(a, sh.sharding)
           ) if sh.sharding is not None else (lambda a: a)
    return ClusterSet(blk=con(blk), lo=con(lo), hi=con(hi),
                      gid0=con(gid0), flat=con(flat), bound=con(bound))


def _k_smallest(key, V):
    """(vals, idx) of the V smallest entries per row of ``key`` (R, K),
    ascending, ties to the lowest index — identical order and tie-break to
    ``lax.top_k(-key, V)``, by V passes of min-reduce + first-index + mask.

    top_k on (R, K≈1700) keys lowered to a variadic sort costing
    ~0.6 ms/call on scene4 512² (two call sites = 24% of the frame); V
    VPU sweeps over (R, K) are several times cheaper for the small V used
    by visit budgets.  Rows whose keys are all FLT_MAX can return
    repeated indices — callers mask those lanes via vals < FLT_MAX, same
    as they did with top_k."""
    R, K = key.shape
    if V > 32:
        # extraction cost grows linearly with V while the sort behind
        # top_k is V-independent; large budgets (transparent scenes'
        # visits=64) keep the sort
        neg_top, idx = jax.lax.top_k(-key, V)
        return -neg_top, idx.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
    cur = key
    vals, idxs = [], []
    for _ in range(V):
        m = cur.min(axis=1)                                 # (R,)
        first = jnp.min(jnp.where(cur == m[:, None], iota, K), axis=1)
        first = jnp.minimum(first, K - 1)                   # all-masked row
        vals.append(m)
        idxs.append(first)
        cur = jnp.where(iota == first[:, None], FLT_MAX, cur)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _k_smallest_payload(key, payload, V):
    """V smallest per row of ``key`` (R, K) with an int32 ``payload`` row
    carried through the extraction (picked-masked sums — no row gather).
    Same order/tie-break as _k_smallest."""
    R, K = key.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
    cur = key
    vals, pays = [], []
    for _ in range(V):
        m = cur.min(axis=1)                                 # (R,)
        first = jnp.min(jnp.where(cur == m[:, None], iota, K), axis=1)
        first = jnp.minimum(first, K - 1)
        picked = iota == first[:, None]
        vals.append(m)
        pays.append(jnp.sum(jnp.where(picked, payload, 0), axis=1))
        cur = jnp.where(picked, FLT_MAX, cur)
    return jnp.stack(vals, axis=1), jnp.stack(pays, axis=1)


def _visit_order(cs: ClusterSet, o, d, visits: int,
                 use_pallas: bool = False, count_max_dist=None):
    """Slab-test all clusters, return (cids (R,V), ok (R,V), entry (R,V),
    spill (R,)) sorted by entry distance.  Selection only — gradients
    stopped.

    ``spill`` is the per-ray count of overlapping clusters BEYOND the V
    budget (the live-render truncation guard: spill == 0 proves the sweep
    saw every overlapped cluster).  With ``count_max_dist`` (R,) only
    clusters entered before that distance are counted — in-range clusters
    sort before out-of-range ones (entry-ascending order), so
    in-range-count ≤ V still guarantees every in-range cluster made the
    list (the per-ray shadow sweep's exactness criterion).

    ``use_pallas``: route through the fused VMEM kernel
    (accel/pallas_visit.py) — identical cids/ok/entry, keys never touch
    HBM; the kernel does not materialize the overlap mask, so spill is a
    lower bound (count of live list slots minus V, i.e. 0) there — callers
    gate on platform/eligibility via RenderConfig.pallas_visit (default
    off)."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    K = cs.lo.shape[0]
    V = max(1, min(visits, K))   # visits=0 would make the sweep a 0-scan
    if use_pallas:
        from c_raytracer_tpu.accel import pallas_visit
        BR = 128
        R = o.shape[0]
        Rp = -(-R // BR) * BR
        Kp = -(-K // 128) * 128
        lo = jax.lax.stop_gradient(cs.lo)
        hi = jax.lax.stop_gradient(cs.hi)
        if Kp > K:   # pad rows lo = hi = +inf never overlap
            inf = jnp.full((Kp - K, 3), jnp.inf, jnp.float32)
            lo = jnp.concatenate([lo, inf])
            hi = jnp.concatenate([hi, inf])
        op, dp = o, d
        if Rp > R:
            op = jnp.concatenate([op, jnp.zeros((Rp - R, 3), o.dtype)])
            dp = jnp.concatenate([dp, jnp.zeros((Rp - R, 3), d.dtype)])
        cids, entry = pallas_visit.visit_order_fused(
            op, dp, lo, hi, V=V, block_rays=BR)
        cids = jnp.minimum(cids[:R], K - 1)  # pad-row ids only on dead lanes
        entry = entry[:R]
        return (cids, entry < FLT_MAX, entry,
                jnp.zeros(cids.shape[0], jnp.int32))
    # robust slab test (Williams et al., accel.c:111-158): div-by-zero
    # yields ±inf which min/max handle; 0*inf NaN is avoided by nudging d
    dd = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    inv = 1.0 / dd
    t1 = (cs.lo[None, :, :] - o[:, None, :]) * inv[:, None, :]  # (R, K, 3)
    t2 = (cs.hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tmin = jnp.minimum(t1, t2).max(-1)
    tmax = jnp.maximum(t1, t2).min(-1)
    entry = jnp.maximum(tmin, 0.0)
    overlap = tmax >= entry                               # (R, K)
    counted = (overlap if count_max_dist is None
               else overlap & (entry < count_max_dist[:, None]))
    spill = jnp.maximum(
        jnp.sum(counted, axis=-1, dtype=jnp.int32) - V, 0)
    key = jnp.where(overlap, entry, FLT_MAX)
    # top_k, not _k_smallest: K here is the full cluster count (~1-6k), and
    # V extraction passes re-stream the (R, K) keys from HBM — measured a
    # wash-to-loss vs the sort on scene4 512²; _k_smallest wins only on
    # small key blocks (the shortlist's V·C)
    neg_top, idx = jax.lax.top_k(-key, V)                 # (R, V)
    return idx.astype(jnp.int32), -neg_top < FLT_MAX, -neg_top, spill


def _visit_order_super(cs: ClusterSet, o, d, visits: int, G: int, S: int,
                       count_max_dist=None):
    """Two-level visit-order: slab-test the Ks = ceil(K/G) SUPER-clusters
    (unions of G consecutive Morton clusters — any contiguous Morton run
    is spatially tight), keep the nearest S supers per ray, then slab-test
    only their S·G member clusters and extract the nearest V.

    Shrinks the key block both top_k phases pay for from (R, K) to
    (R, Ks) + (R, S·G) — for scene4 (K=1725, G=S=16): 108 + 256 keys per
    ray instead of 1725 (the round-3 "named next lever",
    accel.c:322-353's tree descent recast as two sorted batch levels).

    Exactness: a ray overlapping more than S supers may lose clusters in
    the (S+1)-th-nearest super; the returned spill counts BOTH levels
    (member-cluster spill + G × super spill — a conservative upper
    bound), so the always-on runtime guard reports any truncation.
    Returns (cids (R,V), ok (R,V), entry (R,V), spill (R,)) exactly like
    _visit_order."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    K = cs.lo.shape[0]
    # the candidate pool is the S selected supers' members — a V beyond
    # S·G has nothing to pick (the spill counter accounts the truncation)
    V = max(1, min(visits, K, S * G))
    Ks = -(-K // G)
    pad = Ks * G - K
    lo = jax.lax.stop_gradient(cs.lo)
    hi = jax.lax.stop_gradient(cs.hi)
    if pad:   # pad rows lo=+max, hi=-max never overlap any ray
        lo = jnp.concatenate([lo, jnp.full((pad, 3), FLT_MAX)])
        hi = jnp.concatenate([hi, jnp.full((pad, 3), -FLT_MAX)])
    slo = lo.reshape(Ks, G, 3).min(1)
    shi = hi.reshape(Ks, G, 3).max(1)

    dd = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    inv = 1.0 / dd

    def slab(blo, bhi):
        """Componentwise slab test vs a gathered or broadcast AABB set;
        blo/bhi (R, M, 3) or (M, 3).  Returns (entry, overlap) (R, M)."""
        if blo.ndim == 2:
            blo = blo[None]
            bhi = bhi[None]
        t1 = (blo - o[:, None, :]) * inv[:, None, :]
        t2 = (bhi - o[:, None, :]) * inv[:, None, :]
        tmin = jnp.minimum(t1, t2).max(-1)
        tmax = jnp.maximum(t1, t2).min(-1)
        entry = jnp.maximum(tmin, 0.0)
        return entry, tmax >= entry

    # level 1: supers
    s_entry, s_ov = slab(slo, shi)                        # (R, Ks)
    s_counted = (s_ov if count_max_dist is None
                 else s_ov & (s_entry < count_max_dist[:, None]))
    s_spill = jnp.maximum(
        jnp.sum(s_counted, axis=-1, dtype=jnp.int32) - S, 0)
    s_key = jnp.where(s_ov, s_entry, FLT_MAX)
    if S > 32:
        neg, sel = jax.lax.top_k(-s_key, S)
        sel = sel.astype(jnp.int32)
    else:
        _, sel = _k_smallest(s_key, S)                    # (R, S)

    # level 2: member clusters of the selected supers
    cand = (sel[:, :, None] * G
            + jnp.arange(G, dtype=jnp.int32)[None, None, :]
            ).reshape(o.shape[0], S * G)                  # (R, S·G)
    glo = lo[cand]                                        # (R, S·G, 3)
    ghi = hi[cand]
    entry, ov = slab(glo, ghi)                            # (R, S·G)
    counted = (ov if count_max_dist is None
               else ov & (entry < count_max_dist[:, None]))
    spill = jnp.maximum(
        jnp.sum(counted, axis=-1, dtype=jnp.int32) - V, 0) \
        + jnp.int32(G) * s_spill
    key = jnp.where(ov, entry, FLT_MAX)
    if V > 32:
        neg_top, pos = jax.lax.top_k(-key, V)
        vals = -neg_top
        cids = jnp.take_along_axis(cand, pos, axis=1)
    else:
        vals, cids = _k_smallest_payload(key, cand, V)
    ok = vals < FLT_MAX
    cids = jnp.where(ok, cids, 0)
    return cids, ok, vals, spill


def spill_counts(cs: ClusterSet, o, d, visits: int):
    """Diagnostic: per-ray count of slab-overlapping clusters and how many
    exceeded the visit budget (the closest-hit sweep's truncation).

    The closest sweep prunes sorted visits by best-so-far t, so spill > 0
    does NOT always mean a wrong hit — but spill == 0 *proves* the sweep
    was exhaustive.  Used by accel/validate.py's spill policy."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    V = min(visits, cs.lo.shape[0])
    dd = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    inv = 1.0 / dd
    t1 = (cs.lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t2 = (cs.hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tmin = jnp.minimum(t1, t2).max(-1)
    tmax = jnp.maximum(t1, t2).min(-1)
    overlap = tmax >= jnp.maximum(tmin, 0.0)
    n = jnp.sum(overlap, axis=-1)
    return n, jnp.maximum(n - V, 0)


def shadow_spill_counts(cs: ClusterSet, origin, hull_lo, hull_hi,
                        visits: int, k_short: int):
    """Diagnostic: per-pixel spill of the shared-origin shadow sweep.

    Returns (cluster_spill, tri_spill): capsule-overlapping clusters
    beyond the visit budget, and capsule-overlapping *triangles* beyond
    the shortlist K (0 when the shortlist is disabled).  Unlike closest
    hits, the shadow tint product needs EVERY transparent blocker along
    the segment, so any spill on a transparent scene can lose kt factors
    (light leaks — measured 2× radiance error on scene5 at the round-2
    defaults)."""
    origin = jax.lax.stop_gradient(origin)
    K = cs.lo.shape[0]
    V = min(visits, K)
    center = 0.5 * (cs.lo + cs.hi)
    half_diag = 0.5 * jnp.linalg.norm(cs.hi - cs.lo, axis=-1)
    ecenter = 0.5 * (hull_lo + hull_hi)
    erad = 0.5 * jnp.linalg.norm(hull_hi - hull_lo)
    seg = ecenter[None] - origin
    seglen2 = jnp.maximum(jnp.sum(seg * seg, -1), 1e-30)
    rel = center[None, :, :] - origin[:, None, :]
    s = jnp.clip(jnp.einsum("pkc,pc->pk", rel, seg) / seglen2[:, None],
                 0.0, 1.0)
    closest = s[..., None] * seg[:, None, :]
    d2 = jnp.sum((rel - closest) ** 2, -1)
    margin = half_diag[None] + s * erad
    overlap = d2 <= margin * margin
    n_cl = jnp.sum(overlap, axis=-1)
    cl_spill = jnp.maximum(n_cl - V, 0)

    if not k_short:
        return cl_spill, jnp.zeros_like(cl_spill)

    # triangle-level: same capsule test as shadow_shortlist, over ALL
    # triangles' bounding spheres (not just the visited clusters' — this
    # measures the true candidate count the shortlist competes for)
    C = cs.bound.shape[1]
    b = cs.bound.reshape(K * C, 4)
    cen, rad = b[:, :3], b[:, 3]
    seglen = jnp.sqrt(seglen2)
    rx = cen[None, :, 0] - origin[:, None, 0]
    ry = cen[None, :, 1] - origin[:, None, 1]
    rz = cen[None, :, 2] - origin[:, None, 2]
    dot = (rx * seg[:, None, 0] + ry * seg[:, None, 1]
           + rz * seg[:, None, 2])
    st = jnp.clip(dot / seglen2[:, None], 0.0, 1.0)
    cx = rx - st * seg[:, None, 0]
    cy = ry - st * seg[:, None, 1]
    cz = rz - st * seg[:, None, 2]
    td2 = cx * cx + cy * cy + cz * cz
    s_hi = jnp.clip((dot + rad[None] * seglen[:, None]) / seglen2[:, None],
                    0.0, 1.0)
    tmargin = rad[None] + s_hi * erad
    t_overlap = (td2 <= tmargin * tmargin) & (rad[None] >= 0)
    n_tri = jnp.sum(t_overlap, axis=-1)
    tri_spill = jnp.maximum(n_tri - min(k_short, V * C), 0)
    return cl_spill, tri_spill


def _mt_block(blk, o, d):
    """Möller-Trumbore on a gathered block: blk (R, 13, C), o/d (R, 3).

    Componentwise on (R, C) slices — no (R, C, 3) transposes.  Exact
    accept rules of object.c:422-441.  Returns (t, hit) each (R, C)."""
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    v0x, v0y, v0z = blk[:, _F_V0], blk[:, _F_V0 + 1], blk[:, _F_V0 + 2]
    e1x, e1y, e1z = blk[:, _F_E1], blk[:, _F_E1 + 1], blk[:, _F_E1 + 2]
    e2x, e2y, e2z = blk[:, _F_E2], blk[:, _F_E2 + 1], blk[:, _F_E2 + 2]
    eps = blk[:, _F_EPS]

    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    parallel = (a < eps) & (a > -eps)
    f = 1.0 / jnp.where(parallel, 1.0, a)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    hit = (~parallel & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
           & (t > eps))
    return t, hit


def _closest_scan(cs, cids, ok, entry, o, d, bt0, bg0, dead_skip: bool):
    """The visit scan of ``closest_hit_clusters`` over ONE ray batch:
    fold each ray's sorted visit list into (best_t, best_gid)."""
    C = cs.blk.shape[2]
    V = cids.shape[1]

    def body(b, v):
        bt, bg = b
        cid = cids[:, v]
        # skip clusters that can't beat the running best: sorted entries
        # mean every later visit is farther (accel.c:341-352 pruning)
        live = ok[:, v] & (entry[:, v] < bt)

        def live_step(args):
            bt, bg = args
            blk = cs.blk[cid]                              # (R, 13, C)
            t, hit = _mt_block(blk, o, d)
            t = jnp.where(hit & live[:, None], t, FLT_MAX)
            lane = jnp.argmin(t, axis=-1)
            tmin = jnp.min(t, axis=-1)
            better = tmin < bt
            gid = cs.gid0 + cid * C + lane.astype(jnp.int32)
            return (jnp.where(better, tmin, bt),
                    jnp.where(better, gid, bg))

        # dead-step skip: visit lists are front-packed (sorted by entry)
        # and pruned by best-so-far, so once no ray is live the remaining
        # scheduled visits do no work — a real scalar branch lets XLA skip
        # the gather+MT body (the budget can be generous at no cost).
        # ``dead_skip=False`` for tight always-live budgets: the per-step
        # scalar cond costs more than it saves there (intersect.py auto)
        if not dead_skip:
            return live_step((bt, bg)), None
        return jax.lax.cond(jnp.any(live), live_step,
                            lambda args: args, (bt, bg)), None

    (bt, bg), _ = jax.lax.scan(body, (bt0, bg0), jnp.arange(V))
    return bt, bg


def closest_hit_clusters(cs: ClusterSet, o, d, best, *, visits: int,
                         pallas_visit: bool = False,
                         dead_skip: bool = True,
                         with_spill: bool = False,
                         super_group: int = 0, super_sel: int = 16,
                         compact_block: int = 0):
    """Fold the nearest-``visits`` clusters' triangles into ``best``.

    o, d: (R, 3); best: (t (R,), gid (R,), normal (R, 3)) from the
    sphere/plane pre-pass.  Returns the updated best tuple; with
    ``with_spill`` also a per-ray (R,) int32 count of overlapped clusters
    beyond the budget (the live-render closest-hit truncation guard —
    spill > 0 does not prove a wrong hit, best-t pruning usually masks
    it, but spill == 0 proves the sweep exhaustive; validate.py policy).

    The visit scan carries only (t, gid) — the winning lane's id is
    arithmetic (cluster id × C + argmin lane), so the loop runs with NO
    per-ray data gathers (profiling: four take_along_axis gathers per
    visit were ~16% of a scene4 frame).  The winner's normal is fetched
    once after the sweep with a single 3-component gather.

    ``compact_block`` > 0 (dividing R with ≥2 blocks): sort rays by
    visit-list length and run the scan in sub-blocks of that many sorted
    rays (each block's dead-step cond exits at its own max length) —
    bit-identical per-ray results, see the inline note."""
    C = cs.blk.shape[2]
    if super_group:
        cids, ok, entry, spill = _visit_order_super(
            cs, o, d, visits, super_group, super_sel)
    else:
        cids, ok, entry, spill = _visit_order(cs, o, d, visits,
                                              pallas_visit)
    bt0, bg0, bn0 = best

    R = o.shape[0]
    if compact_block and R % compact_block == 0 and R // compact_block >= 2:
        # ray compaction by visit-list length (the closest-hit analogue of
        # union pixel compaction, intersect.py shadow_query): sort rays by
        # list length, scan in sub-blocks of ``compact_block`` sorted rays
        # via lax.map (each block's cond exits at its own max length),
        # inverse-permute the fold results.  Per-ray fold order is
        # unchanged — results are bit-identical; the permutation indices
        # are integer (no gradient), and the o/d/best gathers they drive
        # are differentiable, so gradients ride through unchanged.
        # Measured negative-to-neutral on scene4 (config.closest_compact
        # note): ships as a tested opt-in, default off.
        n_len = jnp.sum(ok, axis=1)
        order = jnp.argsort(n_len)
        inv = jnp.argsort(order)
        B = R // compact_block

        def blk(x):
            return x[order].reshape((B, compact_block) + x.shape[1:])

        margs = (blk(cids), blk(ok), blk(entry), blk(o), blk(d),
                 blk(bt0), blk(bg0))

        def block_scan(args):
            cids_b, ok_b, entry_b, o_b, d_b, bt_b, bg_b = args
            return _closest_scan(cs, cids_b, ok_b, entry_b, o_b, d_b,
                                 bt_b, bg_b, dead_skip=True)

        bt_b, bg_b = jax.lax.map(block_scan, margs)
        bt = bt_b.reshape(-1)[inv]
        bg = bg_b.reshape(-1)[inv]
    else:
        bt, bg = _closest_scan(cs, cids, ok, entry, o, d, bt0, bg0,
                               dead_skip)

    # winner normal: one gather (differentiable w.r.t. the packed vertices,
    # exactly like the per-visit takes it replaces)
    won = bg != bg0                        # a triangle beat the pre-pass
    ti = jnp.clip(bg - cs.gid0, 0, cs.blk.shape[0] * C - 1)
    k, c = ti // C, ti % C
    nrm = jnp.stack([cs.blk[k, _F_N + i, c] for i in range(3)], -1)
    bn = jnp.where(won[:, None], nrm, bn0)
    if with_spill:
        return bt, bg, bn, spill
    return bt, bg, bn


def any_hit_tint_clusters(cs: ClusterSet, o, d, max_dist, exclude_gid,
                          acc, *, visits: int,
                          pallas_visit: bool = False,
                          dead_skip: bool = True,
                          with_spill: bool = False,
                          super_group: int = 0, super_sel: int = 16):
    """Fold cluster triangles into the shadow accumulators (blocked, tint).

    o, d: (R, 3); max_dist, exclude_gid: (R,); acc: (blocked (R,), tint
    (R,3)).  Semantics merged into one product: an in-range blocker
    multiplies the tint by kt if transparent and by 0 if opaque
    (accel.c:360-387 — an opaque blocker kills the light, identical
    estimand) — so scenes with NO transparent material statically reduce
    to a single any() over candidates with no material lookups at all.
    Visits are nearest-first so opaque blocking is found even when the
    overlap count exceeds V.

    ``with_spill``: also return a per-ray (R,) count of IN-RANGE
    (entry < max_dist) overlapped clusters beyond the budget — the
    per-ray shadow sweep's runtime truncation guard (a spilled in-range
    cluster on a transparent scene can drop kt factors; spill == 0
    proves the tint product exhaustive)."""
    C = cs.blk.shape[2]
    if super_group:
        cids, ok, entry, spill = _visit_order_super(
            cs, o, d, visits, super_group, super_sel,
            count_max_dist=max_dist if with_spill else None)
    else:
        cids, ok, entry, spill = _visit_order(
            cs, o, d, visits, pallas_visit,
            count_max_dist=max_dist if with_spill else None)
    V = cids.shape[1]
    has_transp = cs.has_transp

    def body(acc, v):
        cid = cids[:, v]
        live = ok[:, v] & (entry[:, v] < max_dist)

        def live_step(acc):
            blocked, tint = acc
            blk = cs.blk[cid]
            t, hit = _mt_block(blk, o, d)
            gid = cs.gid0 + cid[:, None] * C + jnp.arange(C,
                                                          dtype=jnp.int32)
            in_range = (hit & live[:, None] & (t < max_dist[:, None])
                        & (gid != exclude_gid[:, None]))
            if not has_transp:
                blocked = blocked | jnp.any(in_range, axis=-1)
            else:
                transp = blk[:, _F_TRANSP]                 # (R, C) 0/1
                fs = [jnp.where(in_range, transp * blk[:, _F_KT + c], 1.0)
                      for c in range(3)]
                tint = tint * jnp.stack(
                    [jnp.prod(f, axis=-1) for f in fs], axis=-1)
            return (blocked, tint)

        # dead-step skip (see closest_hit_clusters): front-packed sorted
        # visit lists make trailing slots all-dead
        if not dead_skip:
            return live_step(acc), None
        return jax.lax.cond(jnp.any(live), live_step,
                            lambda acc: acc, acc), None

    acc, _ = jax.lax.scan(body, acc, jnp.arange(V))
    if with_spill:
        return acc, spill
    return acc


def shadow_visit_order(cs: ClusterSet, origin, hull_lo, hull_hi,
                       visits: int):
    """Visit list for a *shared-origin* shadow query.

    All of a pixel's soft-shadow rays start at the same hit point and end
    on the same emitter, so one conservative visit list per pixel serves
    every light sample: a cluster is a candidate iff its AABB overlaps the
    AABB hull of {origin} ∪ emitter bounds (any cluster touching any
    origin→light-point segment must).  Nearest-``visits`` by distance from
    the origin.  Returns (cids (P, V), ok (P, V))."""
    origin = jax.lax.stop_gradient(origin)
    K = cs.lo.shape[0]
    V = max(1, min(visits, K))   # visits=0 would make the sweep a 0-scan
    center = 0.5 * (cs.lo + cs.hi)                         # (K, 3)
    half_diag = 0.5 * jnp.linalg.norm(cs.hi - cs.lo, axis=-1)  # (K,)
    ecenter = 0.5 * (hull_lo + hull_hi)
    erad = 0.5 * jnp.linalg.norm(hull_hi - hull_lo)
    # conservative capsule test: every shadow segment runs from the origin
    # into the emitter bounds, so it stays within distance s·erad of the
    # origin→emitter-center chord at fractional position s.  A cluster can
    # only be hit if its center is within half_diag + s·erad of the chord —
    # much tighter than an AABB hull for long segments, so a smaller V
    # covers all true overlaps.
    seg = ecenter[None] - origin                           # (P, 3)
    seglen2 = jnp.maximum(jnp.sum(seg * seg, -1), 1e-30)   # (P,)
    rel = center[None, :, :] - origin[:, None, :]          # (P, K, 3)
    s = jnp.clip(jnp.einsum("pkc,pc->pk", rel, seg) / seglen2[:, None],
                 0.0, 1.0)
    closest = s[..., None] * seg[:, None, :]               # (P, K, 3)
    d2 = jnp.sum((rel - closest) ** 2, -1)
    margin = half_diag[None] + s * erad
    overlap = d2 <= margin * margin
    key = jnp.where(overlap, jnp.sum(rel * rel, -1), FLT_MAX)
    # top_k (see _visit_order): full-cluster-count keys favor the sort
    neg_top, idx = jax.lax.top_k(-key, V)
    return idx.astype(jnp.int32), -neg_top < FLT_MAX


def shadow_union_visit_order(cs: ClusterSet, origin, dirs_fn, nchunks,
                             visits: int):
    """EXACT per-pixel visit list for a shared-origin shadow query: the
    union over every light sample's segment-slab overlaps (the same
    Williams slab test the per-ray sweep uses, accel.c:111-158), instead
    of the conservative origin→emitter capsule of shadow_visit_order.

    The capsule over-covers badly on transparent mesh scenes (scene5: the
    fat per-pixel capsule needed ~ALL clusters for the exact kt product,
    while the mean per-SEGMENT overlap is ~3) — the union is the tightest
    per-pixel list that still guarantees every kt blocker of every sample
    is swept, so gathers are shared across all S samples AND the list is
    short.  Lists are sorted by cluster distance from the origin and
    front-packed, so the sweep's per-visit dead-step cond exits after the
    tile's true max union count; the static ``visits`` budget can be
    generous at no streaming cost.

    origin: (P, 3); dirs_fn(chunk_i) -> (d (P, lc, 3), max_dist (P, lc),
    exclude).  Returns (cids (P, V), ok (P, V), spill (P,)) where spill =
    union count minus V (spill == 0 proves the sweep exhaustive —
    accel/validate.py policy)."""
    origin = jax.lax.stop_gradient(origin)
    K = cs.lo.shape[0]
    P = origin.shape[0]
    V = max(1, min(visits, K))

    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]  # (P, 1)
    lox, loy, loz = cs.lo[:, 0][None], cs.lo[:, 1][None], cs.lo[:, 2][None]
    hix, hiy, hiz = cs.hi[:, 0][None], cs.hi[:, 1][None], cs.hi[:, 2][None]

    def seg_overlap_group(d, md):
        """(P, K) union of a GROUP of samples' segment-slab overlaps.
        d: (P, su, 3), md: (P, su).  Componentwise (no trailing-3 axis);
        grouping su samples per step keeps the (P·su, K) fusion large
        enough to hide VPU op overheads (per-sample steps are tiny)."""
        su = md.shape[1]
        tmin = jnp.full((P, su, K), -FLT_MAX)
        tmax = jnp.full((P, su, K), FLT_MAX)
        for c, (lo_c, hi_c, oc) in enumerate(
                ((lox, hix, ox), (loy, hiy, oy), (loz, hiz, oz))):
            dc = d[:, :, c][:, :, None]                # (P, su, 1)
            dd = jnp.where(jnp.abs(dc) < 1e-30, 1e-30, dc)
            inv = 1.0 / dd
            t1 = (lo_c[:, None, :] - oc[:, :, None]) * inv
            t2 = (hi_c[:, None, :] - oc[:, :, None]) * inv
            tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
            tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        entry = jnp.maximum(tmin, 0.0)
        ov = (tmax >= entry) & (entry < md[:, :, None])
        return jnp.any(ov, axis=1)                     # (P, K)

    def chunk_body(union, chunk_i):
        d, md, _ = dirs_fn(chunk_i)                    # (P, lc, 3), (P, lc)
        lc = md.shape[1]
        su = min(8, lc)
        ngroups = -(-lc // su)
        pad = ngroups * su - lc
        if pad:
            # duplicate the last sample into the pad lanes: unioning a
            # repeated segment is a no-op
            d = jnp.concatenate([d, jnp.repeat(d[:, -1:], pad, 1)], axis=1)
            md = jnp.concatenate(
                [md, jnp.repeat(md[:, -1:], pad, 1)], axis=1)
        d = d.reshape(P, ngroups, su, 3)
        md = md.reshape(P, ngroups, su)

        def group_body(union, g):
            return union | seg_overlap_group(d[:, g], md[:, g]), None

        union, _ = jax.lax.scan(group_body, union, jnp.arange(ngroups))
        return union, None

    union0 = jnp.zeros((P, K), bool)
    union, _ = jax.lax.scan(chunk_body, union0, jnp.arange(nchunks))

    n_union = jnp.sum(union, axis=-1)                  # (P,)
    spill = jnp.maximum(n_union - V, 0)
    center = 0.5 * (cs.lo + cs.hi)
    rel = center[None, :, :] - origin[:, None, :]
    key = jnp.where(union, jnp.sum(rel * rel, -1), FLT_MAX)
    vals, idx = _k_smallest(key, V)                    # top_k path for V>32
    return idx.astype(jnp.int32), vals < FLT_MAX, spill


def _mt_block_multi(blk, o, d):
    """Möller-Trumbore: shared-origin o (P, 3) against many directions
    d (P, S, 3) and one gathered block per pixel blk (P, 13, C).

    Returns (t, hit) each (P, S, C).  The S-independent terms (s = o - v0,
    q = s × e1, and the t numerator e2·q) are computed once per pixel —
    part of the point of the shared-origin formulation."""
    def F(i):
        return blk[:, i, None, :]                          # (P, 1, C)
    dx, dy, dz = d[..., 0, None], d[..., 1, None], d[..., 2, None]  # (P,S,1)
    e1x, e1y, e1z = F(_F_E1), F(_F_E1 + 1), F(_F_E1 + 2)
    e2x, e2y, e2z = F(_F_E2), F(_F_E2 + 1), F(_F_E2 + 2)
    eps = F(_F_EPS)

    # per-pixel (S-independent): s and q = s × e1, tnum = e2·q
    sx, sy, sz = (o[:, i, None] - blk[:, _F_V0 + i] for i in range(3))
    qx = sy * blk[:, _F_E1 + 2] - sz * blk[:, _F_E1 + 1]
    qy = sz * blk[:, _F_E1] - sx * blk[:, _F_E1 + 2]
    qz = sx * blk[:, _F_E1 + 1] - sy * blk[:, _F_E1]
    tnum = (blk[:, _F_E2] * qx + blk[:, _F_E2 + 1] * qy
            + blk[:, _F_E2 + 2] * qz)                      # (P, C)

    hx = dy * e2z - dz * e2y                               # (P, S, C)
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    parallel = (a < eps) & (a > -eps)
    f = 1.0 / jnp.where(parallel, 1.0, a)
    u = f * (sx[:, None, :] * hx + sy[:, None, :] * hy + sz[:, None, :] * hz)
    v = f * (dx * qx[:, None, :] + dy * qy[:, None, :] + dz * qz[:, None, :])
    t = f * tnum[:, None, :]
    hit = (~parallel & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
           & (t > eps))
    return t, hit


def shadow_shortlist(cs: ClusterSet, origin, cids, ok, ecenter, erad,
                     k_short: int):
    """Per-pixel top-K candidate triangles for a shared-origin shadow query.

    The cluster-level capsule prefilter (shadow_visit_order) is coarse:
    Morton clusters have fat AABBs relative to the narrow origin→emitter
    capsule, so most of the V×C gathered candidates can never block any
    sample (profiling: the V×C Möller-Trumbore sweep dominates mesh-scene
    frames).  This second level scores each candidate *triangle's* bounding
    sphere against the same capsule and keeps the nearest ``k_short``
    overlapping ones per pixel — the sample chunks then stream against K
    triangles instead of V·C.

    origin: (P, 3); cids/ok: (P, V) from shadow_visit_order; ecenter (3,),
    erad ().  Returns (blk (P, F, K) gathered triangle rows, gid (P, K)
    global prim ids, lane_ok (P, K)).  Selection only — gradients stopped
    at the scores; the gathered rows keep their vertex gradients."""
    origin = jax.lax.stop_gradient(origin)
    C = cs.blk.shape[2]
    V = cids.shape[1]
    P = origin.shape[0]
    K = min(k_short, V * C)

    seg = ecenter[None] - origin                           # (P, 3)
    seglen2 = jnp.maximum(jnp.sum(seg * seg, -1), 1e-30)   # (P,)
    seglen = jnp.sqrt(seglen2)

    def score_visit(v):
        cid = cids[:, v]                                   # (P,)
        b = cs.bound[cid]                                  # (P, C, 4)
        cen, rad = b[..., :3], b[..., 3]
        # componentwise (no (P,C,3) dot_generals): rel·seg and |rel|², then
        # point-segment distance via |rel|² - s²·|seg|²  (closest point is
        # s·seg along the chord, so |rel - s·seg|² = |rel|² - 2s(rel·seg)
        # + s²|seg|² and rel·seg = s_unclipped·|seg|²)
        rx = cen[..., 0] - origin[:, None, 0]
        ry = cen[..., 1] - origin[:, None, 1]
        rz = cen[..., 2] - origin[:, None, 2]
        dot = (rx * seg[:, None, 0] + ry * seg[:, None, 1]
               + rz * seg[:, None, 2])                     # (P, C)
        dist2 = rx * rx + ry * ry + rz * rz
        s = jnp.clip(dot / seglen2[:, None], 0.0, 1.0)
        # residual componentwise (the expanded |rel|²-2s·dot+s²|seg|² form
        # cancels catastrophically for centroids near the chord)
        cx = rx - s * seg[:, None, 0]
        cy = ry - s * seg[:, None, 1]
        cz = rz - s * seg[:, None, 2]
        d2 = cx * cx + cy * cy + cz * cz
        # margin must use the LARGEST chord fraction any point of the
        # bounding sphere can project to (a hit point x inside the sphere
        # has u_x ≤ s_hi), not the centroid's own fraction s — the capsule
        # radius grows along the chord, so s·erad under-covers hits past
        # the centroid's projection
        s_hi = jnp.clip((dot + rad * seglen[:, None]) / seglen2[:, None],
                        0.0, 1.0)
        margin = rad + s_hi * erad
        overlap = (d2 <= margin * margin) & (rad >= 0) & ok[:, v, None]
        return jnp.where(overlap, dist2, FLT_MAX)

    scores = jax.vmap(score_visit, out_axes=1)(jnp.arange(V))
    # flat-triangle index per score lane, arithmetically from (visit, lane)
    flat_ti = (cids[:, :, None] * C
               + jnp.arange(C, dtype=jnp.int32)[None, None, :])  # (P, V, C)
    scores = scores.reshape(P, V * C)
    flat_ti = flat_ti.reshape(P, V * C)
    # K-smallest selection over the small (P, V·C) score block by K passes
    # of min-reduce + first-index + mask — pure VPU sweeps.  top_k here
    # lowered to a variadic (P, V·C) sort (measured 150-250 ms/frame on
    # scene4 512² depending on how its index operand fused); K·(V·C)
    # compare/selects are an order of magnitude cheaper, and the
    # ascending-score-first-index order is identical.  The triangle id is
    # carried as a PAYLOAD through the extraction (picked-masked sum) —
    # recovering it afterwards via take_along_axis re-lowers to the very
    # row gather this extraction exists to avoid.  Configs that raise K
    # past 32 take the top_k sort instead (V-independent cost).
    if K > 32:
        neg_top, pos = jax.lax.top_k(-scores, K)
        vals = -neg_top
        lane_ok = vals < FLT_MAX
        ti = jnp.take_along_axis(flat_ti, pos, axis=1)
        ti = jnp.where(lane_ok, ti, 0)
    else:
        vals, ti = _k_smallest_payload(scores, flat_ti, K)
        lane_ok = vals < FLT_MAX
        ti = jnp.where(lane_ok, ti, 0)
    blk = cs.flat[ti]                                      # (P, K, F)
    blk = jnp.swapaxes(blk, 1, 2)                          # (P, F, K)
    gid = cs.gid0 + ti
    return blk, gid, lane_ok


def any_hit_tint_shortlist(cs: ClusterSet, origin, blk, gid, lane_ok,
                           dirs_fn, nchunks, acc, *, remat: bool = True):
    """Shared-origin soft-shadow sweep over a per-pixel triangle shortlist.

    blk (P, F, K), gid (P, K), lane_ok (P, K) from shadow_shortlist; acc
    and semantics exactly as any_hit_tint_shared — merged-product
    occlusion, opaque scenes carry only ``blocked``."""
    has_transp = cs.has_transp

    def chunk_body(acc, chunk_i):
        d, max_dist, exclude_gid = dirs_fn(chunk_i)
        t, hit = _mt_block_multi(blk, origin, d)           # (P, lc, K)
        in_range = (hit & lane_ok[:, None, :]
                    & (t < max_dist[..., None])
                    & (gid[:, None, :] != exclude_gid[..., None]))
        if not has_transp:
            blocked = acc
            return blocked.at[:, chunk_i].set(
                blocked[:, chunk_i] | jnp.any(in_range, axis=-1)), None
        blocked, tint = acc
        transp = blk[:, _F_TRANSP]                         # (P, K) 0/1
        fs = [jnp.where(in_range,
                        (transp * blk[:, _F_KT + c])[:, None, :], 1.0)
              for c in range(3)]
        ktp = jnp.stack([jnp.prod(f, axis=-1) for f in fs], axis=-1)
        tint = tint.at[:, chunk_i].multiply(ktp)
        return (blocked, tint), None

    body = remat_mod.checkpoint(chunk_body) if remat else chunk_body
    acc, _ = jax.lax.scan(body, acc, jnp.arange(nchunks))
    return acc


def any_hit_tint_shared(cs: ClusterSet, origin, cids, ok, dirs_fn,
                        nchunks, acc, *, remat: bool = True,
                        dead_skip: bool = True):
    """Shared-origin soft-shadow sweep, visits-outer / sample-chunks-inner.

    The naive order (per light-sample chunk, per visit: gather + test)
    re-gathers every cluster block S/lc times; this order gathers each
    visited block once per pixel per round and streams all sample chunks
    through it — an S× cut in gather traffic, which profiling shows is the
    dominant cost of soft shadows on TPU.

    origin: (P, 3); cids/ok: from shadow_visit_order; dirs_fn(chunk_i) ->
    (d (P, lc, 3), max_dist (P, lc), exclude_gid (P, lc)) regenerates the
    chunk's sample directions (deterministic PRNG — cheaper than storing
    all S of them).

    acc / semantics: merged-product occlusion (see any_hit_tint_clusters).
    Opaque scenes (no kt rows packed): acc = blocked (P, nchunks, lc) —
    one any()-reduce per step, no material data touched.  Transparent
    scenes: acc = (blocked, tint (P, nchunks, lc, 3)); opaque blockers
    zero the tint instead of setting blocked."""
    C = cs.blk.shape[2]
    V = cids.shape[1]
    has_transp = cs.has_transp

    def visit_body(acc, v):
        cid = cids[:, v]
        live = ok[:, v]

        def live_visit(acc):
            blk = cs.blk[cid]                              # (P, F, C)
            gid = cs.gid0 + cid[:, None] * C + jnp.arange(C,
                                                          dtype=jnp.int32)

            def chunk_body(acc, chunk_i):
                d, max_dist, exclude_gid = dirs_fn(chunk_i)
                t, hit = _mt_block_multi(blk, origin, d)   # (P, lc, C)
                in_range = (hit & live[:, None, None]
                            & (t < max_dist[..., None])
                            & (gid[:, None, :] != exclude_gid[..., None]))
                if not has_transp:
                    blocked = acc
                    blk_here = jnp.any(in_range, axis=-1)
                    return blocked.at[:, chunk_i].set(
                        blocked[:, chunk_i] | blk_here), None
                blocked, tint = acc
                transp = blk[:, _F_TRANSP]                 # (P, C) 0/1
                fs = [jnp.where(
                    in_range, (transp * blk[:, _F_KT + c])[:, None, :],
                    1.0) for c in range(3)]
                ktp = jnp.stack([jnp.prod(f, axis=-1) for f in fs],
                                axis=-1)
                tint = tint.at[:, chunk_i].multiply(ktp)
                return (blocked, tint), None

            acc, _ = jax.lax.scan(chunk_body, acc, jnp.arange(nchunks))
            return acc

        # dead-step skip: visit lists are front-packed (sorted, masked
        # tail), so the scan exits real work after the batch's true max
        # list length — union mode's generous static budget relies on it
        if not dead_skip:
            return live_visit(acc), None
        return jax.lax.cond(jnp.any(live), live_visit,
                            lambda acc: acc, acc), None

    # remat per visit: the (P, lc, C) Möller-Trumbore intermediates of
    # every (visit, chunk) step must not be saved for the backward pass
    body = remat_mod.checkpoint(visit_body) if remat else visit_body
    acc, _ = jax.lax.scan(body, acc, jnp.arange(V))
    return acc
