"""Scene intersector: picks brute-force or cluster-accelerated traversal.

The reference routes every query through accel_get_closest_intersection /
accel_is_light_blocked plus a linear plane scan (render.c:118-134); this is
the TPU-native equivalent seam.  Spheres and planes are always dense
(reference scenes have a handful; planes are outside the BVH there too,
object.h:84); triangles go through the cluster sweep (traverse.py) once the
scene is big enough for the dense (rays × triangles) product to lose.

Interface is SoA (``V3`` component arrays, ray axis last-minor — see
core/v3.py); the cluster sweep's per-ray gathered blocks are AoS
internally and convert at this seam.
"""

from __future__ import annotations

import dataclasses
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.accel import traverse
from c_raytracer_tpu.core import remat as remat_mod
from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.core.v3 import V3
from c_raytracer_tpu.geometry import primitives as G

if TYPE_CHECKING:  # avoid the accel <-> render import cycle at runtime
    from c_raytracer_tpu.render.config import RenderConfig
    from c_raytracer_tpu.scene import types as T

# dense is faster below this triangle count (dense streams the triangle
# arrays once per chunk; clusters pay a gather per ray per visit)
AUTO_THRESHOLD = 512

INT32_MAX = np.int32(np.iinfo(np.int32).max)


@dataclasses.dataclass(frozen=True)
class Intersector:
    """Closure-captured query object used by the integrator and shading."""

    ds: G.DeviceScene
    static: 'T.SceneStatic'
    cfg: 'RenderConfig'
    # replicated ClusterSet, or (with shards) a pr-stacked ClusterSet whose
    # arrays carry a leading shard axis — each device sweeps its own range
    clusters: traverse.ClusterSet | None
    # primitive-range sharding (SURVEY §2.5 row 3): triangle arrays split
    # over a mesh axis; folds all-reduce (geometry/sharded.py)
    shards: object | None = None
    # separate cluster set for the shadow sweep when its cluster size
    # differs (union mode defaults to C=64: 4× the VPU lane utilization
    # of the main C=16 clusters in the (P, lc, C) Möller-Trumbore and 4×
    # fewer clusters to prefilter/gather); None -> the main set
    shadow_clusters: traverse.ClusterSet | None = None

    @property
    def _shadow_cs(self):
        return (self.shadow_clusters if self.shadow_clusters is not None
                else self.clusters)

    def closest(self, o: V3, d: V3, with_spill: bool = False):
        """(t, gid, mat, normal V3) over the whole scene; o/d V3 of (P,).

        ``with_spill``: also return a per-lane int32 count of overlapped
        clusters beyond the visit budget (0 on the brute-force paths —
        those are exhaustive by construction).  The live-render closest-hit
        truncation guard (validate.py policy: spill == 0 proves the sweep
        exhaustive; best-t pruning usually masks spill > 0)."""
        if self.shards is not None and self.clusters is None:
            from c_raytracer_tpu.geometry import sharded
            out = sharded.closest_hit_sharded(self.ds, self.static,
                                              self.shards, o, d)
            return out + (jnp.zeros(jnp.shape(o.x), jnp.int32),) \
                if with_spill else out
        if self.clusters is None:
            out = G.closest_hit_soa(self.ds, self.static, o, d,
                                    tri_chunk=self.cfg.tri_chunk)
            return out + (jnp.zeros(jnp.shape(o.x), jnp.int32),) \
                if with_spill else out
        t, gid, mat, n = G.closest_hit_soa(
            self.ds, self.static, o, d, include_triangles=False)
        o2, d2 = v3m.to_aos(o), v3m.to_aos(d)
        if self.shards is not None:
            def sweep(args):
                return self._closest_clusters_sharded(args, with_spill)
        else:
            def sweep(args):
                return traverse.closest_hit_clusters(
                    self.clusters, args[0], args[1], tuple(args[2]),
                    visits=self._visits,
                    pallas_visit=self._use_pallas_visit(self.clusters,
                                                        self._visits),
                    dead_skip=self._dead_skip,
                    with_spill=with_spill,
                    super_group=self._super_group(self.clusters),
                    super_sel=self.cfg.bvh_super_sel,
                    compact_block=self._closest_compact_block(
                        args[0].shape[0]))
        out = self._chunked(sweep, (o2, d2, [t, gid, v3m.to_aos(n)]),
                            o2.shape[0])
        if with_spill:
            t, gid, n_aos, spill = out
        else:
            t, gid, n_aos = out
        # triangle winners need a material gather (the only one on this
        # path; spheres/planes carried theirs statically)
        ns = self.static.n_spheres
        is_tri = (gid >= ns) & (gid < ns + self.static.n_triangles)
        mat_tri = self.ds.mat_idx[jnp.clip(gid, 0, self.ds.mat_idx.shape[0]
                                           - 1)]
        mat = jnp.where(is_tri, mat_tri, mat)
        if with_spill:
            return t, gid, mat, v3m.from_aos(n_aos), \
                jax.lax.stop_gradient(spill)
        return t, gid, mat, v3m.from_aos(n_aos)

    def _closest_clusters_sharded(self, args, with_spill: bool = False):
        """Per-shard sorted cluster sweep (vmapped over the pr axis), then
        the cross-shard min-t fold of geometry/sharded.py: global min over
        t, ties to the lowest global prim id, winner data via masked sums
        (psums under SPMD), then challenge the sphere/plane best with the
        replicated fold's strictly-smaller rule (accel.c:328)."""
        o2, d2, (bt, bg, bn_aos) = args
        R = o2.shape[0]

        def per_shard(cs):
            best0 = (jnp.full((R,), traverse.FLT_MAX),
                     jnp.full((R,), INT32_MAX, jnp.int32),
                     jnp.zeros((R, 3), jnp.float32))
            return traverse.closest_hit_clusters(
                cs, o2, d2, best0, visits=self._visits,
                with_spill=with_spill)

        if with_spill:
            ts, gs, nv, sp = jax.vmap(per_shard)(self.clusters)
            spill = jnp.max(sp, axis=0)                    # (R,)
        else:
            ts, gs, nv = jax.vmap(per_shard)(self.clusters)  # (S, R, ...)
        tm = ts.min(axis=0)
        gcand = jnp.where(ts == tm[None], gs, INT32_MAX)
        gm = gcand.min(axis=0)
        win = (ts == tm[None]) & (gs == gm[None]) \
            & (tm < traverse.FLT_MAX)[None]
        nw = jnp.sum(win[..., None].astype(jnp.float32) * nv, axis=0)
        better = tm < bt                                   # tris fold last
        out = (jnp.where(better, tm, bt),
               jnp.where(better, gm, bg),
               jnp.where(better[:, None], nw, bn_aos))
        return out + (spill,) if with_spill else out

    def retest(self, o: V3, d: V3, gid):
        """Single-primitive inside-object re-test (render.c:143-144).

        pr-sharded scenes route the per-ray triangle gather through the
        owner shard (geometry/sharded.intersect_prim_sharded) so no
        consumer keeps a replicated copy of the triangle arrays live;
        otherwise the replicated gather path.  Returns (t, hit, normal)."""
        if self.shards is not None:
            from c_raytracer_tpu.geometry import sharded
            return sharded.intersect_prim_sharded(
                self.ds, self.static, self.shards, o, d, gid)
        return G.intersect_prim_soa(self.ds, o, d, gid)

    def any_tint(self, o: V3, d: V3, max_dist, exclude_gid,
                 with_spill: bool = False):
        """(blocked, tint V3) shadow query; component shapes arbitrary.

        ``with_spill``: also return a per-lane int32 count of in-range
        overlapped clusters beyond the shadow visit budget — the per_ray
        mode's runtime kt-truncation guard (0 on the exhaustive
        brute-force paths)."""
        lead = jnp.shape(d.x)
        if self.shards is not None and self.clusters is None:
            from c_raytracer_tpu.geometry import sharded
            out = sharded.any_hit_tint_sharded(
                self.ds, self.static, self.shards, o, d, max_dist,
                exclude_gid)
            return out + (jnp.zeros(lead, jnp.int32),) if with_spill \
                else out
        if self.clusters is None:
            out = G.any_hit_tint_soa(self.ds, self.static, o, d, max_dist,
                                     exclude_gid,
                                     tri_chunk=self.cfg.tri_chunk)
            return out + (jnp.zeros(lead, jnp.int32),) if with_spill \
                else out
        blocked, tint = G.any_hit_tint_soa(
            self.ds, self.static, o, d, max_dist, exclude_gid,
            include_triangles=False)
        o2 = jnp.broadcast_to(v3m.to_aos(o), lead + (3,)).reshape(-1, 3)
        d2 = v3m.to_aos(d).reshape(-1, 3)
        ex = jnp.broadcast_to(jnp.asarray(exclude_gid, jnp.int32),
                              lead).reshape(-1)
        if self.shards is not None:
            def sweep(args):
                return self._any_tint_clusters_sharded(args, with_spill)
        else:
            def sweep(args):
                return traverse.any_hit_tint_clusters(
                    self.clusters, args[0], args[1], args[2], args[3],
                    tuple(args[4]),
                    visits=self._shadow_visits,
                    pallas_visit=self._use_pallas_visit(
                        self.clusters, self._shadow_visits),
                    dead_skip=self._dead_skip,
                    with_spill=with_spill,
                    super_group=self._super_group(self.clusters),
                    super_sel=self.cfg.bvh_super_sel)
        flat = (o2, d2, max_dist.reshape(-1), ex,
                [blocked.reshape(-1), v3m.to_aos(tint).reshape(-1, 3)])
        out = self._chunked(sweep, flat, flat[0].shape[0])
        if with_spill:
            (blocked, tint), spill = out
            return (blocked.reshape(lead),
                    v3m.from_aos(tint.reshape(lead + (3,))),
                    jax.lax.stop_gradient(spill.reshape(lead)))
        blocked, tint = out
        return (blocked.reshape(lead), v3m.from_aos(tint.reshape(lead + (3,))))

    def _any_tint_clusters_sharded(self, args, with_spill: bool = False):
        """Shadow fold with per-shard cluster sweeps: per-shard
        blocked/tint accumulators start empty, combine by any-reduce and
        ordered tint product over the (static, small) shard axis — the
        bit-stability contract of geometry/sharded.any_hit_tint_sharded —
        then merge with the sphere/plane pre-pass accumulators."""
        o2, d2, md, ex, (blocked, tint) = args
        R = o2.shape[0]

        def per_shard(cs):
            acc0 = (jnp.zeros((R,), bool), jnp.ones((R, 3), jnp.float32))
            return traverse.any_hit_tint_clusters(
                cs, o2, d2, md, ex, acc0,
                visits=self._shadow_visits, with_spill=with_spill)

        if with_spill:
            (blk_s, tint_s), sp = jax.vmap(per_shard)(self.clusters)
            spill = jnp.max(sp, axis=0)
        else:
            blk_s, tint_s = jax.vmap(per_shard)(self.clusters)  # (S, R[, 3])
        blocked = blocked | jnp.any(blk_s, axis=0)
        for k in range(blk_s.shape[0]):
            tint = tint * tint_s[k]
        if with_spill:
            return (blocked, tint), spill
        return blocked, tint

    def _closest_compact_block(self, n_rays: int) -> int:
        """Sub-block size for closest-hit ray compaction (0 = off) —
        config.closest_compact (measured negative-to-neutral on chip;
        see the config note).  Fat blocks only: fine blocks shrink each
        visit step to a VPU-underfilled (pb, C) body and multiply the
        per-block cond overhead (1024-ray blocks measured 2.2× slower on
        scene4 512²)."""
        mode = getattr(self.cfg, "closest_compact", "off")
        if mode != "on":
            return 0
        pb = 8192
        while pb >= 128 and n_rays % pb:
            pb //= 2
        if n_rays % pb or n_rays // pb < 2:
            return 0
        return pb

    def _union_compact_block(self, n_pixels: int) -> int:
        """Sub-block size for union-mode pixel compaction (0 = off).

        config.union_compact: "auto" enables it when the pixel batch is
        large enough for the length skew to matter and divides cleanly
        into power-of-two blocks; explicit "on"/"off" override."""
        mode = getattr(self.cfg, "union_compact", "auto")
        if mode == "off":
            return 0
        pb = 256
        while pb >= 32 and n_pixels % pb:
            pb //= 2
        if n_pixels % pb or n_pixels // pb < 2:
            return 0
        if mode == "on":
            return pb
        return pb if n_pixels >= 512 else 0

    def _super_group(self, cs) -> int:
        """Super-prefilter group size for this cluster set (config auto:
        opaque scenes with enough clusters; 0 disables)."""
        if cs is None:
            return 0
        K = cs.lo.shape[-2] if cs.lo.ndim == 3 else cs.lo.shape[0]
        return self.cfg.resolved_super_group(
            any(self.static.is_transparent), K)

    @property
    def _dead_skip(self) -> bool:
        """Per-visit cond skip: pays off when budgets are generous
        relative to live work (transparent scenes: visits 64+ vs ~3 mean
        overlap); a tight always-live opaque budget (scene4 visits=16)
        only pays the per-step scalar cond."""
        mode = getattr(self.cfg, "sweep_dead_skip", "auto")
        if mode != "auto":
            return mode == "on"
        return any(self.static.is_transparent)

    def _use_pallas_visit(self, cs, visits: int) -> bool:
        """Whether _visit_order routes through the fused VMEM kernel
        (config.pallas_visit; platform + VMEM eligibility).  ``visits``
        must be the CALL SITE's actual budget — the shadow sweep's budget
        can exceed the closest-hit one, and eligibility guards the
        kernel's V-dependent VMEM stack."""
        mode = getattr(self.cfg, "pallas_visit", "off")
        if mode == "off" or cs is None:
            return False
        from c_raytracer_tpu.accel import pallas_visit
        from c_raytracer_tpu.core import rng
        K = cs.lo.shape[-2] if cs.lo.ndim == 3 else cs.lo.shape[0]
        if mode == "on":
            return True
        return pallas_visit.eligible(
            0, -(-K // 128) * 128, visits, rng._target_platform())

    @property
    def _visits(self) -> int:
        """Closest-hit visit budget — scene-aware auto (config.py):
        transparent scenes carry inside-mesh rays that overlap many
        zero-entry clusters and need a larger budget."""
        return self.cfg.resolved_visits(any(self.static.is_transparent))

    @property
    def _shadow_visits(self) -> int:
        """Shadow visit budget — scene-aware auto (config.py): transparent
        scenes need every kt blocker along the segment, so their default
        is much higher (the scene5 22× light-leak fix)."""
        return self.cfg.resolved_shadow_visits(
            any(self.static.is_transparent))

    @property
    def _shadow_shortlist(self) -> int:
        """Shortlist K — auto-disabled for transparent scenes (config.py):
        nearest-to-origin scoring drops far-along-segment kt factors."""
        return self.cfg.resolved_shadow_shortlist(
            any(self.static.is_transparent))

    @property
    def resolved_shadow_mode(self) -> str:
        return self.cfg.resolved_shadow_mode(
            any(self.static.is_transparent))

    @property
    def use_shared_shadows(self) -> bool:
        """Whether soft shadows go through shadow_query (the shared-origin
        sweep — capsule lists in "shared" mode, exact per-sample-union
        lists in "union" mode) or fall back to per-sample any_tint visit
        lists ("per_ray")."""
        if self.clusters is None:
            return False
        return self.resolved_shadow_mode in ("shared", "union")

    @property
    def has_clusters(self) -> bool:
        return self.clusters is not None

    def shadow_query(self, origin: V3, emitter_lo, emitter_hi, dirs_fn,
                     egid, nchunks, lc):
        """Shared-origin soft-shadow query over all sample chunks at once.

        origin: V3 (P,) per-pixel hit points; emitter_lo/hi: (3,) emitter
        AABB; dirs_fn(chunk_i) -> (ldir V3 (lc, P), ldist (lc, P)).
        Returns (blocked (nchunks, lc, P), tint, spill_max) where tint is
        (tx, ty, tz) each (nchunks, lc, P) for scenes with transparent
        materials and None otherwise (opaque occlusion is fully captured
        by ``blocked`` — no material data enters the sweep), and
        spill_max is a scalar int32: union mode's worst per-pixel visit
        truncation this query (0 everywhere proves the sweep exhaustive;
        surfaced through render stats as the runtime truncation guard).

        Requires clusters (callers fall back to per-chunk ``any_tint``
        otherwise).  Visit lists are computed once per pixel — from the
        conservative capsule ("shared" mode, traverse.shadow_visit_order)
        or the exact per-sample-segment union ("union" mode,
        traverse.shadow_union_visit_order) — and each cluster block is
        gathered once per pixel while every sample chunk streams through
        it."""
        scs = self._shadow_cs
        has_transp = scs.has_transp
        union_mode = self.resolved_shadow_mode == "union"

        # sphere/plane brute pre-pass per chunk (cheap: few primitives),
        # SoA; also materializes every chunk's sample dirs once for reuse
        def gen(chunk_i):
            ldir, ldist = dirs_fn(chunk_i)
            b, tn = G.any_hit_tint_soa(
                self.ds, self.static, origin.map(lambda x: x[None]), ldir,
                ldist, egid, include_triangles=False)
            return (v3m.to_aos(ldir), ldist, b, tn.x, tn.y, tn.z)

        dirs_aos, ldist_all, blocked, tx, ty, tz = jax.lax.map(
            gen, jnp.arange(nchunks))  # (nchunks, lc, P, ...)

        # cluster sweep over the triangles, AoS internals
        origin_aos = v3m.to_aos(origin)

        def cached_dirs(chunk_i):
            # traverse expects (P, lc, ...) AoS
            d = jnp.moveaxis(dirs_aos[chunk_i], 0, 1)        # (P, lc, 3)
            md = jnp.moveaxis(ldist_all[chunk_i], 0, 1)      # (P, lc)
            exg = jnp.full(md.shape, egid, jnp.int32)
            return d, md, exg

        blocked_pm = jnp.moveaxis(blocked, 2, 0)             # (P, nc, lc)
        remat = getattr(self.cfg, "remat", True)
        k_short = self._shadow_shortlist
        ecenter = 0.5 * (emitter_lo + emitter_hi)
        erad = 0.5 * jnp.linalg.norm(emitter_hi - emitter_lo)

        def sweep_one(cs, acc):
            """Visit list + (shortlist) sweep for ONE ClusterSet — run
            directly on the replicated set, vmapped over the shard axis
            of a pr-stacked set.  Returns (acc, spill_max) — union mode's
            runtime truncation guard (spill == 0 proves the kt product
            swept every blocker; accel/validate.py policy)."""
            if union_mode:
                uv = self.cfg.resolved_union_visits(has_transp)
                scope = getattr(self.cfg, "union_scope", "auto")
                if scope == "auto":
                    scope = "frame"   # chunk scope measured slower
                    #                   (config.py union_scope note)
                if scope == "chunk" and nchunks > 1:
                    # per-CHUNK lists: each lc-sample chunk sweeps only
                    # its own segment union — several times smaller than
                    # the frame union for inside-the-mesh pixels (the
                    # sweep body is 56% of a scene5 frame and scales
                    # with list length × chunks; extraction repeats per
                    # chunk instead)
                    def chunk_sweep(carry, ci):
                        acc, spill_acc = carry

                        def one_dirs(_j, _ci=ci):
                            return cached_dirs(_ci)

                        cids, ok, spill = \
                            traverse.shadow_union_visit_order(
                                cs, origin_aos, one_dirs, 1, uv)
                        if not has_transp:
                            sub = jax.lax.dynamic_slice_in_dim(
                                acc, ci, 1, 1)           # (P, 1, lc)
                            sub = traverse.any_hit_tint_shared(
                                cs, origin_aos, cids, ok, one_dirs, 1,
                                sub, remat=remat,
                                dead_skip=self._dead_skip)
                            acc = jax.lax.dynamic_update_slice_in_dim(
                                acc, sub, ci, 1)
                        else:
                            b, t = acc
                            sb = jax.lax.dynamic_slice_in_dim(b, ci, 1, 1)
                            st = jax.lax.dynamic_slice_in_dim(t, ci, 1, 1)
                            sb, st = traverse.any_hit_tint_shared(
                                cs, origin_aos, cids, ok, one_dirs, 1,
                                (sb, st), remat=remat,
                                dead_skip=self._dead_skip)
                            acc = (
                                jax.lax.dynamic_update_slice_in_dim(
                                    b, sb, ci, 1),
                                jax.lax.dynamic_update_slice_in_dim(
                                    t, st, ci, 1))
                        return (acc, jnp.maximum(spill_acc,
                                                 jnp.max(spill))), None

                    (acc, spill_max), _ = jax.lax.scan(
                        chunk_sweep, (acc, jnp.int32(0)),
                        jnp.arange(nchunks))
                    return acc, spill_max
                cids, ok, spill = traverse.shadow_union_visit_order(
                    cs, origin_aos, cached_dirs, nchunks, uv)
                pb = self._union_compact_block(origin_aos.shape[0])
                if pb:
                    # pixel compaction by union length: the batch-level
                    # dead-step cond exits at the BATCH's max list length,
                    # so a handful of inside-the-glass pixels (unions of
                    # 110+) keep every background lane (unions of ~3)
                    # streaming.  Sort pixels by their union length,
                    # sweep in sub-blocks of pb sorted pixels via
                    # lax.map — each block's cond exits at ITS OWN max —
                    # and inverse-permute the accumulators.  Permutation
                    # indices come from stop_gradient'd masks, so
                    # gradients flow through the gathers unchanged.
                    n_len = jnp.sum(ok, axis=1)               # (P,)
                    order = jnp.argsort(n_len)
                    inv = jnp.argsort(order)
                    B = origin_aos.shape[0] // pb

                    def blk(x):
                        return x[order].reshape((B, pb) + x.shape[1:])

                    # (P, nc, lc, 3) / (P, nc, lc) permuted dir caches
                    d_p = blk(jnp.moveaxis(dirs_aos, 2, 0))
                    md_p = blk(jnp.moveaxis(ldist_all, 2, 0))
                    ops = (blk(cids), blk(ok), blk(origin_aos),
                           jax.tree.map(blk, acc), d_p, md_p)

                    def block_sweep(args):
                        cids_b, ok_b, org_b, acc_b, d_b, md_b = args

                        def dirs_b(ci):
                            md = md_b[:, ci]
                            return (d_b[:, ci], md,
                                    jnp.full(md.shape, egid, jnp.int32))

                        return traverse.any_hit_tint_shared(
                            cs, org_b, cids_b, ok_b, dirs_b, nchunks,
                            acc_b, remat=remat, dead_skip=True)

                    acc_b = jax.lax.map(block_sweep, ops)
                    acc = jax.tree.map(
                        lambda x: x.reshape((B * pb,) + x.shape[2:])[inv],
                        acc_b)
                else:
                    acc = traverse.any_hit_tint_shared(
                        cs, origin_aos, cids, ok, cached_dirs, nchunks,
                        acc, remat=remat, dead_skip=self._dead_skip)
                return acc, jnp.max(spill)
            cids, ok = traverse.shadow_visit_order(
                cs, origin_aos, emitter_lo, emitter_hi,
                self._shadow_visits)
            if k_short:
                # triangle-level shortlist: score once per pixel, stream
                # sample chunks against K triangles instead of visits×C
                sblk, sgid, lane_ok = traverse.shadow_shortlist(
                    cs, origin_aos, cids, ok, ecenter, erad, k_short)
                acc = traverse.any_hit_tint_shortlist(
                    cs, origin_aos, sblk, sgid, lane_ok,
                    cached_dirs, nchunks, acc, remat=remat)
                return acc, jnp.int32(0)
            acc = traverse.any_hit_tint_shared(
                cs, origin_aos, cids, ok, cached_dirs, nchunks, acc,
                remat=remat, dead_skip=self._dead_skip)
            return acc, jnp.int32(0)

        if self.shards is not None:
            P = origin_aos.shape[0]
            nc = blocked_pm.shape[1]
            lc = blocked_pm.shape[2]

            def per_shard(cs):
                b0 = jnp.zeros((P, nc, lc), bool)
                if not has_transp:
                    return sweep_one(cs, b0)
                t0 = jnp.ones((P, nc, lc, 3), jnp.float32)
                return sweep_one(cs, (b0, t0))

            acc_s, spill_s = jax.vmap(per_shard)(scs)
            spill_max = jnp.max(spill_s)
            if not has_transp:
                blocked2 = blocked_pm | jnp.any(acc_s, axis=0)
            else:
                blk_s, tint_s = acc_s
                blocked2 = blocked_pm | jnp.any(blk_s, axis=0)
                tint_pm = jnp.moveaxis(jnp.stack([tx, ty, tz], -1), 2, 0)
                # ordered product over the static shard count (the
                # bit-stability contract of geometry/sharded.py)
                for k in range(blk_s.shape[0]):
                    tint_pm = tint_pm * tint_s[k]
                tint2 = tint_pm
        else:
            if not has_transp:
                blocked2, spill_max = sweep_one(scs, blocked_pm)
            else:
                tint_pm = jnp.moveaxis(jnp.stack([tx, ty, tz], -1), 2, 0)
                (blocked2, tint2), spill_max = sweep_one(
                    scs, (blocked_pm, tint_pm))

        # saved residual: backward skips the whole sweep (core/remat.py)
        blocked2 = remat_mod.name_occlusion(blocked2)
        spill_max = jax.lax.stop_gradient(spill_max)
        if not has_transp:
            return jnp.moveaxis(blocked2, 0, -1), None, spill_max
        blocked_out = jnp.moveaxis(blocked2, 0, -1)          # (nc, lc, P)
        tint_out = jnp.moveaxis(tint2, 0, -2)                # (nc, lc, P, 3)
        return blocked_out, (tint_out[..., 0], tint_out[..., 1],
                             tint_out[..., 2]), spill_max

    def emitter_bounds(self, egid: int):
        """(lo, hi) AABB of emitter primitive ``egid`` (host-static id)."""
        ds = self.ds
        ns = ds.sph_center.shape[0]
        if egid < ns:
            c, r = ds.sph_center[egid], ds.sph_radius[egid]
            lo, hi = c - r, c + r
        else:
            ti = egid - ns
            v0 = ds.tri_v0[ti]
            v1 = v0 + ds.tri_e1[ti]
            v2 = v0 + ds.tri_e2[ti]
            lo = jnp.minimum(jnp.minimum(v0, v1), v2)
            hi = jnp.maximum(jnp.maximum(v0, v1), v2)
        return (jax.lax.stop_gradient(lo), jax.lax.stop_gradient(hi))

    def _chunked(self, fn, args, n):
        """Run fn over ray chunks of cfg.bvh_ray_chunk via lax.map."""
        chunk = self.cfg.bvh_ray_chunk
        if n <= chunk:
            return fn(args)
        nchunks = -(-n // chunk)
        pad = nchunks * chunk - n

        def prep(x):
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            return x.reshape((nchunks, chunk) + x.shape[1:])

        margs = jax.tree.map(prep, args)
        out = jax.lax.map(fn, margs)
        return jax.tree.map(
            lambda x: x.reshape((nchunks * chunk,) + x.shape[2:])[:n], out)


def make_intersector(ds: G.DeviceScene, static, cfg,
                     shards=None) -> Intersector:
    nt = ds.tri_v0.shape[0]
    mode = cfg.accel
    if mode == "auto":
        mode = "cluster" if nt >= AUTO_THRESHOLD else "none"
    any_transp = any(static.is_transparent)
    c_shadow = cfg.resolved_shadow_cluster(any_transp)
    want_shadow_set = (mode == "cluster" and nt
                       and cfg.resolved_shadow_mode(any_transp)
                       in ("shared", "union")
                       and c_shadow != cfg.bvh_cluster)
    if shards is not None:
        # pr-sharded: pack per-shard clusters so each device runs the
        # sorted sweep over its own contiguous Morton range (brute range
        # folds only for small scenes / accel="none")
        sclusters = (traverse.pack_clusters_sharded(shards, static,
                                                    cfg.bvh_cluster)
                     if (mode == "cluster" and nt) else None)
        sshadow = (traverse.pack_clusters_sharded(shards, static, c_shadow)
                   if want_shadow_set else None)
        return Intersector(ds=ds, static=static, cfg=cfg,
                           clusters=sclusters, shards=shards,
                           shadow_clusters=sshadow)
    clusters = (traverse.pack_clusters(ds, static, cfg.bvh_cluster)
                if (mode == "cluster" and nt) else None)
    shadow_clusters = (traverse.pack_clusters(ds, static, c_shadow)
                       if want_shadow_set else None)
    return Intersector(ds=ds, static=static, cfg=cfg, clusters=clusters,
                       shadow_clusters=shadow_clusters)
