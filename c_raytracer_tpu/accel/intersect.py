"""Scene intersector: picks brute-force or cluster-accelerated traversal.

The reference routes every query through accel_get_closest_intersection /
accel_is_light_blocked plus a linear plane scan (render.c:118-134); this is
the TPU-native equivalent seam.  Spheres and planes are always dense
(reference scenes have a handful; planes are outside the BVH there too,
object.h:84); triangles go through the cluster sweep (traverse.py) once the
scene is big enough for the dense (rays × triangles) product to lose.

Shadow queries arrive shaped (P, light_samples); the cluster path flattens
and chunks them (``bvh_ray_chunk``) so the per-visit gather buffers stay
HBM-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from c_raytracer_tpu.accel import traverse
from c_raytracer_tpu.geometry import primitives as G

if TYPE_CHECKING:  # avoid the accel <-> render import cycle at runtime
    from c_raytracer_tpu.render.config import RenderConfig

# dense is faster below this triangle count (dense streams the triangle
# arrays once per chunk; clusters pay a gather per ray per visit)
AUTO_THRESHOLD = 512


@dataclasses.dataclass(frozen=True)
class Intersector:
    """Closure-captured query object used by the integrator and shading."""

    ds: G.DeviceScene
    cfg: 'RenderConfig'
    clusters: traverse.ClusterSet | None

    def closest(self, o, d):
        """(t, gid, normal) over the whole scene; leading dims arbitrary."""
        if self.clusters is None:
            return G.closest_hit(self.ds, o, d, tri_chunk=self.cfg.tri_chunk)
        best = G.closest_hit(self.ds, o, d, include_triangles=False)
        lead = o.shape[:-1]
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        best2 = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[len(lead):]),
                             best)
        out = self._chunked(
            lambda args: traverse.closest_hit_clusters(
                self.clusters, args[0], args[1], tuple(args[2]),
                visits=self.cfg.bvh_visits),
            (o2, d2, list(best2)), o2.shape[0])
        return jax.tree.map(
            lambda x: x.reshape(lead + x.shape[1:]), tuple(out))

    def any_tint(self, transparent_mask, kt_by_mat, o, d, max_dist,
                 exclude_gid):
        """(blocked, tint) shadow query; leading dims arbitrary."""
        if self.clusters is None:
            return G.any_hit_tint(
                self.ds, transparent_mask, kt_by_mat, o, d, max_dist,
                exclude_gid, tri_chunk=self.cfg.tri_chunk)
        blocked, tint = G.any_hit_tint(
            self.ds, transparent_mask, kt_by_mat, o, d, max_dist,
            exclude_gid, include_triangles=False)
        lead = o.shape[:-1]
        flat = (o.reshape(-1, 3), d.reshape(-1, 3),
                max_dist.reshape(-1), exclude_gid.reshape(-1),
                [blocked.reshape(-1), tint.reshape(-1, 3)])
        out = self._chunked(
            lambda args: traverse.any_hit_tint_clusters(
                self.clusters, transparent_mask, kt_by_mat,
                args[0], args[1], args[2], args[3], tuple(args[4]),
                visits=self.cfg.bvh_visits),
            flat, flat[0].shape[0])
        blocked, tint = out
        return blocked.reshape(lead), tint.reshape(lead + (3,))

    @property
    def has_clusters(self) -> bool:
        return self.clusters is not None

    def shadow_query(self, transparent_mask, kt_by_mat, origin,
                     emitter_lo, emitter_hi, dirs_fn, nchunks, lc):
        """Shared-origin soft-shadow query over all sample chunks at once.

        origin: (P, 3) per-pixel hit points; emitter_lo/hi: (3,) emitter
        AABB; dirs_fn(chunk_i) -> (d (P, lc, 3), max_dist (P, lc),
        exclude_gid (P, lc)).  Returns (blocked (P, nchunks, lc),
        tint (P, nchunks, lc, 3)).

        Requires clusters (callers fall back to per-chunk ``any_tint``
        otherwise).  Visit lists are computed once per pixel
        (traverse.shadow_visit_order) and each cluster block is gathered
        once per pixel while every sample chunk streams through it."""
        P = origin.shape[0]
        blocked = jnp.zeros((P, nchunks, lc), bool)
        tint = jnp.ones((P, nchunks, lc, 3), jnp.float32)

        # materialize every chunk's sample directions once — the visit
        # sweep would otherwise regenerate them V× (PRNG + trig per call)
        def gen(chunk_i):
            d, max_dist, exclude_gid = dirs_fn(chunk_i)
            return d, max_dist, exclude_gid

        dirs_all = jax.lax.map(gen, jnp.arange(nchunks))  # (nchunks, P, ...)

        def cached_dirs(chunk_i):
            return jax.tree.map(lambda x: x[chunk_i], dirs_all)

        # sphere/plane brute pre-pass per chunk (cheap: few primitives)
        def chunk_pre(acc, chunk_i):
            blocked, tint = acc
            d, max_dist, exclude_gid = cached_dirs(chunk_i)
            b, t = G.any_hit_tint(
                self.ds, transparent_mask, kt_by_mat,
                jnp.broadcast_to(origin[:, None, :], d.shape), d,
                max_dist, exclude_gid, include_triangles=False)
            return (blocked.at[:, chunk_i].set(b),
                    tint.at[:, chunk_i].set(t)), None

        (blocked, tint), _ = jax.lax.scan(
            chunk_pre, (blocked, tint), jnp.arange(nchunks))

        cids, ok = traverse.shadow_visit_order(
            self.clusters, origin, emitter_lo, emitter_hi,
            self.cfg.bvh_visits)
        blocked, tint = traverse.any_hit_tint_shared(
            self.clusters, transparent_mask, kt_by_mat, origin, cids, ok,
            cached_dirs, nchunks, (blocked, tint),
            remat=getattr(self.cfg, "remat", True))
        return blocked, tint

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


def make_intersector(ds: G.DeviceScene, cfg: 'RenderConfig') -> Intersector:
    nt = ds.tri_v0.shape[0]
    mode = cfg.accel
    if mode == "auto":
        mode = "cluster" if nt >= AUTO_THRESHOLD else "none"
    clusters = (traverse.pack_clusters(ds, cfg.bvh_cluster)
                if (mode == "cluster" and nt) else None)
    return Intersector(ds=ds, cfg=cfg, clusters=clusters)
