"""Measure scene5 shadow-segment overlap structure to size the round-4
work-compaction design: per-segment cluster overlap, per-pixel chunk-union
size (all lc samples of one pixel), and super-cluster union size, at
several cluster granularities.

Run on TPU: python tools/profiling/s5_union_stats.py [res] [lc]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.accel import traverse
from c_raytracer_tpu.accel.build import reorder_scene
from c_raytracer_tpu.accel.intersect import make_intersector
from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render import RenderConfig
from c_raytracer_tpu.render import shading
from c_raytracer_tpu.render.camera import primary_rays
from c_raytracer_tpu.scene import load_scene

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 64
LC = int(sys.argv[2]) if len(sys.argv) > 2 else 40

scene = reorder_scene(load_scene("/root/reference/scenes/scene5.json"))
static = scene.static
ds = G.device_scene(scene.params, static)
egid = int(static.emitter_prims[0])
print("tris", static.n_triangles, "emitter gid", egid,
      "num_lights", static.num_lights[egid])

o_a, d_a = primary_rays(scene.params.camera, RES, RES)
o, d = v3m.from_aos(o_a), v3m.from_aos(d_a)
ic = make_intersector(ds, static, RenderConfig())
t, gid, mat, n = jax.jit(ic.closest)(o, d)
hit = gid >= 0
hp = o + d * jnp.where(hit, t, 1.0)
print("primary hits", int(hit.sum()), "/", RES * RES)

# one chunk of real light samples
key = jax.random.fold_in(jax.random.PRNGKey(0), 7)
lp = shading._sphere_light_point(
    key, v3m.splat(ds.sph_center[egid]), ds.sph_radius[egid], hp, LC)
lvec = lp - hp.map(lambda a: a[None])
ldist = v3m.safe_mag(lvec)          # (LC, P)
ldir = lvec * (1.0 / jnp.where(ldist == 0, 1.0, ldist))

o2 = jnp.broadcast_to(v3m.to_aos(hp)[None], (LC, RES * RES, 3)).reshape(-1, 3)
d2 = v3m.to_aos(ldir).reshape(-1, 3)
md = ldist.reshape(-1)


def seg_overlap_mask(lo, hi, o2, d2, md):
    """(R, K) bool: segment [0, md] overlaps cluster AABB.  Componentwise
    (no (R, K, 3) materialization — a 64²×40×6300×3 f32 intermediate is
    ~12 GB and crashes the worker)."""
    dd = jnp.where(jnp.abs(d2) < 1e-30, 1e-30, d2)
    inv = 1.0 / dd
    tmin = jnp.full((o2.shape[0], lo.shape[0]), -np.float32(np.inf))
    tmax = jnp.full((o2.shape[0], lo.shape[0]), np.float32(np.inf))
    for c in range(3):
        t1 = (lo[None, :, c] - o2[:, None, c]) * inv[:, None, c]
        t2 = (hi[None, :, c] - o2[:, None, c]) * inv[:, None, c]
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    entry = jnp.maximum(tmin, 0.0)
    return (tmax >= entry) & (entry < md[:, None])


def union_stats(lo, hi):
    """Scan over the LC sample axis: per-step (P, K) masks only."""
    K = lo.shape[0]
    P = RES * RES
    o_p = v3m.to_aos(hp)                                   # (P, 3)

    @jax.jit
    def run():
        def step(carry, i):
            union, counts_sum = carry
            d_i = jnp.stack([ldir.x[i], ldir.y[i], ldir.z[i]], -1)
            ov = seg_overlap_mask(lo, hi, o_p, d_i, ldist[i])   # (P, K)
            return (union | ov, counts_sum.at[i].set(ov.sum(-1))), None

        u0 = jnp.zeros((P, K), bool)
        c0 = jnp.zeros((LC, P), jnp.int32)
        (union, counts), _ = jax.lax.scan(step, (u0, c0), jnp.arange(LC))
        return counts, union.sum(-1)
    return run()


for C in (16, 32, 64, 128):
    cs = traverse.pack_clusters(ds, static, C)
    K = cs.lo.shape[0]
    stats = lambda cs=cs: union_stats(cs.lo, cs.hi)

    per_seg, per_px = map(np.asarray, stats())
    hm = np.asarray(hit)
    pseg = per_seg[:, hm].ravel()
    ppx = per_px[hm]
    print(f"C={C:4d} K={K:5d} | per-seg overlap: mean {pseg.mean():6.1f} "
          f"p50 {np.percentile(pseg, 50):5.0f} p95 {np.percentile(pseg, 95):5.0f} "
          f"p99 {np.percentile(pseg, 99):5.0f} max {pseg.max():5d} | "
          f"px-union: mean {ppx.mean():6.1f} p95 {np.percentile(ppx, 95):5.0f} "
          f"p99 {np.percentile(ppx, 99):5.0f} max {ppx.max():5d}")

# super-cluster granularity: contiguous groups of G clusters of C=16
cs16 = traverse.pack_clusters(ds, static, 16)
for GRP in (16, 64):
    K = cs16.lo.shape[0]
    Ks = -(-K // GRP)
    pad = Ks * GRP - K
    lo = jnp.concatenate([cs16.lo, jnp.full((pad, 3), np.float32(np.inf))])
    hi = jnp.concatenate([cs16.hi, jnp.full((pad, 3), -np.float32(np.inf))])
    slo = lo.reshape(Ks, GRP, 3).min(1)
    shi = hi.reshape(Ks, GRP, 3).max(1)

    per_seg, per_px = map(np.asarray, union_stats(slo, shi))
    hm = np.asarray(hit)
    pseg = per_seg[:, hm].ravel()
    ppx = per_px[hm]
    print(f"super G={GRP:3d} Ks={Ks:4d} | per-seg: mean {pseg.mean():5.1f} "
          f"p99 {np.percentile(pseg, 99):4.0f} max {pseg.max():4d} | "
          f"px-union: mean {ppx.mean():5.1f} p99 {np.percentile(ppx, 99):4.0f} "
          f"max {ppx.max():4d}")
