"""Isolate scene5 cluster-vs-brute error by query type: closest-hit parity
on primary rays, shadow blocked/tint parity at primary hit points, and
spill counts.  Run: python tools/profiling/s5_diag.py [res]
"""
import dataclasses
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
from c_raytracer_tpu.render.camera import primary_rays
from c_raytracer_tpu.scene import load_scene

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 32

scene = reorder_scene(load_scene("/root/reference/scenes/scene5.json"))
static = scene.static
ds = G.device_scene(scene.params, static)
print("tris", static.n_triangles, "spheres", static.n_spheres,
      "planes", static.n_planes, "emitters", static.emitter_prims,
      "transp mats", static.is_transparent)

o_a, d_a = primary_rays(scene.params.camera, RES, RES)
o, d = v3m.from_aos(o_a), v3m.from_aos(d_a)

ib = make_intersector(ds, static, RenderConfig(accel="none", tri_chunk=8192))
for v in (16, 32, 64):
    ic = make_intersector(ds, static, RenderConfig(
        accel="cluster", bvh_visits=v))
    tb, gb, mb, nb = jax.jit(ib.closest)(o, d)
    tc, gc, mc, nc = jax.jit(ic.closest)(o, d)
    neq = int(jnp.sum(gb != gc))
    terr = float(jnp.max(jnp.abs(jnp.where(
        (gb == gc) & (gb >= 0), tb - tc, 0.0))))
    print(f"closest v={v}: gid mismatches {neq}/{RES*RES}, "
          f"t err (matched) {terr:.2e}")

# spill for primary closest
cs = make_intersector(ds, static, RenderConfig(accel="cluster")).clusters
n_ov, spill = jax.jit(
    lambda: traverse.spill_counts(cs, o_a, d_a, 16))()
print(f"primary closest overlap: max {int(n_ov.max())} "
      f"mean {float(n_ov.mean()):.1f}; spill>0 on "
      f"{int((spill > 0).sum())}/{RES*RES} rays (V=16)")

# shadow parity at primary hit points (hit lanes only)
tb, gb, mb, nb = jax.jit(ib.closest)(o, d)
hit = gb >= 0
hp = o + d * jnp.where(hit, tb, 1.0)
egid = int(static.emitter_prims[0])
ecen, erad_ = None, None
icx = make_intersector(ds, static, RenderConfig(accel="cluster"))
elo, ehi = icx.emitter_bounds(egid)
# one deterministic sample: aim at emitter center
ecenter = 0.5 * (elo + ehi)
lvec = v3m.splat(ecenter) - hp
ldist = v3m.safe_mag(lvec)
ldir = lvec * (1.0 / jnp.where(ldist == 0, 1.0, ldist))

bb, tnb = jax.jit(lambda: ib.any_tint(hp, ldir, ldist, egid))()
for sv, k in ((16, 32), (16, 0), (64, 0), (256, 0), (16, 256), (64, 1024)):
    icc = make_intersector(ds, static, RenderConfig(
        accel="cluster", bvh_shadow_visits=sv, bvh_shadow_shortlist=k))
    bc, tnc = jax.jit(lambda icc=icc: icc.any_tint(hp, ldir, ldist, egid))()
    bneq = int(jnp.sum((bb != bc) & hit))
    terr = max(float(jnp.max(jnp.abs(jnp.where(
        hit, getattr(tnb, c) - getattr(tnc, c), 0.0)))) for c in "xyz")
    print(f"shadow sv={sv} K={k}: blocked mismatch {bneq}/{int(hit.sum())}"
          f", tint err {terr:.3e}")

# shadow spill at hit points
cl_sp, tri_sp = jax.jit(lambda: traverse.shadow_spill_counts(
    cs, v3m.to_aos(hp), elo, ehi, 16, 32))()
m = np.asarray(hit)
print(f"shadow spill (V=16,K=32) at hit pts: cluster spill max "
      f"{int(cl_sp[m].max())} mean {float(cl_sp[m].mean()):.1f}; "
      f"tri spill max {int(tri_sp[m].max())} mean "
      f"{float(tri_sp[m].mean()):.1f}")
