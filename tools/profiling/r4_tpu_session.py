"""Round-4 hardware measurement session: everything in ONE process (one
tunnel session) — the axon pool's claim/release latency makes sequential
short-lived processes unreliable.

Phases (each prints a marker line; pure-XLA phases run before any Pallas
compile so a Mosaic problem can't mask the scene5 numbers):
  1. probe        — tiny jit (prints when the chip is actually granted)
  2. s5_16        — scene5 16²/300-light exact path: union vs per_ray
                    (round-3 recorded 13.8 s/frame for per_ray)
  3. s5_64        — scene5 64²/100-light union (the C binary: 2.3 s)
  4. s4_base      — scene4 512² with pallas_visit OFF
  5. pallas_micro — visit-order kernel parity + microbench vs XLA
  6. s4_pallas    — scene4 512² with pallas_visit ON
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

t_start = time.time()


def mark(msg):
    print(f"[{time.time() - t_start:8.1f}s] {msg}", flush=True)


# ---- phase 1: probe ----------------------------------------------------
mark("phase 1: waiting for chip grant ...")
x = float(jax.jit(lambda x: (x * 2).sum())(jnp.ones((64, 64))))
mark(f"phase 1: chip granted, probe={x} on {jax.devices()[0]}")

from c_raytracer_tpu.accel.build import reorder_scene
from c_raytracer_tpu.render import (RenderConfig, make_host_tiled_renderer,
                                    make_renderer)
from c_raytracer_tpu.scene import load_scene


def cap_lights(scene, nl):
    lights = tuple(min(n, nl) for n in scene.static.num_lights)
    return dataclasses.replace(
        scene, static=dataclasses.replace(scene.static, num_lights=lights))


def timed_render(scene, cfg, res, host_tiled=False):
    # host_tiled only where a single call would exceed the tunnel's
    # device-call kill; the per-call tunnel round trip otherwise skews
    # short-frame timings
    if host_tiled:
        fn = make_host_tiled_renderer(scene.static, cfg, res, res)
    else:
        fn = make_renderer(scene.static, cfg, res, res)
    t0 = time.perf_counter()
    img, z = fn(scene.params, jax.random.PRNGKey(0))
    np.asarray(img)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    img, z = fn(scene.params, jax.random.PRNGKey(0))
    np.asarray(img)
    dt = time.perf_counter() - t0
    return dt, t_first, float(np.sum(img))


s5 = reorder_scene(load_scene("/root/reference/scenes/scene5.json"))

# ---- phase 2: scene5 16²/300 union vs per_ray --------------------------
mark("phase 2: scene5 16x16 full 300-sample lights")
t_union16 = None
for name, cfg in (
    ("union", RenderConfig(shadow_mode="union", pallas_visit="off")),
    ("per_ray", RenderConfig(shadow_mode="per_ray", pallas_visit="off")),
):
    dt, t_first, tot = timed_render(s5, cfg, 16)
    if name == "union":
        t_union16 = dt
    mark(f"phase 2: s5 16x16/300 {name}: {dt:.2f} s/frame "
         f"(first {t_first:.1f}s) radiance {tot:.5f}")

# ---- phase 3: scene5 64²/100 union ------------------------------------
mark("phase 3: scene5 64x64, lights capped 100")
s5c = cap_lights(s5, 100)
# per-tile estimate from the 16² measurement: 8 tiles of 2048 px at
# 100/300 of the light samples; skip if a tile call would risk the kill
est_tile = (t_union16 or 99) * (2048 / 256) * (100 / 300) / 2
if est_tile < 15.0:
    for name, cfg in (
        ("union_c128", RenderConfig(shadow_mode="union",
                                    pallas_visit="off")),
        ("union_c64", RenderConfig(shadow_mode="union",
                                   bvh_shadow_cluster=64,
                                   pallas_visit="off")),
    ):
        dt, t_first, tot = timed_render(s5c, cfg, 64, host_tiled=True)
        mark(f"phase 3: s5 64x64/100 {name}: {dt:.2f} s/frame "
             f"(first {t_first:.1f}s) radiance {tot:.4f}")
else:
    mark(f"phase 3: SKIPPED (est per-tile {est_tile:.0f}s too risky)")

# ---- phase 4: scene4 512² baseline ------------------------------------
mark("phase 4: scene4 512x512 pallas_visit=off")
s4 = reorder_scene(load_scene("/root/reference/scenes/scene4.json",
                              mesh_root="/root/reference"))
dt, t_first, tot = timed_render(
    s4, RenderConfig(pallas_visit="off"), 512)
mark(f"phase 4: s4 512 off: {dt:.3f} s/frame (first {t_first:.1f}s) "
     f"radiance {tot:.1f}")

# ---- phase 5: pallas kernel micro -------------------------------------
mark("phase 5: pallas visit-order kernel parity + microbench")
from c_raytracer_tpu.accel import pallas_visit, traverse
from c_raytracer_tpu.accel.intersect import make_intersector
from c_raytracer_tpu.geometry import primitives as G

ds4 = G.device_scene(s4.params, s4.static)
ix4 = make_intersector(ds4, s4.static, RenderConfig(accel="cluster"))
cs = ix4.clusters
K = cs.lo.shape[0]
rngnp = np.random.default_rng(5)
R = 32768
o = jnp.asarray(rngnp.uniform(-3, 3, (R, 3)).astype(np.float32))
dn = rngnp.normal(size=(R, 3)).astype(np.float32)
d = jnp.asarray(dn / np.linalg.norm(dn, axis=-1, keepdims=True))
V = 16
f_x = jax.jit(lambda o, d: traverse._visit_order(cs, o, d, V)[:3])
cids0, ok0, entry0 = jax.block_until_ready(f_x(o, d))
Kp = -(-K // 128) * 128
inf = jnp.full((Kp - K, 3), np.float32(np.inf))
lo = jnp.concatenate([cs.lo, inf])
hi = jnp.concatenate([cs.hi, inf])
f_p = jax.jit(lambda o, d: pallas_visit.visit_order_fused(
    o, d, lo, hi, V=V))
cids1, entry1 = jax.block_until_ready(f_p(o, d))
mark("phase 5: kernel compiled")
ok0n = np.asarray(ok0)
ok1n = np.asarray(entry1) < pallas_visit.FLT_MAX
m = ok0n
par = (np.array_equal(ok0n, ok1n)
       and np.array_equal(np.asarray(cids0)[m], np.asarray(cids1)[m])
       and np.array_equal(np.asarray(entry0)[m], np.asarray(entry1)[m]))
mark(f"phase 5: parity on hardware: {par} (K={K}, R={R}, V={V})")
for name, f in (("xla", f_x), ("pallas", f_p)):
    t0 = time.perf_counter()
    for i in range(10):
        jax.block_until_ready(f(o, d))
    dt = (time.perf_counter() - t0) / 10
    mark(f"phase 5: visit_order {name}: {dt*1e3:.2f} ms per {R} rays")

# ---- phase 6: scene4 512² with pallas --------------------------------
mark("phase 6: scene4 512x512 pallas_visit=on")
dt, t_first, tot = timed_render(
    s4, RenderConfig(pallas_visit="on"), 512)
mark(f"phase 6: s4 512 pallas: {dt:.3f} s/frame (first {t_first:.1f}s) "
     f"radiance {tot:.1f}")
mark("session done")
