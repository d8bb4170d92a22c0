"""Measure scene5 cluster-sweep truncation error vs brute force (float
space, not 8-bit) across visit/shortlist knobs — the VERDICT r2 "2x
radiance error" hole.  Run on the TPU chip: python tools/profiling/s5_trunc_sweep.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.accel.build import reorder_scene
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
NL = int(sys.argv[2]) if len(sys.argv) > 2 else 4

scene = reorder_scene(load_scene("/root/reference/scenes/scene5.json"))
nl = tuple(min(n, NL) for n in scene.static.num_lights)
scene = dataclasses.replace(
    scene, static=dataclasses.replace(scene.static, num_lights=nl))
key = jax.random.PRNGKey(0)
base = dict(max_bounces=4, rounds=6, tri_chunk=8192)

t0 = time.time()
fb = make_renderer(scene.static, RenderConfig(accel="none", **base), RES, RES)
img_b, _ = fb(scene.params, key)
img_b = np.asarray(img_b)
print(f"brute: {time.time()-t0:.1f}s  max={img_b.max():.4e} "
      f"mean={img_b.mean():.4e}")

for v, sv, k in [(16, None, None), (16, 16, 32), (16, 64, 0),
                 (16, 96, 0), (32, 128, 0)]:
    cfg = RenderConfig(accel="cluster", bvh_visits=v, bvh_shadow_visits=sv,
                       bvh_shadow_shortlist=k, **base)
    t0 = time.time()
    fc = make_renderer(scene.static, cfg, RES, RES)
    img_c, _ = fc(scene.params, key)
    img_c = np.asarray(img_c)
    dt = time.time() - t0
    ad = np.abs(img_c - img_b)
    denom = np.maximum(np.abs(img_b), 1e-6)
    rel = (ad / denom).max()
    # relative error on the bright half of the image (dark pixels inflate
    # rel error meaninglessly)
    bright = np.abs(img_b) >= max(1e-5, 0.01 * img_b.max())
    relb = (ad / denom)[bright].max() if bright.any() else 0.0
    print(f"v={v} sv={sv} K={k}: {dt:6.1f}s  maxabs={ad.max():.3e} "
          f"rel={rel:.3e} rel(bright)={relb:.3e}")
