"""scene4 512^2 on-chip A/B: dense visit-order vs two-level super prefilter.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profiling/s4_super_bench.py [G S]...
"""
import json
import sys
import time

import jax
import numpy as np

from c_raytracer_tpu.accel import reorder_scene
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene

scene = reorder_scene(load_scene("/root/reference/scenes/scene4.json",
                                 mesh_root="/root/reference"))
key = jax.random.PRNGKey(0)

configs = [("dense", RenderConfig(bvh_super_group=0))]
args = [int(a) for a in sys.argv[1:]]
pairs = list(zip(args[0::2], args[1::2])) or [(8, 48), (16, 48)]
for (G, S) in pairs:
    configs.append((f"G{G}_S{S}", RenderConfig(bvh_super_group=G,
                                               bvh_super_sel=S)))

ref_img = None
for name, cfg in configs:
    fn = make_renderer(scene.static, cfg, 512, 512, with_stats=True)
    img, z, st = fn(scene.params, key)
    img.block_until_ready()
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        img, z, st = fn(scene.params, jax.random.PRNGKey(i))
        img.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    img0, _, st0 = fn(scene.params, key)
    a = np.asarray(img0)
    if ref_img is None:
        ref_img = a
        diffpx = 0
    else:
        q0 = np.clip(ref_img * 255, 0, 255).astype(int)
        q1 = np.clip(a * 255, 0, 255).astype(int)
        diffpx = int((q0 != q1).any(-1).sum())
    print(json.dumps({"config": name, "seconds": round(dt, 4),
                      "diff_px_vs_dense": diffpx,
                      "visit_spill_max": float(st0["visit_spill_max"]),
                      "shadow_spill_max": float(st0["shadow_spill_max"])}),
          flush=True)
