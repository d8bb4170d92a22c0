"""scene5 transparent-shadow benchmark: per_ray (round-3 exact path) vs
union mode (round-4 compaction) at several shadow cluster sizes.

The C binary renders scene5 64²/100-light in 2.3 s on 2 CPU cores — the
round-4 target is beating that on one TPU chip with the exact path.

Run on TPU:  python tools/profiling/s5_union_bench.py [res] [max_lights]
Host-tiled (one device call per tile batch) so long configs survive the
axon tunnel's device-call kill.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import numpy as np

from c_raytracer_tpu.accel.build import reorder_scene
from c_raytracer_tpu.render import RenderConfig, make_host_tiled_renderer
from c_raytracer_tpu.scene import load_scene

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NL = int(sys.argv[2]) if len(sys.argv) > 2 else 100

scene = reorder_scene(load_scene("/root/reference/scenes/scene5.json"))
nl = tuple(min(n, NL) for n in scene.static.num_lights)
scene = dataclasses.replace(
    scene, static=dataclasses.replace(scene.static, num_lights=nl))
print(f"scene5 {RES}x{RES}, lights capped {NL}, "
      f"{scene.static.n_triangles} tris")

CONFIGS = {
    "union_c128": RenderConfig(shadow_mode="union"),
    "union_c64": RenderConfig(shadow_mode="union", bvh_shadow_cluster=64),
    "union_c32": RenderConfig(shadow_mode="union", bvh_shadow_cluster=32),
    "per_ray": RenderConfig(shadow_mode="per_ray"),
}

which = sys.argv[3].split(",") if len(sys.argv) > 3 else list(CONFIGS)
ref_img = None
for name in which:
    cfg = CONFIGS[name]
    fn = make_host_tiled_renderer(scene.static, cfg, RES, RES)
    t0 = time.perf_counter()
    img, z = fn(scene.params, jax.random.PRNGKey(0))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    img, z = fn(scene.params, jax.random.PRNGKey(0))
    dt = time.perf_counter() - t0
    tot = float(np.sum(img))
    line = (f"{name:12s}: {dt:8.3f} s/frame (first {t_first:.1f}s) "
            f"total radiance {tot:.4f}")
    if ref_img is None:
        ref_img = np.asarray(img)
    else:
        d = np.abs(np.asarray(img) - ref_img)
        rel = d.max() / max(ref_img.max(), 1e-9)
        line += f"  max|Δ| vs first {d.max():.2e} (rel {rel:.2e})"
    print(line, flush=True)
