import time
import jax, numpy as np
from c_raytracer_tpu.accel import reorder_scene
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene

RES = 256
scene = reorder_scene(load_scene("/root/reference/scenes/scene4.json"))

ref = None
def run(tag, cfg):
    global ref
    fn = make_renderer(scene.static, cfg, RES, RES)
    img, z = fn(scene.params, jax.random.PRNGKey(0)); img.block_until_ready()
    t0 = time.perf_counter()
    for i in range(2):
        img, z = fn(scene.params, jax.random.PRNGKey(1)); img.block_until_ready()
    dt = (time.perf_counter() - t0) / 2
    img = np.asarray(img)
    if ref is None:
        ref = img; err = 0.0
    else:
        q = np.clip(img*255,0,255).astype(np.int32)
        qr = np.clip(ref*255,0,255).astype(np.int32)
        err = (np.abs(q-qr).max(-1) > 1).mean()
    print(f"{tag:34s} {dt*1000:9.1f} ms   pix>1LSB {err:.4f}", flush=True)

run("C=64 V=16 (default)", RenderConfig())
run("C=64 V=8", RenderConfig(bvh_visits=8))
run("C=32 V=16", RenderConfig(bvh_cluster=32, bvh_visits=16))
run("C=16 V=24", RenderConfig(bvh_cluster=16, bvh_visits=24))
run("C=16 V=16", RenderConfig(bvh_cluster=16, bvh_visits=16))
run("C=8  V=32", RenderConfig(bvh_cluster=8, bvh_visits=32))
