import time, sys
import jax
from c_raytracer_tpu.accel import reorder_scene
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
scene = reorder_scene(load_scene("/root/reference/scenes/scene4.json"))
print("tris:", scene.static.n_triangles, "spheres:", scene.static.n_spheres,
      "planes:", scene.static.n_planes,
      "lights:", [scene.static.num_lights[e] for e in scene.static.emitter_prims])

def run(tag, cfg):
    fn = make_renderer(scene.static, cfg, RES, RES)
    t0 = time.perf_counter()
    img, z = fn(scene.params, jax.random.PRNGKey(0)); img.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 2
    for i in range(n):
        img, z = fn(scene.params, jax.random.PRNGKey(i)); img.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:42s} {dt*1000:9.1f} ms   (compile {compile_s:.0f}s)")

run("default (cluster)", RenderConfig())
run("visits=8", RenderConfig(bvh_visits=8))
run("visits=32", RenderConfig(bvh_visits=32))
run("cluster=128", RenderConfig(bvh_cluster=128))
