import jax
from c_raytracer_tpu.accel import reorder_scene
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene
scene = reorder_scene(load_scene("/root/reference/scenes/scene4.json"))
cfg = RenderConfig(bvh_visits=8)
fn = make_renderer(scene.static, cfg, 256, 256)
img, z = fn(scene.params, jax.random.PRNGKey(0)); img.block_until_ready()
jax.profiler.start_trace("/tmp/jx4")
img, z = fn(scene.params, jax.random.PRNGKey(1)); img.block_until_ready()
jax.profiler.stop_trace()
print("done")
