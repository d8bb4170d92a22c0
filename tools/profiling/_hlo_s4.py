import jax
from c_raytracer_tpu.accel import reorder_scene
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene
scene = reorder_scene(load_scene("/root/reference/scenes/scene4.json"))
fn = make_renderer(scene.static, RenderConfig(bvh_visits=8), 256, 256, jit=False)
txt = jax.jit(fn).lower(scene.params, jax.random.PRNGKey(0)).compile().as_text()
open("/tmp/s4_hlo.txt","w").write(txt)
print(len(txt))
