import jax, jax.numpy as jnp
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene
scene = load_scene("/root/reference/scenes/scene1.json")
fn = make_renderer(scene.static, RenderConfig(), 256, 256, jit=False)
def loss(params, key):
    img, _ = fn(params, key)
    return jnp.mean(img * img)
g = jax.jit(jax.grad(loss))
out = g(scene.params, jax.random.PRNGKey(0)); jax.block_until_ready(out)
import time
t0 = time.perf_counter()
for i in range(3):
    out = g(scene.params, jax.random.PRNGKey(i))
jax.block_until_ready(out)
print("fwdbwd", (time.perf_counter()-t0)/3)
jax.profiler.start_trace("/tmp/jxb")
out = g(scene.params, jax.random.PRNGKey(9)); jax.block_until_ready(out)
jax.profiler.stop_trace()
