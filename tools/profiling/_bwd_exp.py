"""fwd+bwd experiments at 256^2 scene1."""
import time, jax, jax.numpy as jnp
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene
scene = load_scene("/root/reference/scenes/scene1.json")

def measure(tag, cfg):
    fn = make_renderer(scene.static, cfg, 256, 256, jit=False)
    def loss(params, key):
        img, _ = fn(params, key)
        return jnp.mean(img * img)
    g = jax.jit(jax.grad(loss))
    out = g(scene.params, jax.random.PRNGKey(0)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = g(scene.params, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    print(f"{tag:30s} {(time.perf_counter()-t0)/3*1000:8.1f} ms")

measure("remat=True (default)", RenderConfig())
measure("remat=False", RenderConfig(remat=False))
measure("remat, lc=104", RenderConfig(light_chunk=104))
measure("remat, lc=200", RenderConfig(light_chunk=200))
