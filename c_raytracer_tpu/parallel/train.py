"""Differentiable-rendering training step.

The renderer's "training" workload (BASELINE north star): every scene
parameter — sphere centers/radii, triangle vertices, material coefficients,
light intensities, camera — is a weight; the loss is pixel L2 against a
target image; gradients are averaged across the mesh (XLA inserts the
all-reduce from the replicated-param sharding, overlapping it with the
backward bounce sweep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from c_raytracer_tpu.parallel.render_sharded import make_sharded_renderer
from c_raytracer_tpu.render.config import RenderConfig
from c_raytracer_tpu.scene import types as T


def make_train_step(static: T.SceneStatic, cfg: RenderConfig,
                    resx: int, resy: int, mesh: Mesh, *,
                    learning_rate: float = 1e-2, jit: bool = True,
                    with_grads: bool = False):
    """Build ``step(params, key, target) -> (new_params, loss)``.

    Plain SGD on the SceneParams pytree; swap in optax by taking
    ``loss_and_grad`` below.  ``with_grads=True`` appends the raw gradient
    pytree to the return value — post-SGD float motion is NOT a usable
    pass criterion (tiny grads underflow the f32 ulp of O(1) params), so
    gates and tests must assert on the gradients themselves.
    """
    renderer = make_sharded_renderer(static, cfg, resx, resy, mesh,
                                     jit=False)

    def loss_fn(params: T.SceneParams, key, target):
        img, _ = renderer(params, key)
        return jnp.mean((img - target) ** 2)

    loss_and_grad = jax.value_and_grad(loss_fn)

    def step(params: T.SceneParams, key, target):
        loss, grads = loss_and_grad(params, key, target)
        lr = jnp.float32(learning_rate)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        if with_grads:
            return new_params, loss, grads
        return new_params, loss

    if not jit:
        return step
    replicated = NamedSharding(mesh, P())
    outs = (None, replicated, None) if with_grads else (None, replicated)
    return jax.jit(step, out_shardings=outs)


def loss_and_grad_fn(static, cfg, resx, resy, mesh):
    """Expose loss+grad alone (used by tests and benchmarks)."""
    renderer = make_sharded_renderer(static, cfg, resx, resy, mesh,
                                     jit=False)

    def loss_fn(params, key, target):
        img, _ = renderer(params, key)
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss_fn)
