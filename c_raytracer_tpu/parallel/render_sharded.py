"""Mesh-sharded rendering: pixel tiles over the ``px`` axis, Monte-Carlo
samples over the ``sp`` axis.

Idiomatic pjit/auto-SPMD: scene params are replicated (they're tiny), the
primary-ray buffers carry a NamedSharding over ``px``, and the sp-axis mean
lowers to a psum over ICI.  No manual collectives — XLA inserts them from
the sharding constraints (the scaling-book recipe).

Sample-parallel semantics: n_sp independent renders with split keys are
averaged.  Each local render uses spp/n_sp primary GI samples, so the GI
estimate equals the reference's -n spp estimand; direct lighting is
re-sampled per replica, which only lowers its variance (same mean).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render.camera import primary_rays
from c_raytracer_tpu.render.config import GI_PATH, RenderConfig
from c_raytracer_tpu.render.integrator import render_wavefront
from c_raytracer_tpu.scene import types as T


def make_sharded_renderer(static: T.SceneStatic, cfg: RenderConfig,
                          resx: int, resy: int, mesh: Mesh, *,
                          jit: bool = True):
    """Build ``fn(params, key) -> (image, z)`` sharded over the mesh.

    Mesh axes: ``px`` pixel tiles, ``sp`` Monte-Carlo samples, and (when
    present and >1) ``pr`` primitive ranges — the triangle arrays are
    split into contiguous shards with all-reduced hit folds
    (geometry/sharded.py, SURVEY §2.5 row 3) instead of replicated."""
    n_px = mesh.shape["px"]
    n_sp = mesh.shape["sp"]
    n_pr = mesh.shape.get("pr", 1)

    if cfg.gi_model == GI_PATH and cfg.samples_per_pixel >= n_sp:
        spp_local = cfg.samples_per_pixel // n_sp
    else:
        spp_local = cfg.samples_per_pixel
    local_cfg = dataclasses.replace(cfg, samples_per_pixel=max(spp_local, 1))

    n_pixels = resx * resy
    # pad the pixel axis to a multiple of the px mesh axis
    pad = (-n_pixels) % n_px

    ray_sharding = NamedSharding(mesh, P("px", None))
    sp_sharding = NamedSharding(mesh, P("sp", "px", None))

    def render_fn(params: T.SceneParams, key: jax.Array):
        ds = G.device_scene(params, static)
        shards = None
        if n_pr > 1 and static.n_triangles:
            from c_raytracer_tpu.geometry import sharded
            shards = sharded.shard_triangles(
                ds, static, n_pr, tri_chunk=local_cfg.tri_chunk,
                sharding=NamedSharding(mesh, P("pr")))
        o, d = primary_rays(params.camera, resx, resy)
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        o = jax.lax.with_sharding_constraint(o, ray_sharding)
        d = jax.lax.with_sharding_constraint(d, ray_sharding)

        keys = jax.random.split(key, n_sp)

        def one_sample(k):
            return render_wavefront(ds, static, local_cfg, k, o, d,
                                    shards=shards)

        colors, zs = jax.vmap(one_sample)(keys)   # (n_sp, P, 3), (n_sp, P)
        colors = jax.lax.with_sharding_constraint(colors, sp_sharding)
        color = jnp.mean(colors, axis=0)           # psum over sp
        z = zs[0]                                  # deterministic primary t

        color = color[:n_pixels].reshape(resy, resx, 3)
        z = z[:n_pixels].reshape(resy, resx)
        return color, z

    if not jit:
        return render_fn
    return jax.jit(
        render_fn,
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
