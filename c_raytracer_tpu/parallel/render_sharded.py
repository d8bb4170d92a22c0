"""Mesh-sharded rendering: pixel tiles over the ``px`` axis, Monte-Carlo
samples over the ``sp`` axis, primitive ranges over ``pr``.

Idiomatic pjit/auto-SPMD: scene params are replicated (they're tiny), the
primary-ray buffers carry a NamedSharding over ``px``, and the sp-axis mean
lowers to a psum over ICI.  No manual collectives — XLA inserts them from
the sharding constraints (the scaling-book recipe).

The pixel axis is tiled exactly like the single-chip path (render/api.py):
tiles are GLOBAL — same decomposition, same per-tile PRNG keys — and the
``px`` sharding applies to the pixel axis *within* each tile, so the
sharded program is the single-chip tiled program with sharded arrays.
That keeps the per-tile dead-round ``lax.cond`` (the 10× mesh-scene win:
secondary rounds are >90% dead lanes and live pixels cluster spatially)
and makes sharded output bit-identical to single-chip output for n_sp=1.
The cond's ``jnp.any(live)`` over a sharded buffer lowers to an or-reduce
over ICI — a uniform predicate, which is what SPMD control flow needs.

Sample-parallel semantics: n_sp independent renders with split keys are
averaged.  Each local render uses spp/n_sp primary GI samples, so the GI
estimate equals the reference's -n spp estimand; direct lighting is
re-sampled per replica, which only lowers its variance (same mean).
(For n_sp>1 the dead-round cond is vmapped over samples, which batches
its predicate and makes XLA evaluate the live branch unconditionally —
correct, just without the skip; the skip matters for n_sp=1 mesh scenes.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from c_raytracer_tpu.accel.intersect import AUTO_THRESHOLD
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
    split into contiguous shards (geometry/sharded.py, SURVEY §2.5 row 3)
    and each device sweeps per-shard Morton clusters
    (accel/traverse.py pack_clusters_sharded) with all-reduced hit folds."""
    n_px = mesh.shape["px"]
    n_sp = mesh.shape["sp"]
    n_pr = mesh.shape.get("pr", 1)

    if cfg.gi_model == GI_PATH and cfg.samples_per_pixel >= n_sp:
        spp_local = cfg.samples_per_pixel // n_sp
    else:
        spp_local = cfg.samples_per_pixel
    local_cfg = dataclasses.replace(cfg, samples_per_pixel=max(spp_local, 1))

    n_pixels = resx * resy
    # auto-tile exactly like render/api.py (same tile size, same count)
    tile_cfg = cfg.tile_size
    if tile_cfg is None:
        cluster_scene = (static.n_triangles >= AUTO_THRESHOLD
                         and cfg.accel != "none")
        tile_cfg = 2048 if cluster_scene else 65536
    tile = min(tile_cfg, n_pixels)
    n_tiles = -(-n_pixels // tile)
    pad = n_tiles * tile - n_pixels

    tile_sharding = NamedSharding(mesh, P(None, "px", None))
    out_sharding = NamedSharding(mesh, P("sp", None, "px", None))

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
        o = o.reshape(n_tiles, tile, 3)
        d = d.reshape(n_tiles, tile, 3)
        o = jax.lax.with_sharding_constraint(o, tile_sharding)
        d = jax.lax.with_sharding_constraint(d, tile_sharding)

        def one_sample(k):
            tkeys = jax.random.split(k, n_tiles)

            def one_tile(args):
                to, td, tkey = args
                return render_wavefront(ds, static, local_cfg, tkey, to,
                                        td, shards=shards)

            if n_tiles == 1:
                out = one_tile((o[0], d[0], tkeys[0]))
                return jax.tree.map(lambda x: x[None], out)
            return jax.lax.map(one_tile, (o, d, tkeys))

        # n_sp == 1 reuses the caller's key directly so the per-tile key
        # stream is identical to the single-chip path (bit-exact parity)
        keys = jax.random.split(key, n_sp) if n_sp > 1 else key[None]
        colors, zs = jax.vmap(one_sample)(keys)  # (n_sp, n_tiles, tile, 3)
        colors = jax.lax.with_sharding_constraint(colors, out_sharding)
        color = jnp.mean(colors, axis=0)           # psum over sp
        z = zs[0]                                  # deterministic primary t

        color = color.reshape(-1, 3)[:n_pixels].reshape(resy, resx, 3)
        z = z.reshape(-1)[:n_pixels].reshape(resy, resx)
        return color, z

    if not jit:
        return render_fn
    return jax.jit(
        render_fn,
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
