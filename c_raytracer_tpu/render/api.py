"""Top-level render API: primary rays → tiled wavefront → image.

``make_renderer`` builds a jitted function closed over the static scene
topology and config (jit constants), taking only the differentiable
SceneParams and a PRNG key — so ``jax.grad`` w.r.t. every scene parameter
falls out directly (the BASELINE north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render.camera import primary_rays
from c_raytracer_tpu.render.config import RenderConfig
from c_raytracer_tpu.render.integrator import render_wavefront
from c_raytracer_tpu.scene import types as T


def make_renderer(static: T.SceneStatic, cfg: RenderConfig,
                  resx: int, resy: int, *, jit: bool = True,
                  with_stats: bool = False):
    """Build ``render_fn(params, key) -> (image (resy,resx,3), z (resy,resx))``.

    The image is linear float32 radiance (the reference's raster before
    8-bit quantization, image.c:45).  Pixels are processed in tiles of
    cfg.tile_size via ``lax.map`` — the wavefront analog of the reference's
    OpenMP row split (render.c:349-351).
    """

    n_pixels = resx * resy
    tile_cfg = cfg.tile_size
    if tile_cfg is None:
        # auto (see RenderConfig.tile_size): small tiles let the per-tile
        # dead-round cond skip mostly-dead bounce rounds on cluster scenes
        from c_raytracer_tpu.accel.intersect import AUTO_THRESHOLD
        cluster_scene = (static.n_triangles >= AUTO_THRESHOLD
                         and cfg.accel != "none")
        tile_cfg = 2048 if cluster_scene else 65536
    tile = min(tile_cfg, n_pixels)
    # pad pixel count to a whole number of tiles
    n_tiles = -(-n_pixels // tile)
    pad = n_tiles * tile - n_pixels

    def render_fn(params: T.SceneParams, key: jax.Array):
        ds = G.device_scene(params, static)
        o, d = primary_rays(params.camera, resx, resy)
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        o = o.reshape(n_tiles, tile, 3)
        d = d.reshape(n_tiles, tile, 3)
        keys = jax.random.split(key, n_tiles)

        def one_tile(args):
            to, td, tkey = args
            return render_wavefront(ds, static, cfg, tkey, to, td,
                                    with_stats=with_stats)

        if n_tiles == 1:
            out = one_tile((o[0], d[0], keys[0]))
            out = jax.tree.map(lambda x: x[None], out)
        else:
            out = jax.lax.map(one_tile, (o, d, keys))
        color, z = out[0], out[1]
        color = color.reshape(-1, 3)[:n_pixels].reshape(resy, resx, 3)
        z = z.reshape(-1)[:n_pixels].reshape(resy, resx)
        if with_stats:
            stats = jax.tree.map(lambda x: jnp.sum(x), out[2])
            return color, z, stats
        return color, z

    return jax.jit(render_fn) if jit else render_fn


def render(scene: T.Scene, cfg: RenderConfig, resx: int, resy: int,
           key=None, *, jit: bool = True):
    """Convenience: render a Scene bundle; returns (image, zbuffer)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    fn = make_renderer(scene.static, cfg, resx, resy, jit=jit)
    return fn(scene.params, key)
