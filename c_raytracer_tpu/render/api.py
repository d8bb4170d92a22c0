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


def make_host_tiled_renderer(static: T.SceneStatic, cfg: RenderConfig,
                             resx: int, resy: int, *,
                             tiles_per_call: int = 1):
    """Forward renderer that issues ONE device program per tile batch.

    Same tile decomposition and per-tile key stream as ``make_renderer``
    (so the stitched image is bit-identical to the single-program render
    at the same cfg.tile_size), but the host loops over tile batches with
    a separate jit call each.  Use when a single whole-frame program would
    run for minutes — remote-attached accelerators (the axon tunnel) kill
    long device calls, and a host-side loop also bounds device memory and
    lets a driver checkpoint between batches.  Forward only (no grads
    across the host loop)."""
    n_pixels = resx * resy
    tile_cfg = cfg.tile_size
    if tile_cfg is None:
        from c_raytracer_tpu.accel.intersect import AUTO_THRESHOLD
        cluster_scene = (static.n_triangles >= AUTO_THRESHOLD
                         and cfg.accel != "none")
        tile_cfg = 2048 if cluster_scene else 65536
    tile = min(tile_cfg, n_pixels)
    n_tiles = -(-n_pixels // tile)
    pad = n_tiles * tile - n_pixels

    @jax.jit
    def prep(params: T.SceneParams):
        o, d = primary_rays(params.camera, resx, resy)
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        return (o.reshape(n_tiles, tile, 3), d.reshape(n_tiles, tile, 3))

    @jax.jit
    def run_batch(params: T.SceneParams, o_b, d_b, keys_b):
        ds = G.device_scene(params, static)

        def one_tile(args):
            to, td, tkey = args
            return render_wavefront(ds, static, cfg, tkey, to, td)

        if tiles_per_call == 1:
            out = one_tile((o_b[0], d_b[0], keys_b[0]))
            return jax.tree.map(lambda x: x[None], out)
        return jax.lax.map(one_tile, (o_b, d_b, keys_b))

    import numpy as np

    def render_fn(params: T.SceneParams, key: jax.Array):
        o_t, d_t = prep(params)
        keys = jax.random.split(key, n_tiles)
        colors, zs = [], []
        for b0 in range(0, n_tiles, tiles_per_call):
            b1 = min(b0 + tiles_per_call, n_tiles)
            c, z = run_batch(params, o_t[b0:b1], d_t[b0:b1], keys[b0:b1])
            colors.append(np.asarray(c))
            zs.append(np.asarray(z))
        color = np.concatenate(colors).reshape(-1, 3)[:n_pixels]
        z = np.concatenate(zs).reshape(-1)[:n_pixels]
        return (color.reshape(resy, resx, 3), z.reshape(resy, resx))

    return render_fn


def render(scene: T.Scene, cfg: RenderConfig, resx: int, resy: int,
           key=None, *, jit: bool = True):
    """Convenience: render a Scene bundle; returns (image, zbuffer)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    fn = make_renderer(scene.static, cfg, resx, resy, jit=jit)
    return fn(scene.params, key)
