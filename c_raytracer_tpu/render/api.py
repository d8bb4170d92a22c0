"""Top-level render API: primary rays → tiled wavefront → image.

``make_renderer`` builds a jitted function closed over the static scene
topology and config (jit constants), taking only the differentiable
SceneParams and a PRNG key — so ``jax.grad`` w.r.t. every scene parameter
falls out directly (the BASELINE north star).
"""

from __future__ import annotations

import functools

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
            # counters sum over tiles; the spill guards are a MAX (worst
            # per-pixel truncation anywhere in the frame)
            stats = {k: (jnp.max(v) if k.endswith("_spill_max")
                         else jnp.sum(v)) for k, v in out[2].items()}
            return color, z, stats
        return color, z

    return jax.jit(render_fn) if jit else render_fn


def make_host_tiled_renderer(static: T.SceneStatic, cfg: RenderConfig,
                             resx: int, resy: int, *,
                             tiles_per_call: int = 1,
                             with_stats: bool = False):
    """Forward renderer that issues ONE device program per tile batch.

    Same tile decomposition and per-tile key stream as ``make_renderer``
    (so the stitched image is bit-identical to the single-program render
    at the same cfg.tile_size), but the host loops over tile batches with
    a separate jit call each.  Use when a single whole-frame program would
    run for minutes — remote-attached accelerators (the axon tunnel) kill
    long device calls, and a host-side loop also bounds device memory and
    lets a driver checkpoint between batches.  Forward only (no grads
    across the host loop).

    ``with_stats``: aggregate per-batch traced-ray counters host-side
    (sums; ``*_spill_max`` guards by max) and return them as a third
    output — the flagship runs carry the same runtime truncation guard
    as the single-program renderer."""
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
            return render_wavefront(ds, static, cfg, tkey, to, td,
                                    with_stats=with_stats)

        if tiles_per_call == 1:
            out = one_tile((o_b[0], d_b[0], keys_b[0]))
            return jax.tree.map(lambda x: x[None], out)
        return jax.lax.map(one_tile, (o_b, d_b, keys_b))

    import numpy as np

    def render_fn(params: T.SceneParams, key: jax.Array):
        o_t, d_t = prep(params)
        keys = jax.random.split(key, n_tiles)
        colors, zs = [], []
        stats = {}
        for b0 in range(0, n_tiles, tiles_per_call):
            b1 = min(b0 + tiles_per_call, n_tiles)
            out = run_batch(params, o_t[b0:b1], d_t[b0:b1], keys[b0:b1])
            colors.append(np.asarray(out[0]))
            zs.append(np.asarray(out[1]))
            if with_stats:
                for k, v in out[2].items():
                    v = (np.max(np.asarray(v)) if k.endswith("_spill_max")
                         else np.sum(np.asarray(v)))
                    stats[k] = (max(stats.get(k, 0.0), float(v))
                                if k.endswith("_spill_max")
                                else stats.get(k, 0.0) + float(v))
        color = np.concatenate(colors).reshape(-1, 3)[:n_pixels]
        z = np.concatenate(zs).reshape(-1)[:n_pixels]
        img = (color.reshape(resy, resx, 3), z.reshape(resy, resx))
        return img + (stats,) if with_stats else img

    return render_fn


def make_host_tiled_value_and_grad(static: T.SceneStatic, cfg: RenderConfig,
                                   resx: int, resy: int, pixel_loss, *,
                                   tiles_per_call: int = 1):
    """Differentiable host-tiled renderer: per-tile-batch value_and_grad,
    loss and gradients accumulated on host.

    The round-3 host-tiled renderer was forward-only, so the flagship
    differentiable transparent workload (scene5 path-traced) could not
    train once a frame exceeded one device call.  Scene params are
    replicated across tiles and the loss is a sum over pixels, so the
    whole-frame gradient is exactly the sum of per-tile-batch gradients —
    each batch a separate bounded device program (the axon tunnel kills
    long calls; also bounds residual memory to one batch's backward).

    ``pixel_loss(color (n, 3), z (n,), target_slice) -> (n,) per-pixel
    loss``; ``target_slice`` is the per-tile slice of the optional target
    pytree (leading axis = resy*resx pixels).  Padded lanes of the last
    tile are masked before the sum.

    Returns ``fn(params, key, target=None) -> (loss, grads)`` with loss a
    float and grads a SceneParams pytree equal (up to float summation
    order) to ``jax.grad`` of the same loss through ``make_renderer`` at
    the same cfg.tile_size — pinned by tests/test_render.py."""
    import numpy as np

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

    @functools.partial(jax.jit, static_argnums=(5,))
    def batch_vg(params: T.SceneParams, start, keys_b, tgt_b, mask_b,
                 n_batch_tiles):
        def batch_loss(params):
            # primary rays INSIDE the differentiated function: camera
            # gradients flow through the ray generation exactly as in
            # make_renderer (the whole-frame ray math is elementwise and
            # cheap; only this batch's slice is traced onward)
            ds = G.device_scene(params, static)
            o, d = primary_rays(params.camera, resx, resy)
            if pad:
                o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
                d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
            nb = n_batch_tiles * tile
            o_b = jax.lax.dynamic_slice_in_dim(o, start, nb, 0)
            d_b = jax.lax.dynamic_slice_in_dim(d, start, nb, 0)
            o_b = o_b.reshape(n_batch_tiles, tile, 3)
            d_b = d_b.reshape(n_batch_tiles, tile, 3)

            def one_tile(args):
                to, td, tkey = args
                return render_wavefront(ds, static, cfg, tkey, to, td)

            if n_batch_tiles == 1:
                out = one_tile((o_b[0], d_b[0], keys_b[0]))
                color, z = jax.tree.map(lambda x: x[None], out)
            else:
                color, z = jax.lax.map(one_tile, (o_b, d_b, keys_b))
            pl = pixel_loss(color.reshape(-1, 3), z.reshape(-1), tgt_b)
            return jnp.sum(jnp.where(mask_b, pl, 0.0))

        return jax.value_and_grad(batch_loss)(params)

    def fn(params: T.SceneParams, key, target=None):
        keys = jax.random.split(key, n_tiles)
        if target is not None:
            def pad_t(x):
                if pad:
                    x = jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
                return x
            target = jax.tree.map(pad_t, target)
        valid = (jnp.arange(n_tiles * tile) < n_pixels)

        loss = 0.0
        grads = None
        for b0 in range(0, n_tiles, tiles_per_call):
            b1 = min(b0 + tiles_per_call, n_tiles)
            tgt_b = (jax.tree.map(
                lambda x: x[b0 * tile:b1 * tile], target)
                if target is not None else None)
            l_b, g_b = batch_vg(params, b0 * tile, keys[b0:b1], tgt_b,
                                valid[b0 * tile:b1 * tile], b1 - b0)
            loss += float(l_b)
            grads = g_b if grads is None else jax.tree.map(
                jnp.add, grads, g_b)
        return loss, grads

    # batching note: tiles_per_call > 1 changes only how many tiles share
    # one device program, not the math — the per-tile key stream matches
    # make_renderer's, so renders stitch bit-identically
    fn.n_tiles = n_tiles
    fn.tile = tile
    return fn


def render(scene: T.Scene, cfg: RenderConfig, resx: int, resy: int,
           key=None, *, jit: bool = True):
    """Convenience: render a Scene bundle; returns (image, zbuffer)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    fn = make_renderer(scene.static, cfg, resx, resy, jit=jit)
    return fn(scene.params, key)
