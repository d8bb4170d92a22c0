"""On-chip A/B: closest-hit ray compaction (config.closest_compact) on
scene4 512² — the scene4 analogue of union pixel compaction.  Also prints
the per-chunk visit-list length distribution that decides whether the
sorted sub-blocks can exit early (the skew the lever depends on).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profiling/s4_closest_compact_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.accel import reorder_scene, traverse
from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene


def frame_seconds(scene, cfg, res=512, iters=3):
    fn = make_renderer(scene.static, cfg, res, res)
    img, z = fn(scene.params, jax.random.PRNGKey(0))
    img.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        img, z = fn(scene.params, jax.random.PRNGKey(i))
        img.block_until_ready()
    return (time.perf_counter() - t0) / iters, np.asarray(img)


def skew_report(scene, cfg, res=512):
    """Visit-list length distribution for the PRIMARY rays (bounce-round
    rays are mostly dead and only sharpen the skew)."""
    from c_raytracer_tpu.accel.intersect import make_intersector
    from c_raytracer_tpu.render.camera import primary_rays

    ds = G.device_scene(scene.params, scene.static)
    ix = make_intersector(ds, scene.static, cfg)
    cs = ix.clusters
    o2, d2 = primary_rays(scene.params.camera, res, res)
    o2 = o2[::8]
    d2 = d2[::8]   # strided: the first rows alone are sky
    _, ok, _, _ = jax.jit(
        lambda o, d: traverse._visit_order(cs, o, d, 16))(o2, d2)
    n = np.asarray(jnp.sum(ok, axis=1))
    print("visit-list lengths: mean %.2f p50 %d p90 %d p99 %d max %d"
          % (n.mean(), *np.percentile(n, [50, 90, 99]).astype(int),
             n.max()))


def main():
    scene = reorder_scene(
        load_scene("/root/reference/scenes/scene4.json",
                   mesh_root="/root/reference"))
    try:
        skew_report(scene, RenderConfig())
    except Exception as e:  # noqa: BLE001 — report-only probe
        print("skew probe failed:", e)
    dt_off, img_off = frame_seconds(scene, RenderConfig(
        closest_compact="off"))
    print(f"scene4 512^2 closest_compact=off: {dt_off:.4f} s")
    dt_on, img_on = frame_seconds(scene, RenderConfig(
        closest_compact="on"))
    print(f"scene4 512^2 closest_compact=on:  {dt_on:.4f} s")
    same = np.array_equal(img_off, img_on)
    print("bit-identical:", same)


if __name__ == "__main__":
    main()
