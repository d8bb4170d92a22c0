"""The BASELINE flagship config, end to end (BASELINE.json configs[4]):
scene5 (glass dragon-class mesh, ~100k tris), path-traced global
illumination at 256 spp, differentiable materials.

Three phases, each recorded as one JSON line:

1. **forward** — host-tiled path-traced render at (res, spp, lights):
   the exact transparent pipeline (union shadow sweeps, spill-guarded)
   at the FULL BASELINE spp via the exact spp-chunk composition
   (render_spp_chunked): spp_chunks passes of spp/spp_chunks samples,
   each pass one bounded device program per tile, whose host mean equals
   the single-call render bit-for-bit up to summation order
   (tests/test_progressive.py::TestSppChunked).  The runtime truncation
   guard (shadow/visit spill maxima) is recorded with the frame.
2. **train** — a few SGD steps on the glass material's kt against a
   target frame, gradients through make_host_tiled_value_and_grad (the
   round-4 differentiable host-tiled path): loss must decrease.

Usage:  python tools/flagship_s5.py [res] [spp] [lights] [train_res] [chunks]
Defaults (64, 256, 100, 24, 4): the full BASELINE spp as 4×64-spp
passes — each device call stays inside the axon tunnel's kill budget.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.accel.build import reorder_scene
from c_raytracer_tpu.render import (RenderConfig,
                                    make_host_tiled_renderer,
                                    make_host_tiled_value_and_grad,
                                    render_spp_chunked)
from c_raytracer_tpu.scene import load_scene

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 256
NL = int(sys.argv[3]) if len(sys.argv) > 3 else 100
TRAIN_RES = int(sys.argv[4]) if len(sys.argv) > 4 else 24
CHUNKS = int(sys.argv[5]) if len(sys.argv) > 5 else max(1, SPP // 64)


def cap_lights(scene, nl):
    lights = tuple(min(n, nl) for n in scene.static.num_lights)
    return dataclasses.replace(
        scene, static=dataclasses.replace(scene.static, num_lights=lights))


def main():
    scene = cap_lights(
        reorder_scene(load_scene("/root/reference/scenes/scene5.json")), NL)
    print(f"scene5: {scene.static.n_triangles} tris, lights capped {NL}, "
          f"spp {SPP} as {CHUNKS} chunks", file=sys.stderr)

    # ---- phase 1: path-traced forward at full spp, host-tiled ---------
    # small tiles: spp hemisphere samples each shade full direct lighting
    # (render.c:272-277), so a 2048-px tile call would exceed the axon
    # tunnel's device-call budget at spp 64.
    # Exactness-first budgets: the default 192/64 budgets are exact for
    # PRIMARY scene5 work, but path-GI child shades originate inside the
    # glass mesh and see deeper unions — the always-on runtime guard
    # measured shadow spill 73 / closest spill 29 there (round 5), so
    # the flagship config ships the guard-derived budgets (dead-step
    # conds make the extra slots nearly free; spill 0 in the output
    # proves the frame exhaustive)
    cfg = RenderConfig(gi_model="path", samples_per_pixel=SPP,
                       tile_size=512, bvh_shadow_visits=288,
                       bvh_visits=104)
    t0 = time.perf_counter()
    img, z, stats = render_spp_chunked(
        scene, cfg, RES, RES, jax.random.PRNGKey(0), spp_chunks=CHUNKS,
        host_tiled=True, with_stats=True,
        log=lambda m, *a: print(m % a, file=sys.stderr))
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(img))
    print(json.dumps({
        "phase": "forward", "res": RES, "spp": SPP, "lights": NL,
        "spp_chunks": CHUNKS,
        "seconds": round(dt, 2), "total_radiance": float(np.sum(img)),
        "mean_radiance": float(np.mean(img)),
        "shadow_spill_max": stats.get("shadow_spill_max", 0.0),
        "visit_spill_max": stats.get("visit_spill_max", 0.0),
        "total_rays": stats.get("main_rays", 0.0)
        + stats.get("shadow_rays", 0.0) + stats.get("gi_rays", 0.0),
    }), flush=True)

    # ---- phase 2: differentiable materials, host-tiled grads ---------
    tcfg = RenderConfig(gi_model="path", samples_per_pixel=4,
                        light_chunk=8)
    tscene = cap_lights(scene, min(NL, 24))
    key = jax.random.PRNGKey(1)

    # target: the same scene with a different glass kt — recover it by
    # descending on the materials (the "differentiable materials" claim)
    kt0 = np.asarray(tscene.params.materials.kt)
    kt_target = kt0.copy()
    kt_target[1] = [0.6, 0.6, 0.9]          # glass material id 1 (scene5)
    target_params = dataclasses.replace(
        tscene.params, materials=dataclasses.replace(
            tscene.params.materials, kt=jnp.asarray(kt_target)))
    tfwd = make_host_tiled_renderer(tscene.static, tcfg, TRAIN_RES,
                                    TRAIN_RES)
    target = np.asarray(tfwd(target_params, key)[0]).reshape(-1, 3)

    def pixel_loss(color, z, tgt):
        return jnp.sum((color - tgt) ** 2, axis=-1)

    vg = make_host_tiled_value_and_grad(tscene.static, tcfg, TRAIN_RES,
                                        TRAIN_RES, pixel_loss)
    params = tscene.params
    losses = []
    t0 = time.perf_counter()
    for i in range(6):
        loss, g = vg(params, key, target=jnp.asarray(target))
        losses.append(round(loss, 8))
        kt_g = g.materials.kt
        params = dataclasses.replace(
            params, materials=dataclasses.replace(
                params.materials,
                kt=params.materials.kt - 200.0 * kt_g))
    dt = time.perf_counter() - t0
    kt_end = np.asarray(params.materials.kt)[1]
    print(json.dumps({
        "phase": "train", "res": TRAIN_RES, "spp": 4,
        "steps": len(losses), "seconds": round(dt, 2),
        "losses": losses,
        "kt_start": [round(float(x), 3) for x in kt0[1]],
        "kt_target": [round(float(x), 3) for x in kt_target[1]],
        "kt_end": [round(float(x), 3) for x in kt_end],
        "loss_reduced": bool(losses[-1] < losses[0]),
    }), flush=True)
    assert losses[-1] < losses[0], "training must reduce the loss"


if __name__ == "__main__":
    main()
