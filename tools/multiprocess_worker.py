"""Worker for the 2-process distributed smoke test (SURVEY.md §2.5
communication-backend row: ``jax.distributed.initialize`` + XLA collectives
across processes — the DCN codepath, exercised on localhost CPU).

Each process owns 2 virtual CPU devices; the 4-device global mesh renders
scene1 sharded over ``px`` and runs one gradient step with the loss (and
therefore every scene-parameter gradient) psum-reduced across processes.

Usage (spawned by tests/test_distributed.py, or by hand):
    python tools/multiprocess_worker.py <coordinator> <num_procs> <proc_id>

Prints one JSON line; exit 0 on success.
"""

from __future__ import annotations

import json
import os
import sys


def main(coordinator: str, num_processes: int, process_id: int) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from c_raytracer_tpu.parallel import make_mesh, make_train_step
    from c_raytracer_tpu.parallel.render_sharded import make_sharded_renderer
    from c_raytracer_tpu.render import RenderConfig
    from c_raytracer_tpu.scene import load_scene

    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 2 * num_processes, jax.devices()
    assert len(jax.local_devices()) == 2

    scene = load_scene("/root/reference/scenes/scene1.json")
    static = dataclasses.replace(
        scene.static,
        num_lights=tuple(min(n, 2) for n in scene.static.num_lights))
    cfg = RenderConfig(max_bounces=2, rounds=3, light_chunk=2)

    mesh = make_mesh(n_px=2 * num_processes, n_sp=1)
    fn = make_sharded_renderer(static, cfg, 16, 16, mesh)
    img, z = fn(scene.params, jax.random.PRNGKey(0))
    # out_shardings replicate the image: every process holds the full frame
    img_local = np.asarray(jax.device_get(img.addressable_shards[0].data))
    ok_render = bool(np.isfinite(img_local).all()) and img_local.max() > 0

    step = make_train_step(static, cfg, 16, 16, mesh, learning_rate=1e-2)
    target = jnp.zeros((16, 16, 3))
    p1, loss1 = step(scene.params, jax.random.PRNGKey(1), target)
    ok_train = bool(np.isfinite(float(loss1)))
    ok_params = all(bool(jnp.all(jnp.isfinite(leaf)))
                    for leaf in jax.tree.leaves(p1))

    print(json.dumps({
        "process_id": process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "render_checksum": float(img_local.sum()),
        "loss": float(loss1),
        "ok": ok_render and ok_train and ok_params,
    }), flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3])))
