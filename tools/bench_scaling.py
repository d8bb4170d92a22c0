"""Scaling benchmark: rays/s vs device count on a (px, sp) mesh.

The BASELINE north star asks for >90% linear rays/s scaling 1 -> N.  Real
multi-chip hardware isn't attached to this box, so the harness runs on an
N-device virtual CPU mesh by default (identical sharding/collective
program; run with JAX_PLATFORMS= and real chips for hardware numbers —
the program is the same, XLA just lowers the collectives to ICI).

Note: virtual CPU devices share the host's cores, so wall-clock on CPU
does NOT show the speedup — this harness instead verifies that the sharded
program partitions (no accidental replication of the pixel axis: per-device
HLO shapes shrink with N) and reports per-N wall clock for reference.

Usage: python tools/bench_scaling.py [N ...]   (default 1 2 4 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(counts):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(counts)}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from c_raytracer_tpu.parallel import make_mesh
    from c_raytracer_tpu.parallel.render_sharded import make_sharded_renderer
    from c_raytracer_tpu.render import RenderConfig
    from c_raytracer_tpu.scene import load_scene

    scene = load_scene("/root/reference/scenes/scene1.json")
    cfg = RenderConfig(max_bounces=4, rounds=5)
    res = 256

    results = []
    for n in counts:
        mesh = make_mesh(n_px=n, n_sp=1, devices=jax.devices()[:n])
        fn = make_sharded_renderer(scene.static, cfg, res, res, mesh)
        # partitioning proof: per-device temp memory of the compiled
        # program must shrink ~1/N (wall-clock on shared-core virtual CPU
        # devices shows nothing; compiled buffer sizes do).  The same
        # program on real chips lowers the identical sharding to ICI.
        ma = fn.lower(scene.params,
                      jax.random.PRNGKey(0)).compile().memory_analysis()
        img, z = fn(scene.params, jax.random.PRNGKey(0))
        img.block_until_ready()
        t0 = time.perf_counter()
        img, z = fn(scene.params, jax.random.PRNGKey(1))
        img.block_until_ready()
        dt = time.perf_counter() - t0
        results.append({"devices": n, "seconds": round(dt, 4),
                        "temp_bytes_per_device": int(ma.temp_size_in_bytes),
                        "argument_bytes_per_device":
                            int(ma.argument_size_in_bytes)})
        print(json.dumps(results[-1]), flush=True)

    base = results[0]["seconds"]
    base_mem = results[0]["temp_bytes_per_device"]
    for r in results:
        r["speedup"] = round(base / r["seconds"], 2)
        r["efficiency"] = round(r["speedup"] / r["devices"], 3)
        r["mem_shrink"] = round(base_mem / max(r["temp_bytes_per_device"], 1),
                                2)
    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    main(counts)
