"""Device mesh construction.

The reference's only parallelism is an OpenMP row loop (render.c:349-351).
The TPU equivalent (SURVEY.md §2.5) is a 2-axis ``jax.sharding.Mesh``:

* ``px`` — data parallelism over pixel tiles (each device renders a slice
  of the ray wavefront);
* ``sp`` — sample parallelism over Monte-Carlo samples (independent
  renders averaged by a psum — the gradient-accumulation analog);
* ``pr`` — primitive-range sharding (the TP/EP analog): triangle arrays
  split into contiguous ranges, per-shard hit folds all-reduced
  (geometry/sharded.py).

Multi-host: call ``jax.distributed.initialize`` before building the mesh;
XLA routes the collectives over ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_px: int | None = None, n_sp: int = 1, n_pr: int = 1,
              devices=None) -> Mesh:
    """Create a (px, sp, pr) mesh. Defaults: all devices on the px axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_px is None:
        n_px = n // (n_sp * n_pr)
    if n_px * n_sp * n_pr != n:
        raise ValueError(
            f"mesh {n_px}x{n_sp}x{n_pr} != {n} devices")
    return Mesh(devices.reshape(n_px, n_sp, n_pr), ("px", "sp", "pr"))
