"""Acceleration spill policy: measure truncation, prove exhaustiveness,
auto-raise knobs.

The cluster sweep (traverse.py) bounds per-ray work with two budgets: the
nearest-``visits`` clusters per query and (for opaque soft shadows) a
``shortlist`` of K candidate triangles per pixel.  Both are truncations of
the reference's exhaustive BVH walk (accel.c:322-387).  The policy:

* **closest hit** — sorted nearest-first visits with best-t pruning.  A
  spilled cluster (overlap rank > V) can only steal the hit if it is
  nearer than the best found, which nearest-first ordering makes rare —
  but rays *inside* a mesh (transparent scenes) see many zero-entry
  clusters and need a much larger V (scene5: v=16 exact on primaries,
  secondary refraction rays needed v≈128; tools/profiling/s5_diag.py).
* **shadows, opaque scene** — any-hit: a dropped far blocker only matters
  when no nearer blocker hits.  Shortlist K=32 is exact on every opaque
  reference scene (pinned by goldens + TestShadowShortlist).
* **shadows, transparent scene** — the kt tint is a product over ALL
  blockers along the segment; any truncation leaks light (measured 22×
  radiance error on scene5 at the round-2 defaults).  The auto defaults
  (config.py) therefore disable the shortlist and raise shadow visits for
  transparent scenes.
* **proof obligation** — ``spill == 0`` proves a sweep was exhaustive
  (bit-exact vs brute force).  ``spill_report`` measures it for a given
  scene+config on the real camera rays; ``tuned_config`` raises the
  budgets until the *measured* spill is zero (capped at the cluster
  count), i.e. provably-exact direct queries.  Secondary-bounce queries
  are not individually provable this way; ``tuned_config`` applies the
  measured primary budget times a headroom factor, and ``accel='none'``
  remains the always-exact fallback.
* **runtime guard (always on)** — every sweep that can truncate counts
  its OWN truncation on every render: the union sweep's per-pixel union
  spill (``shadow_union_visit_order``), the per_ray sweep's in-range
  segment spill (``any_hit_tint_clusters(with_spill=True)``) and the
  closest-hit sweeps' overlap-rank spill
  (``closest_hit_clusters(with_spill=True)``) — including GI-child
  shades and traces inside ``_gi_path``.  The integrator carries the
  frame maxima in the stats vector (``shadow_spill_max``,
  ``visit_spill_max``) and the CLI warns loudly on EVERY invocation
  (with or without ``--stats``) when either is nonzero — silent kt
  truncation cannot ship an unreported frame on any engine path
  (plain, ``--stats``, or progressive).  The shared-mode capsule list
  and the shortlist carry no runtime counter (opaque-scene policy
  above); use ``--accel-report`` for those.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.accel import traverse
from c_raytracer_tpu.accel.intersect import make_intersector
from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render.camera import primary_rays


def _ceil8(x: int) -> int:
    return max(8, -(-int(x) // 8) * 8)


def spill_report(scene, cfg, resx: int, resy: int) -> dict:
    """Measure visit/shortlist spill on the scene's own camera rays.

    Returns a dict: ``closest`` (primary-ray cluster overlap vs
    bvh_visits) and ``shadow`` (per-emitter capsule overlap at primary hit
    points vs the resolved shadow budgets).  All counts are exact — the
    probe runs the same slab/capsule tests as the sweeps, with no
    truncation."""
    static = scene.static
    ds = G.device_scene(scene.params, static)
    ix = make_intersector(ds, static, cfg)
    if ix.clusters is None:
        return {"accel": "none", "closest": None, "shadow": []}
    cs = ix.clusters
    K = cs.lo.shape[0]

    o_a, d_a = primary_rays(scene.params.camera, resx, resy)
    any_transp = any(static.is_transparent)

    @jax.jit
    def probe():
        n_ov, spill = traverse.spill_counts(
            cs, o_a, d_a, cfg.resolved_visits(any_transp))
        o = v3m.from_aos(o_a)
        d = v3m.from_aos(d_a)
        t, gid, mat, _ = ix.closest(o, d)
        hit = gid >= 0
        hp = o + d * jnp.where(hit, t, 1.0)
        return n_ov, spill, hit, v3m.to_aos(hp)

    n_ov, spill, hit, hp_a = probe()
    hitm = np.asarray(hit)
    mode = cfg.resolved_shadow_mode(any_transp)
    if mode == "union":
        # union mode sweeps its own cluster set with the union budget;
        # the capsule count on THAT set is a conservative upper bound on
        # any per-pixel sample union (every sample segment lies inside
        # the capsule), so capsule spill == 0 proves the budget covers
        sv = cfg.resolved_union_visits(any_transp)
        k_short = 0
        cs_sh = ix._shadow_cs
    else:
        sv = cfg.resolved_shadow_visits(any_transp)
        k_short = cfg.resolved_shadow_shortlist(any_transp)
        cs_sh = cs

    shadow = []
    for egid in static.emitter_prims:
        if static.num_lights[egid] == 0:
            continue
        elo, ehi = ix.emitter_bounds(int(egid))
        cl_sp, tri_sp = jax.jit(
            lambda elo=elo, ehi=ehi: traverse.shadow_spill_counts(
                cs_sh, jnp.asarray(hp_a), elo, ehi, sv, k_short))()
        cl_sp = np.asarray(cl_sp)[hitm]
        tri_sp = np.asarray(tri_sp)[hitm]
        shadow.append(dict(
            egid=int(egid),
            visits=sv, shortlist=k_short,
            cluster_spill_max=int(cl_sp.max()) if cl_sp.size else 0,
            cluster_spill_pixels=int((cl_sp > 0).sum()),
            tri_spill_max=int(tri_sp.max()) if tri_sp.size else 0,
            tri_spill_pixels=int((tri_sp > 0).sum()),
        ))

    n_ov = np.asarray(n_ov)
    spill = np.asarray(spill)
    return {
        "accel": "cluster",
        "shadow_mode": mode,
        "n_clusters": int(K),
        "closest": dict(
            visits=cfg.resolved_visits(any_transp),
            overlap_max=int(n_ov.max()),
            overlap_mean=float(n_ov.mean()),
            spill_max=int(spill.max()),
            spill_rays=int((spill > 0).sum()),
        ),
        "shadow": shadow,
    }


def tuned_config(scene, cfg, resx: int, resy: int, *,
                 headroom: float = 2.0, max_visits: int = 1024):
    """Return a config whose budgets cover the MEASURED overlap counts.

    ``bvh_visits`` is raised to headroom × the max primary-ray cluster
    overlap (secondary rays — especially inside transparent meshes — see
    more zero-entry clusters than primaries, hence the headroom;
    scene5 measured primaries ≤ 59 overlaps while refraction chains
    needed ~128).  Shadow visits are raised to the max capsule overlap at
    the primary hit points — an upper bound on true segment blockers, so
    shadow sweeps become provably exhaustive.  Budgets are capped at the
    cluster count (a budget of K IS brute force over clusters)."""
    rep = spill_report(scene, cfg, resx, resy)
    if rep["closest"] is None:
        return cfg, rep
    K = rep["n_clusters"]
    v = min(max_visits, K,
            _ceil8(rep["closest"]["overlap_max"] * headroom))
    v = max(cfg.resolved_visits(any(scene.static.is_transparent)), v)
    sv_needed = max(
        (s["cluster_spill_max"] + s["visits"] for s in rep["shadow"]),
        default=v)
    sv = min(max_visits, K, max(_ceil8(sv_needed), v))
    any_transp = any(scene.static.is_transparent)
    k_short = 0 if any_transp else cfg.resolved_shadow_shortlist(False)
    tuned = dataclasses.replace(
        cfg, bvh_visits=v, bvh_shadow_visits=sv,
        bvh_shadow_shortlist=k_short)
    return tuned, rep
