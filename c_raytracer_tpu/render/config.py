"""Render configuration — the reference's CLI flag surface (main.c:35-53,
render.c:61-116) as a static dataclass.

Defaults match the reference exactly: -b 10, -a 0.01, -s phong, -g ambient,
-n 1, -l sqr, -o 1.
"""

from __future__ import annotations

import dataclasses

REFLECTION_PHONG = "phong"
REFLECTION_BLINN = "blinn"
GI_AMBIENT = "ambient"
GI_PATH = "path"
ATTEN_NONE = "none"
ATTEN_LINEAR = "lin"
ATTEN_SQUARE = "sqr"


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    max_bounces: int = 10                  # -b (render.c:54)
    min_light_intensity: float = 0.01      # -a; compared squared (render.c:55)
    reflection_model: str = REFLECTION_PHONG   # -s
    gi_model: str = GI_AMBIENT             # -g
    samples_per_pixel: int = 1             # -n (path-GI primary samples only)
    light_attenuation: str = ATTEN_SQUARE  # -l
    attenuation_offset: float = 1.0        # -o (render.c:52)

    # TPU execution shape (no reference equivalent; OpenMP row-split analog)
    rounds: int | None = None       # wavefront rounds; None -> heuristic
    stack_size: int = 8             # per-pixel pending-ray stack capacity
    tile_size: int | None = None    # pixels per wavefront tile; None ->
                                    # auto: 2048 for cluster scenes (the
                                    # per-tile dead-round cond then skips
                                    # bounce rounds in tiles whose chains
                                    # died — secondary rounds are >90% dead
                                    # lanes on mesh scenes and live pixels
                                    # cluster spatially; measured 3.1s ->
                                    # 0.78s on scene4 512², 4.3s -> 0.27s
                                    # on scene5 128²), 65536 for dense
                                    # small scenes (scene1 1024² prefers
                                    # big tiles: 330 vs 450 ms)
    light_chunk: int = 40           # soft-shadow samples per scan step
                                    # (multiple of 8: sublane-aligned)
    gi_chunk: int = 1               # hemisphere samples per scan step
    tri_chunk: int = 2048           # triangles per intersection scan step

    # spp-chunk composition (render/progressive.render_spp_chunked): this
    # render evaluates GI sample indices [offset, offset+spp) of a
    # conceptual (spp × weight)-sample frame.  The host MEAN of `weight`
    # such chunk renders (same base key, offsets 0, spp, 2·spp, …) equals
    # the single-call render at spp×weight EXACTLY up to float summation
    # order: the fold_in sample keys coincide, direct lighting is
    # sample-index-independent (identical in every chunk, so the mean
    # preserves it), and the one-sample secondary-hit GI runs only in the
    # offset-0 chunk pre-weighted by `weight` so the mean restores its
    # unit weight (render.c:271-287 semantics).  Defaults = single call.
    gi_sample_offset: int = 0
    gi_chunk_weight: int = 1

    # rematerialize each wavefront round in the backward pass: residuals
    # of the shadow/GI chunk scans otherwise exceed HBM at production
    # resolutions (trade FLOPs for memory, the standard TPU recipe)
    remat: bool = True
    # which named intermediates survive remat boundaries (core/remat.py):
    # "occlusion" (bool masks, always a win) and optionally
    # "shadow_samples" / "shade_terms" — saving the barrier'd sampling
    # trig and powf skips their backward re-trace at (lc, P) f32 HBM cost
    # per chunk (the fwd+bwd ratio lever; measure per scene)
    remat_names: tuple = ("occlusion",)

    # acceleration structure (reference accel.c LBVH -> cluster sweep,
    # c_raytracer_tpu/accel/): "auto" | "none" | "cluster".
    # cluster/visit defaults swept on scene4 (27.6k tris): 16x16 = 256
    # candidate triangles per ray is 1.4x faster than 64x16 and matches
    # brute force on >99.97% of pixels (raise visits for adversarial
    # geometry; tests pin exactness at visits=64)
    accel: str = "auto"
    bvh_cluster: int = 16           # triangles per Morton cluster
    bvh_visits: int | None = None   # nearest clusters swept per ray;
                                    # None -> auto: 16 for opaque scenes,
                                    # 64 for transparent ones — rays
                                    # INSIDE a mesh (refraction) see many
                                    # zero-entry clusters, and v=16 left
                                    # 12× radiance error on scene5 while
                                    # v=64 is exact to 1e-12
                                    # (tools/profiling/s5_diag.py)
    bvh_shadow_visits: int | None = None  # shadow-sweep visits; None ->
                                    # auto: bvh_visits for opaque scenes,
                                    # max(bvh_visits, 64) for scenes with
                                    # transparent materials — the kt tint
                                    # product needs EVERY blocker along the
                                    # segment, and nearest-V truncation
                                    # leaked 22× radiance on scene5
                                    # (tools/profiling/s5_diag.py)
    bvh_shadow_shortlist: int | None = None  # per-pixel top-K candidate
                                    # triangles for the shared-origin
                                    # shadow sweep (shadow_shortlist):
                                    # sample chunks stream against K
                                    # triangles instead of visits×cluster
                                    # candidates.  None -> auto: 32 for
                                    # opaque scenes (missing a farther
                                    # blocker is masked by any nearer
                                    # one), 0 = DISABLED for transparent
                                    # scenes (nearest-to-origin scoring
                                    # drops kt factors; scene5 needed
                                    # K>8500 for exactness).  Explicit
                                    # ints always win
    bvh_ray_chunk: int = 32768      # rays per cluster-gather chunk

    # two-level super-cluster prefilter (traverse._visit_order_super):
    # slab-test ceil(K/G) unions of G consecutive Morton clusters first,
    # then only the nearest-S supers' members — shrinks the (R, K) key
    # block the visit-order top_k pays for.  MEASURED NEGATIVE on chip
    # (round 5, scene4 512²): G=8/S=48 is bit-exact vs dense but takes
    # 1.49 s vs 0.645 s — the per-ray member-AABB row gathers
    # ((R, S·G, 3)×2) run at the measured 74-82 GB/s gather ceiling,
    # while the dense (R, K) slab test streams broadcast AABBs at
    # 327-355 GB/s and is compute-bound; shrinking the top_k keys cannot
    # pay for replacing a stream with gathers (PERFORMANCE.md round 5).
    # Default OFF (auto = 0); kept as a tested opt-in with its own
    # spill accounting (super-level spill counted ×G, so a scene that
    # outgrows S warns through the always-on runtime guard).
    bvh_super_group: int | None = None
    bvh_super_sel: int = 16         # supers kept per ray (S)

    def resolved_super_group(self, any_transparent: bool,
                             n_clusters: int) -> int:
        if self.bvh_super_group is not None:
            return self.bvh_super_group
        return 0

    # fused Pallas shadow-sample kernel (render/fused_shadow.py): sample
    # generation + occlusion + shade + per-channel reduction for one light
    # chunk in a single VMEM-resident kernel, for eligible dense scenes on
    # TPU (opaque sphere/plane geometry, sphere emitter).  Default OFF: on
    # scene1 1024² it measured 198 ms/frame vs the optimization-barrier
    # XLA path's 184 ms — after the barrier dedup, XLA's fusions are
    # already at the floor the kernel targets (PERFORMANCE.md round 3).
    # Kept as a correct, tested alternative ("on"): bit-parity and grad
    # tests run it on TPU (tests/test_render.py TestFusedShadow)
    fused_shadow: str = "off"       # "on" | "off"

    # soft-shadow sweep structure: "shared" = shared-origin per-pixel
    # capsule prefilter + (optional) shortlist, gathering each candidate
    # block once per pixel — the fast path for OPAQUE scenes.  "per_ray" =
    # per-sample slab-test visit lists (any_hit_tint_clusters) — thin
    # segments overlap few clusters (scene5: mean ~3, max ~60), so a
    # modest visit budget is exact where the fat per-pixel capsule needed
    # ALL ~6300 clusters for the kt tint product.  "union" = shared-origin
    # sweep over the EXACT per-pixel union of every sample's segment-slab
    # overlaps (traverse.shadow_union_visit_order): the same exactness
    # guarantee as per_ray (spill-counted), with each cluster block
    # gathered once per pixel instead of once per (sample, visit) and
    # dead visit slots skipped by a per-step cond — the round-4 work
    # compaction for transparent scenes.  "auto" picks shared for opaque
    # scenes and union for transparent ones.
    shadow_mode: str = "auto"       # "auto" | "shared" | "per_ray" | "union"

    # union-mode list scope: per-FRAME lists (one union over all S
    # samples, every chunk streams through it) or per-CHUNK lists (each
    # chunk sweeps only its own union).  Measured on scene5 64²: chunk
    # scope LOSES (1.71 s vs 1.20 s at 100 lights, 3.84 vs 2.31 at 300)
    # — a 40-sample chunk's segments already saturate the pixel's
    # geometric union, so per-chunk lists shrink little while the
    # extraction repeats nchunks×.  "auto" = frame; "chunk" kept as a
    # tested opt-in for low-lc configs.
    union_scope: str = "auto"       # "auto" | "frame" | "chunk"

    # union-mode pixel compaction: sort the tile's pixels by their union
    # LENGTH and run the sweep in sub-blocks of ~256 sorted pixels
    # (lax.map), so each block's dead-step cond exits at its own max
    # list length instead of the whole batch's — inside-the-glass pixels
    # (unions of 110+) no longer keep background lanes (unions of ~3)
    # streaming.  Costs two small permutation gathers of the per-pixel
    # state.  "auto" = on for union batches >= 512 pixels.
    union_compact: str = "auto"     # "auto" | "on" | "off"

    # closest-hit ray compaction (traverse.closest_hit_clusters
    # compact_block): sort each ray chunk by visit-list length and scan
    # in sorted sub-blocks with per-block dead-step conds — the scene4
    # analogue of union_compact.  MEASURED NEGATIVE-TO-NEUTRAL on chip
    # (round 5, scene4 512²): the skew is real (primary visit lists mean
    # 2.1 of 16, p50 0, p99 16) but 1024-ray blocks shrink each visit
    # step to (1024, C=16) lanes and pay 32 conds per chunk — 1.43 s vs
    # 0.645 s — while 8192-ray blocks are a wash (0.6435 s): the round-
    # level dead-round conds already skip the dead-bounce work that
    # compaction would harvest, unlike the union sweep whose huge
    # (256, lc, 64) steps made per-block exits profitable.  Default OFF;
    # kept as a bit-identity-tested opt-in ("on" = 8192-ray blocks).
    closest_compact: str = "off"    # "on" | "off"

    # per-visit dead-step cond in the cluster sweeps: "auto" enables it
    # for transparent scenes (generous budgets, mostly-dead tails) and
    # disables it for opaque tight budgets where every step is live and
    # the scalar cond is pure overhead (measured on scene4 512²)
    sweep_dead_skip: str = "auto"   # "auto" | "on" | "off"

    # fused Pallas visit-order kernel (accel/pallas_visit.py): slab test
    # + sorted top-V extraction with the (R, K) keys VMEM-resident,
    # replacing the HBM-materialized keys + lax.top_k sort (155 ms/frame
    # across the two visit-order phases on scene4 512², round-3 profile).
    # "auto" enables it on TPU when shapes fit the VMEM budget; "off"
    # keeps the XLA path (always used on CPU and for ineligible shapes).
    # DEFAULT OFF: the round-4 hardware session could not validate the
    # kernel (the remote Mosaic compile hung through the axon tunnel;
    # interpret-mode parity is pinned in tests) — flip to "auto" once a
    # compile on the target toolchain is demonstrated.
    pallas_visit: str = "off"       # "auto" | "on" | "off"

    # cluster size for the SHADOW sweep's cluster set; None -> auto:
    # bvh_cluster for shared/per_ray, 64 for union mode — the union
    # sweep's Möller-Trumbore runs (P, lc, C) shapes whose minor axis is
    # the cluster lane (C=16 measured 12.5% lane utilization, round 3);
    # fatter clusters also shrink the prefilter and gather row count.
    # Swept on scene5 64²/100: C=64 0.92 s/frame vs C=128 1.81 s (fatter
    # clusters pull in too many irrelevant triangles per visit).
    bvh_shadow_cluster: int | None = None

    def resolved_shadow_mode(self, any_transparent: bool) -> str:
        if self.shadow_mode != "auto":
            return self.shadow_mode
        return "union" if any_transparent else "shared"

    def resolved_shadow_cluster(self, any_transparent: bool) -> int:
        if self.bvh_shadow_cluster is not None:
            return self.bvh_shadow_cluster
        if self.resolved_shadow_mode(any_transparent) == "union":
            return 64
        return self.bvh_cluster

    def resolved_union_visits(self, any_transparent: bool) -> int:
        """Visit budget for union mode.  Generous by design: the sweep's
        per-step dead cond makes unused slots cost one scalar predicate,
        so the budget mostly bounds the compile shape.  192 measured
        spill-free on scene5 at C=64 (hit points INSIDE the glass mesh
        see ~110+ overlapped clusters; 64 spilled by 45 and leaked 6.6×
        radiance on single pixels — caught by the runtime spill guard,
        which stays on: raise bvh_shadow_visits or --accel-tune if a
        scene still warns)."""
        if self.bvh_shadow_visits is not None:
            return self.bvh_shadow_visits
        return 192

    def resolved_visits(self, any_transparent: bool) -> int:
        if self.bvh_visits is not None:
            return self.bvh_visits
        return 64 if any_transparent else 16

    def resolved_shadow_visits(self, any_transparent: bool) -> int:
        if self.bvh_shadow_visits is not None:
            return self.bvh_shadow_visits
        return max(self.resolved_visits(any_transparent), 64) \
            if any_transparent else self.resolved_visits(any_transparent)

    def resolved_shadow_shortlist(self, any_transparent: bool) -> int:
        if self.bvh_shadow_shortlist is not None:
            return self.bvh_shadow_shortlist
        return 0 if any_transparent else 32

    @property
    def min_light_intensity_sqr(self) -> float:
        return self.min_light_intensity * self.min_light_intensity

    def resolved_rounds(self, any_transparent: bool) -> int:
        """Upper bound on per-pixel rays in the reflect/refract tree.

        A pure reflection chain needs max_bounces+1 rounds.  Transparent
        materials branch the tree (reflect+refract per outside hit,
        render.c:307-340), so give them headroom."""
        if self.rounds is not None:
            return self.rounds
        if any_transparent:
            return 4 * self.max_bounces + 1
        return self.max_bounces + 1
