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

    # rematerialize each wavefront round in the backward pass: residuals
    # of the shadow/GI chunk scans otherwise exceed HBM at production
    # resolutions (trade FLOPs for memory, the standard TPU recipe)
    remat: bool = True

    # acceleration structure (reference accel.c LBVH -> cluster sweep,
    # c_raytracer_tpu/accel/): "auto" | "none" | "cluster".
    # cluster/visit defaults swept on scene4 (27.6k tris): 16x16 = 256
    # candidate triangles per ray is 1.4x faster than 64x16 and matches
    # brute force on >99.97% of pixels (raise visits for adversarial
    # geometry; tests pin exactness at visits=64)
    accel: str = "auto"
    bvh_cluster: int = 16           # triangles per Morton cluster
    bvh_visits: int = 16            # nearest clusters swept per ray
    bvh_shadow_visits: int | None = None  # shadow-sweep visits; None ->
                                    # bvh_visits.  The shared-origin capsule
                                    # test (traverse.shadow_visit_order) is
                                    # much tighter than the closest-hit slab
                                    # ordering, so shadow sweeps usually
                                    # need fewer visits
    bvh_shadow_shortlist: int = 32  # per-pixel top-K candidate triangles
                                    # for the shared-origin shadow sweep
                                    # (traverse.shadow_shortlist): sample
                                    # chunks stream against K triangles
                                    # instead of visits×cluster candidates.
                                    # 0 disables (stream whole clusters)
    bvh_ray_chunk: int = 32768      # rays per cluster-gather chunk

    @property
    def resolved_shadow_visits(self) -> int:
        return (self.bvh_visits if self.bvh_shadow_visits is None
                else self.bvh_shadow_visits)

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
