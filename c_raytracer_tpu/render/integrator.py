"""Wavefront integrator: the reference's recursive cast_ray tree
(render.c:136-343) linearized as a ``lax.scan`` over bounce rounds.

Tree shape being linearized (SURVEY.md §3.2): each hit may spawn a
reflection child (carried kr·mat.kr, render.c:307-317) and a refraction
child (carried kr·mat.kt, inside_object=hit object, render.c:319-340); both
are culled by the -a throughput threshold.  GI hemisphere samples
(render.c:238-287) recurse exactly once with remaining_bounces=0, so they
are evaluated inline per round (trace + shade_basic), not pushed.

Two execution modes, dispatched statically on the scene:

* **chain** (no transparent materials): refraction can never fire, so each
  ray has at most ONE child (its mirror reflection) and the whole pending
  set is a single carried ray per pixel — no stack state at all.  This is
  the hot path for most scenes, and it matters on TPU: a (P, S, 3) stack
  forces an XLA layout whose (8, 128) tiling pads the trailing small dims
  ~40× (measured: 96 MB of stack → 4 GB padded), so eliminating it removes
  almost all of the per-round HBM traffic.

* **stack** (any transparent material): a per-pixel LIFO of pending rays
  holds the reflect+refract tree.  Stack fields are SoA with the pixel
  axis last-minor — V3 components of (S, P) — so XLA's (sublane, lane)
  tiling is dense, and pops/pushes are one-hot selects over the small
  leading S axis.

All per-lane state is SoA (``V3`` component arrays, see core/v3.py);
conversion to (..., 3) images happens once at the end of the sweep.
Everything is fixed-shape and jit-compatible; discrete pop/push indices
are integer-valued and constant under perturbation, so the whole sweep is
reverse-mode differentiable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from c_raytracer_tpu.accel.intersect import make_intersector
from c_raytracer_tpu.core import remat as remat_mod
from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.core.v3 import V3
from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render import shading
from c_raytracer_tpu.render.config import GI_AMBIENT, GI_PATH, RenderConfig
from c_raytracer_tpu.scene import types as T


def _trace(ix, o: V3, d: V3, inside):
    """Intersection step with the inside-object re-test quirk
    (render.c:143-148): a ray inside an object tests that object first and
    uses its hit even if other geometry is closer.  ``inside=None`` skips
    the re-test entirely (chain mode and GI rays never enter objects).

    Returns (t, gid, mat, normal V3, visit_spill (P,) int32) —
    visit_spill is the closest-hit sweep's per-lane truncation count
    (0 on exhaustive paths; the always-on runtime guard)."""
    tc, gc, mc, nc, sp = ix.closest(o, d, with_spill=True)
    if inside is None:
        return tc, gc, mc, nc, sp
    ti, hi, ni = ix.retest(o, d, inside)
    use_inside = (inside >= 0) & hi
    t = jnp.where(use_inside, ti, tc)
    gid = jnp.where(use_inside, inside, gc)
    mat_in = ix.ds.mat_idx[jnp.clip(inside, 0, ix.ds.mat_idx.shape[0] - 1)]
    mat = jnp.where(use_inside, mat_in, mc)
    n = v3m.where(use_inside, ni, nc)
    return t, gid, mat, n, sp


def _gi_path(ix, ds, static, cfg, key, aux, normal: V3, remaining, active):
    """Path-traced GI (render.c:238-287): n_gi hemisphere samples, each a
    one-bounce trace + basic shade, weighted by (δ/n)·cosθ and the child's
    own segment attenuation.  ``remaining`` may be a scalar (chain mode)."""
    P = jnp.shape(normal.x)
    is_primary = remaining == cfg.max_bounces
    n_primary = cfg.samples_per_pixel
    # per-hit object epsilon for the rotation special case (render.c:241):
    # static per primitive — unrolled select for small scenes (no gather),
    # gather for triangle-soup scenes where unrolling would bloat the HLO
    if static.n_prims <= 64:
        eps = v3m.select_scalar(
            jnp.maximum(aux["gid"], 0),
            [jnp.float32(e) for e in static.epsilon],
            init=jnp.zeros(P, jnp.float32))
    else:
        eps = ds.prim_eps[jnp.maximum(aux["gid"], 0)]
    gi_active = active & aux["is_outside"] & (remaining > 0)

    # number of samples: spp at the primary depth, 1 otherwise
    # (render.c:271-277). delta = 1/n for primaries, 1 for secondaries.
    # spp-chunk composition (config.gi_sample_offset/gi_chunk_weight):
    # sample keys are fold_in(key, offset+i) so chunk renders evaluate
    # disjoint index ranges of the same conceptual sample set; the
    # one-sample secondary GI runs only in the offset-0 chunk, weighted
    # by the chunk count so the host mean restores unit weight
    off = getattr(cfg, "gi_sample_offset", 0)
    w_sec = getattr(cfg, "gi_chunk_weight", 1)
    n_max = max(n_primary, 1)
    delta = jnp.where(is_primary, 1.0 / jnp.float32(n_primary),
                      jnp.float32(w_sec))
    lane_active_extra = is_primary  # lanes >= 1 only run for primaries

    hit_pt = aux["hit_pt"]

    def sample_body(carry, i):
        acc, ss, vs = carry
        skey = jax.random.fold_in(key, off + i)
        k_dir, k_shade = jax.random.split(skey)
        sdir, cos = shading.sample_hemisphere(k_dir, normal, eps)
        # secondaries (one sample, lane i == 0) belong to the offset-0
        # chunk only; other chunks run primary lanes exclusively
        lane_ok = (gi_active & (((i == 0) | lane_active_extra)
                                if off == 0 else lane_active_extra))
        ct, cgid, cmat, cn, csp = _trace(ix, hit_pt, sdir, None)
        child_color, caux = shading.shade_basic(
            ix, static, cfg, k_shade, hit_pt, sdir, ct, cgid, cmat, cn,
            lane_ok)
        # child shades run the same shadow sweeps as primaries — their
        # truncation counters feed the runtime guard too (a path-traced
        # transparent scene can spill only at child hit points, which see
        # the highest cluster overlap; round-4 blind spot)
        ss = jnp.maximum(ss, caux["shadow_spill"])
        vs = jnp.maximum(vs, jnp.max(jnp.where(lane_ok, csp, 0)))
        # child's own kr = delta·cosθ; child's own segment attenuation
        child_color = child_color * (delta * cos)
        child_color = shading.attenuate_segment(cfg, child_color, ct)
        child_color = v3m.where(lane_ok & (cgid >= 0), child_color, 0.0)
        return (acc + child_color, ss, vs), None

    body = (remat_mod.checkpoint(sample_body, cfg.remat_names)
            if cfg.remat else sample_body)
    (acc, ss, vs), _ = jax.lax.scan(
        body, (v3m.zeros(P), jnp.int32(0), jnp.int32(0)),
        jnp.arange(n_max))
    return acc, ss, vs


def _round_shade(ix, static, cfg, k_shade, k_gi, ro: V3, rd: V3, rkr: V3,
                 remaining, inside, active, *, with_refraction: bool):
    """Trace + shade + child-spawn for one wavefront round.

    ``remaining`` may be a scalar (chain mode, same depth for all lanes) or
    a (P,) array (stack mode).  ``inside=None`` means no lane can be inside
    an object (chain mode).  Returns a dict of per-lane results."""
    ds = ix.ds

    t, gid, mat, normal, tr_spill = _trace(ix, ro, rd, inside)
    hit = gid >= 0
    active_hit = active & hit
    visit_spill = jnp.max(jnp.where(active, tr_spill, 0))

    obj_color, aux = shading.shade_basic(
        ix, static, cfg, k_shade, ro, rd, t, gid, mat, normal, active_hit)
    aux["gid"] = gid
    shadow_spill = aux.get("shadow_spill", jnp.int32(0))

    # global illumination (render.c:232-289)
    if cfg.gi_model == GI_AMBIENT:
        ambient = shading.mat3(ds.materials.ka, mat) * v3m.splat(ds.ambient)
        obj_color = obj_color + v3m.where(active_hit, ambient, 0.0)
    else:
        gi_color, gi_ss, gi_vs = _gi_path(
            ix, ds, static, cfg, k_gi, aux, normal, remaining, active_hit)
        obj_color = obj_color + gi_color
        shadow_spill = jnp.maximum(shadow_spill, gi_ss)
        visit_spill = jnp.maximum(visit_spill, gi_vs)

    # accumulate: kr ⊙ obj_color, per-segment attenuation (render.c:291-302)
    contrib = shading.attenuate_segment(cfg, rkr * obj_color, t)
    contrib = v3m.where(active_hit, contrib, 0.0)

    # primary z-buffer value: t of first hit; 0 on miss and when -b 0
    # (render.c:150-151, 304-305, 342, 364)
    z_val = jnp.where(hit & (remaining > 0), t, 0.0)

    # children
    can_bounce = active_hit & (remaining > 0)
    b = aux["b"]
    thresh = jnp.float32(cfg.min_light_intensity_sqr)

    reflective = v3m.select_scalar(
        mat, [jnp.bool_(r) for r in static.is_reflective],
        init=jnp.zeros(jnp.shape(mat), bool))
    refl_kr = rkr * shading.mat3(ds.materials.kr, mat)
    inside_ne = True if inside is None else (inside != gid)
    push_refl = (can_bounce & inside_ne & reflective
                 & (v3m.magsqr(refl_kr) > thresh))
    refl_d = shading.reflect_dir(rd, normal, b)

    out = dict(
        t=t, gid=gid, hit=hit, active_hit=active_hit, contrib=contrib,
        z_val=z_val, hit_pt=aux["hit_pt"],
        push_refl=push_refl, refl_d=refl_d, refl_kr=refl_kr,
        shadow_spill=shadow_spill, visit_spill=visit_spill,
    )

    if with_refraction:
        transparent = v3m.select_scalar(
            mat, [jnp.bool_(x) for x in static.is_transparent],
            init=jnp.zeros(jnp.shape(mat), bool))
        refr_kt = rkr * shading.mat3(ds.materials.kt, mat)
        ior = shading.mat1(ds.materials.refractive_index, mat)
        refr_d, refr_valid = shading.refract_dir(
            rd, normal, b, aux["is_outside"], ior)
        push_refr = (can_bounce & transparent & refr_valid
                     & (v3m.magsqr(refr_kt) > thresh))
        out.update(push_refr=push_refr, refr_d=refr_d, refr_kt=refr_kt)
    return out


def _stat_weights(static: T.SceneStatic, cfg: RenderConfig):
    """Per-hit shadow rays (emitters × sample counts, render.c:170-176)
    and GI rays per primary/secondary hit."""
    shadow_rays_per_hit = float(sum(
        static.num_lights[e] for e in static.emitter_prims))
    gi_per_secondary = 1.0 if cfg.gi_model == GI_PATH else 0.0
    gi_per_primary = (float(cfg.samples_per_pixel)
                      if cfg.gi_model == GI_PATH else 0.0)
    return shadow_rays_per_hit, gi_per_primary, gi_per_secondary


# ---------------------------------------------------------------------------
# chain mode: no transparent materials → at most one child per ray
# ---------------------------------------------------------------------------

def _render_chain(ds: G.DeviceScene, static: T.SceneStatic,
                  cfg: RenderConfig, key, o: V3, d: V3, *, with_stats: bool,
                  shards=None):
    P = jnp.shape(o.x)
    ix = make_intersector(ds, static, cfg, shards)
    rounds = min(cfg.rounds or (cfg.max_bounces + 1), cfg.max_bounces + 1)
    sh_w, gi_p, gi_s = _stat_weights(static, cfg)

    color0 = v3m.zeros(P)
    z0 = jnp.zeros(P, jnp.float32)
    kr0 = v3m.ones(P)
    live0 = jnp.ones(P, bool)
    stats0 = jnp.zeros((7,), jnp.float32)

    def round_body(carry, round_i):
        (ro, rd, rkr, live, color, z, stats) = carry
        rkey = jax.random.fold_in(key, round_i)
        k_shade, k_gi = jax.random.split(rkey)
        remaining = cfg.max_bounces - round_i  # same depth on every lane

        # dead-round skip: once every chain has died the remaining rounds
        # do no work — a real branch lets XLA skip the trace+shade body
        carry = jax.lax.cond(
            jnp.any(live), _live_round,
            lambda args: args[:7],
            (ro, rd, rkr, live, color, z, stats, remaining, k_shade, k_gi))
        return carry, None

    def _live_round(args):
        ro, rd, rkr, live, color, z, stats, remaining, k_shade, k_gi = args
        r = _round_shade(ix, static, cfg, k_shade, k_gi, ro, rd, rkr,
                         remaining, None, live, with_refraction=False)
        color = color + r["contrib"]
        is_primary = remaining == cfg.max_bounces
        z = jnp.where(is_primary & live, r["z_val"], z)

        live2 = r["push_refl"]
        n_hit = jnp.sum(r["active_hit"].astype(jnp.float32))
        stats = stats + jnp.stack([
            jnp.sum(live.astype(jnp.float32)),                  # main rays
            n_hit * sh_w,                                       # shadow rays
            n_hit * jnp.where(is_primary, gi_p, gi_s),          # gi rays
            jnp.sum(live2.astype(jnp.float32)),                 # children
            jnp.float32(0.0),                                   # dropped
            jnp.float32(0.0),                                   # shadow spill
            jnp.float32(0.0),                                   # visit spill
        ])
        stats = stats.at[5].set(jnp.maximum(
            stats[5], r["shadow_spill"].astype(jnp.float32)))
        stats = stats.at[6].set(jnp.maximum(
            stats[6], r["visit_spill"].astype(jnp.float32)))
        return (r["hit_pt"], r["refl_d"], r["refl_kr"], live2, color, z,
                stats)

    body = (remat_mod.checkpoint(round_body, cfg.remat_names)
            if cfg.remat else round_body)
    (_, _, _, _, color, z, stats), _ = jax.lax.scan(
        body, (o, d, kr0, live0, color0, z0, stats0), jnp.arange(rounds))
    return _finish(color, z, stats, with_stats)


# ---------------------------------------------------------------------------
# stack mode: transparent materials → reflect+refract tree, per-pixel LIFO
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayStack:
    """Per-pixel LIFO of pending rays, SoA.

    Vector fields are V3 with (S, P) components — the small stack axis S
    leads and the pixel axis P is last-minor, so XLA's (sublane, lane)
    tiling of the trailing dims is dense (the AoS (P, S, 3) layout padded
    ~40×).  Scalars (S, P); count (P,)."""

    o: V3                # (S, P) components
    d: V3
    kr: V3
    remaining: jax.Array  # (S, P) int32 remaining bounces
    inside: jax.Array    # (S, P) int32 gid of enclosing object or -1
    count: jax.Array     # (P,) int32 stack depth


def _stack_init(o: V3, d: V3, max_bounces, stack_size):
    P = jnp.shape(o.x)
    S = stack_size
    z2 = jnp.zeros((S,) + P, jnp.float32)
    put0 = lambda v: z2.at[0].set(v)  # noqa: E731
    st = RayStack(
        o=o.map(put0), d=d.map(put0),
        kr=V3(put0(1.0), put0(1.0), put0(1.0)),
        remaining=jnp.zeros((S,) + P, jnp.int32).at[0].set(max_bounces),
        inside=jnp.full((S,) + P, -1, jnp.int32),
        count=jnp.ones(P, jnp.int32),
    )
    return st


def _stack_pop(st: RayStack):
    """Pop the top ray per pixel; returns (ray fields, active, new stack).

    The pop is a one-hot contraction over the small leading S axis —
    sublane-aligned selects, no (P, S) gathers."""
    S = st.remaining.shape[0]
    active = st.count > 0
    idx = jnp.maximum(st.count - 1, 0)                  # (P,)
    onehot = jnp.arange(S)[:, None] == idx[None, :]     # (S, P)

    def take(f):
        return jnp.sum(jnp.where(onehot, f, 0), axis=0, dtype=f.dtype)

    o, d, kr = st.o.map(take), st.d.map(take), st.kr.map(take)
    remaining = take(st.remaining)
    inside = take(st.inside)
    st = dataclasses.replace(
        st, count=st.count - active.astype(jnp.int32))
    return (o, d, kr, remaining, inside), active, st


def _stack_push(st: RayStack, push_mask, o: V3, d: V3, kr: V3, remaining,
                inside):
    """Push one ray per pixel where push_mask; drops on overflow (bounded
    stacks replace unbounded C recursion; overflow is counted upstream)."""
    S = st.remaining.shape[0]
    ok = push_mask & (st.count < S)                     # (P,)
    onehot = (jnp.arange(S)[:, None] == st.count[None, :]) & ok[None, :]

    def put(f, v):
        return jnp.where(onehot, v[None], f)

    def putv(f: V3, v: V3) -> V3:
        return V3(put(f.x, v.x), put(f.y, v.y), put(f.z, v.z))

    return dataclasses.replace(
        st,
        o=putv(st.o, o), d=putv(st.d, d), kr=putv(st.kr, kr),
        remaining=put(st.remaining, remaining),
        inside=put(st.inside, inside),
        count=st.count + ok.astype(jnp.int32),
    )


def _render_stack(ds: G.DeviceScene, static: T.SceneStatic,
                  cfg: RenderConfig, key, o: V3, d: V3, *, with_stats: bool,
                  shards=None):
    P = jnp.shape(o.x)
    ix = make_intersector(ds, static, cfg, shards)
    rounds = cfg.resolved_rounds(True)
    sh_w, gi_p, gi_s = _stat_weights(static, cfg)

    st0 = _stack_init(o, d, cfg.max_bounces, cfg.stack_size)
    color0 = v3m.zeros(P)
    z0 = jnp.zeros(P, jnp.float32)
    stats0 = jnp.zeros((7,), jnp.float32)

    def round_body(carry, round_i):
        st_in, color_in, z_in, stats_in = carry
        rkey = jax.random.fold_in(key, round_i)
        k_shade, k_gi = jax.random.split(rkey)

        (ro, rd, rkr, remaining, inside), active, st_p = _stack_pop(st_in)

        # dead-round skip: once every pixel's stack is empty the remaining
        # scheduled rounds (rounds is a static worst-case bound) do no work.
        carry = jax.lax.cond(
            jnp.any(active),
            _live_round,
            lambda args: (args[0], args[6], args[7], args[8]),
            (st_p, ro, rd, rkr, remaining, inside, color_in, z_in,
             stats_in, active, k_shade, k_gi))
        return carry, None

    def _live_round(args):
        (st, ro, rd, rkr, remaining, inside, color, z, stats, active,
         k_shade, k_gi) = args

        r = _round_shade(ix, static, cfg, k_shade, k_gi, ro, rd, rkr,
                         remaining, inside, active, with_refraction=True)
        color = color + r["contrib"]

        is_primary = active & (remaining == cfg.max_bounces)
        z = jnp.where(is_primary, r["z_val"], z)

        # push refraction first so reflection is popped first (DFS order of
        # the reference — order only affects float summation order)
        gid = r["gid"]
        hit_pt = r["hit_pt"]
        pre_count = st.count
        st = _stack_push(st, r["push_refr"], hit_pt, r["refr_d"],
                         r["refr_kt"], remaining - 1, gid)
        st = _stack_push(st, r["push_refl"], hit_pt, r["refl_d"],
                         r["refl_kr"], remaining - 1,
                         jnp.full(P, -1, jnp.int32))
        n_hit = jnp.sum(r["active_hit"].astype(jnp.float32))
        n_primary_hit = jnp.sum(
            (r["active_hit"] & is_primary).astype(jnp.float32))
        wanted = (r["push_refr"].astype(jnp.int32)
                  + r["push_refl"].astype(jnp.int32))
        pushed = (st.count - pre_count).astype(jnp.float32)
        stats = stats + jnp.stack([
            jnp.sum(active.astype(jnp.float32)),            # main rays
            n_hit * sh_w,                                   # shadow rays
            (n_hit * gi_s + n_primary_hit * (gi_p - gi_s)),  # gi rays
            jnp.sum(pushed),                                # children pushed
            jnp.sum(wanted.astype(jnp.float32)) - jnp.sum(pushed),  # dropped
            jnp.float32(0.0),                               # shadow spill
            jnp.float32(0.0),                               # visit spill
        ])
        stats = stats.at[5].set(jnp.maximum(
            stats[5], r["shadow_spill"].astype(jnp.float32)))
        stats = stats.at[6].set(jnp.maximum(
            stats[6], r["visit_spill"].astype(jnp.float32)))
        return (st, color, z, stats)

    body = (remat_mod.checkpoint(round_body, cfg.remat_names)
            if cfg.remat else round_body)
    (stf, color, z, stats), _ = jax.lax.scan(
        body, (st0, color0, z0, stats0), jnp.arange(rounds))
    return _finish(color, z, stats, with_stats)


def _finish(color: V3, z, stats, with_stats):
    color = v3m.to_aos(color)
    if with_stats:
        # NOTE: GI child rays also spawn their own shadow rays in the
        # reference (the child cast does full direct lighting); those are
        # not counted here, so the total is a conservative undercount.
        stats_dict = dict(
            main_rays=stats[0],
            shadow_rays=stats[1],
            gi_rays=stats[2],
            children_pushed=stats[3],
            dropped=stats[4],
            # runtime truncation guards (always computed, CLI warns when
            # nonzero): worst per-pixel SHADOW visit spill across all
            # rounds/emitters/GI-child shades (union + per_ray modes; 0
            # proves every kt blocker was swept) and worst CLOSEST-HIT
            # cluster spill across all traces incl. GI children (best-t
            # pruning usually masks it; 0 proves exhaustive)
            shadow_spill_max=stats[5],
            visit_spill_max=stats[6],
        )
        return color, z, stats_dict
    return color, z


def render_wavefront(ds: G.DeviceScene, static: T.SceneStatic,
                     cfg: RenderConfig, key, o, d, *, with_stats=False,
                     shards=None):
    """Render one tile of primary rays.

    o, d: (P, 3) primary origins/directions (AoS at the API seam).
    Returns (color (P,3), zbuffer (P,)) and, with_stats, a dict of traced
    ray counts (scalars): rays popped/advanced, shadow rays, GI sample
    rays, children spawned, stack-overflow drops.

    Mode dispatch is static: scenes with no transparent material use the
    stackless chain integrator (identical output — refraction can never
    fire — with none of the stack's HBM traffic)."""
    o, d = v3m.from_aos(o), v3m.from_aos(d)
    if any(static.is_transparent):
        return _render_stack(ds, static, cfg, key, o, d,
                             with_stats=with_stats, shards=shards)
    return _render_chain(ds, static, cfg, key, o, d,
                         with_stats=with_stats, shards=shards)
