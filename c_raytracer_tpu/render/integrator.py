"""Wavefront integrator: the reference's recursive cast_ray tree
(render.c:136-343) linearized as a ``lax.scan`` over bounce rounds with a
per-pixel pending-ray stack.

Tree shape being linearized (SURVEY.md §3.2): each hit may spawn a
reflection child (carried kr·mat.kr, render.c:307-317) and a refraction
child (carried kr·mat.kt, inside_object=hit object, render.c:319-340); both
are culled by the -a throughput threshold.  GI hemisphere samples
(render.c:238-287) recurse exactly once with remaining_bounces=0, so they
are evaluated inline per round (trace + shade_basic), not pushed.

Per round, for every pixel in the tile simultaneously:
  1. pop one pending ray (masked when the stack is empty);
  2. intersect — inside-object re-test first (render.c:143-144), else
     closest hit over the scene;
  3. shade: emission + direct soft-shadow lighting + ambient or path GI;
  4. accumulate kr ⊙ color with per-segment attenuation (render.c:291-302);
  5. push surviving reflection/refraction children.

Stack ops are dense one-hot scatters over the (pixel, slot) plane — no
data-dependent shapes, everything jit-compatible and reverse-mode
differentiable (discrete pop/push indices are integer-valued and constant
under perturbation).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.accel.intersect import make_intersector
from c_raytracer_tpu.core import vec
from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render import shading
from c_raytracer_tpu.render.config import GI_AMBIENT, GI_PATH, RenderConfig
from c_raytracer_tpu.scene import types as T


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayStack:
    """Per-pixel LIFO of pending rays. Fields (P, S, ...); count (P,)."""

    o: jax.Array         # (P, S, 3)
    d: jax.Array         # (P, S, 3)
    kr: jax.Array        # (P, S, 3) carried throughput
    remaining: jax.Array  # (P, S) int32 remaining bounces
    inside: jax.Array    # (P, S) int32 gid of enclosing object or -1
    count: jax.Array     # (P,) int32 stack depth


def _stack_init(o, d, max_bounces, stack_size):
    P = o.shape[0]
    S = stack_size
    z3 = jnp.zeros((P, S, 3), jnp.float32)
    st = RayStack(
        o=z3.at[:, 0].set(o), d=z3.at[:, 0].set(d),
        kr=z3.at[:, 0].set(1.0),
        remaining=jnp.zeros((P, S), jnp.int32).at[:, 0].set(max_bounces),
        inside=jnp.full((P, S), -1, jnp.int32),
        count=jnp.ones((P,), jnp.int32),
    )
    return st


def _stack_pop(st: RayStack):
    """Pop the top ray per pixel; returns (ray fields, active, new stack)."""
    active = st.count > 0
    idx = jnp.maximum(st.count - 1, 0)

    def take(f):
        return jnp.take_along_axis(
            f, idx[:, None, *((None,) * (f.ndim - 2))], axis=1)[:, 0]

    o, d, kr = take(st.o), take(st.d), take(st.kr)
    remaining = take(st.remaining)
    inside = take(st.inside)
    st = dataclasses.replace(
        st, count=st.count - active.astype(jnp.int32))
    return (o, d, kr, remaining, inside), active, st


def _stack_push(st: RayStack, push_mask, o, d, kr, remaining, inside):
    """Push one ray per pixel where push_mask; drops on overflow (bounded
    stacks replace unbounded C recursion; overflow is counted upstream)."""
    S = st.o.shape[1]
    ok = push_mask & (st.count < S)
    onehot = (jnp.arange(S)[None, :] == st.count[:, None]) & ok[:, None]

    def put(f, v):
        m = onehot.reshape(onehot.shape + (1,) * (f.ndim - 2))
        return jnp.where(m, v[:, None], f)

    return dataclasses.replace(
        st,
        o=put(st.o, o), d=put(st.d, d), kr=put(st.kr, kr),
        remaining=put(st.remaining, remaining), inside=put(st.inside, inside),
        count=st.count + ok.astype(jnp.int32),
    )


def _trace(ix, o, d, inside):
    """Intersection step with the inside-object re-test quirk
    (render.c:143-148): a ray inside an object tests that object first and
    uses its hit even if other geometry is closer."""
    ti, hi, ni = G.intersect_prim(ix.ds, o, d, inside)
    use_inside = (inside >= 0) & hi
    tc, gc, nc = ix.closest(o, d)
    t = jnp.where(use_inside, ti, tc)
    gid = jnp.where(use_inside, inside, gc)
    n = jnp.where(use_inside[..., None], ni, nc)
    return t, gid, n


def _gi_path(ix, ds, static, cfg, key, aux, normal, remaining, active):
    """Path-traced GI (render.c:238-287): n_gi hemisphere samples, each a
    one-bounce trace + basic shade, weighted by (δ/n)·cosθ and the child's
    own segment attenuation."""
    P = normal.shape[0]
    is_primary = remaining == cfg.max_bounces
    n_primary = cfg.samples_per_pixel
    # per-hit object epsilon for the rotation special case (render.c:241)
    eps = ds.prim_eps[jnp.maximum(aux["gid"], 0)]
    gi_active = active & aux["is_outside"] & (remaining > 0)

    # number of samples: spp at the primary depth, 1 otherwise
    # (render.c:271-277). delta = 1/n for primaries, 1 for secondaries.
    n_max = max(n_primary, 1)
    delta = jnp.where(is_primary, 1.0 / jnp.float32(n_primary), 1.0)
    lane_active_extra = is_primary  # lanes >= 1 only run for primaries

    hit_pt = aux["hit_pt"]

    def sample_body(acc, i):
        skey = jax.random.fold_in(key, i)
        k_dir, k_shade = jax.random.split(skey)
        sdir, cos = shading.sample_hemisphere(k_dir, normal, eps)
        lane_ok = gi_active & ((i == 0) | lane_active_extra)
        ct, cgid, cn = _trace(ix, hit_pt, sdir,
                              jnp.full((P,), -1, jnp.int32))
        child_color, _ = shading.shade_basic(
            ix, static, cfg, k_shade, hit_pt, sdir, ct, cgid, cn, lane_ok)
        # child's own kr = delta·cosθ; child's own segment attenuation
        child_color = child_color * (delta * cos)[..., None]
        child_color = shading.attenuate_segment(cfg, child_color, ct)
        child_color = jnp.where((lane_ok & (cgid >= 0))[..., None],
                                child_color, 0.0)
        return acc + child_color, None

    body = jax.checkpoint(sample_body) if cfg.remat else sample_body
    acc, _ = jax.lax.scan(
        body, jnp.zeros((P, 3), jnp.float32), jnp.arange(n_max))
    return acc


def render_wavefront(ds: G.DeviceScene, static: T.SceneStatic,
                     cfg: RenderConfig, key, o, d, *, with_stats=False):
    """Render one tile of primary rays.

    o, d: (P, 3) primary origins/directions.
    Returns (color (P,3), zbuffer (P,)) and, with_stats, a dict of traced
    ray counts (scalars): rays popped from the stack, shadow rays, GI
    sample rays, children pushed, stack-overflow drops.
    """
    P = o.shape[0]
    ix = make_intersector(ds, cfg)
    any_transparent = any(static.is_transparent)
    rounds = cfg.resolved_rounds(any_transparent)
    reflective = jnp.asarray(np.asarray(static.is_reflective, bool))
    transparent = jnp.asarray(np.asarray(static.is_transparent, bool))

    st0 = _stack_init(o, d, cfg.max_bounces, cfg.stack_size)
    color0 = jnp.zeros((P, 3), jnp.float32)
    z0 = jnp.zeros((P,), jnp.float32)
    # traced-ray counters: main, shadow, gi, pushed, dropped
    stats0 = jnp.zeros((5,), jnp.float32)

    # per-hit shadow rays (emitters × their sample counts, render.c:170-176)
    shadow_rays_per_hit = float(sum(
        static.num_lights[e] for e in static.emitter_prims))
    gi_per_secondary = 1.0 if cfg.gi_model == GI_PATH else 0.0
    gi_per_primary = (float(cfg.samples_per_pixel)
                      if cfg.gi_model == GI_PATH else 0.0)

    def round_body(carry, round_i):
        st_in, color_in, z_in, stats_in = carry
        rkey = jax.random.fold_in(key, round_i)
        k_shade, k_gi = jax.random.split(rkey)

        (ro, rd, rkr, remaining, inside), active, st_p = _stack_pop(st_in)

        # dead-round skip: once every pixel's stack is empty the remaining
        # scheduled rounds (rounds is a static worst-case bound) do no work.
        # A real branch here lets XLA skip the whole trace+shade body — the
        # wavefront analog of the reference's recursion simply returning.
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

        t, gid, normal = _trace(ix, ro, rd, inside)
        hit = gid >= 0
        active_hit = active & hit

        obj_color, aux = shading.shade_basic(
            ix, static, cfg, k_shade, ro, rd, t, gid, normal, active_hit)
        aux["gid"] = gid

        # global illumination (render.c:232-289)
        if cfg.gi_model == GI_AMBIENT:
            ambient = ds.materials.ka[aux["mat"]] * ds.ambient
            obj_color = obj_color + jnp.where(
                active_hit[..., None], ambient, 0.0)
        else:
            obj_color = obj_color + _gi_path(
                ix, ds, static, cfg, k_gi, aux, normal, remaining,
                active_hit)

        # accumulate: kr ⊙ obj_color, per-segment attenuation
        # (render.c:291-302)
        contrib = shading.attenuate_segment(cfg, rkr * obj_color, t)
        color = color + jnp.where(active_hit[..., None], contrib, 0.0)

        # primary z-buffer: t of first hit; 0 on miss and when -b 0
        # (render.c:150-151, 304-305, 342, 364)
        is_primary = active & (remaining == cfg.max_bounces)
        z_val = jnp.where(hit & (remaining > 0), t, 0.0)
        z = jnp.where(is_primary, z_val, z)

        # children
        can_bounce = active_hit & (remaining > 0)
        mat = aux["mat"]
        b = aux["b"]
        thresh = jnp.float32(cfg.min_light_intensity_sqr)

        refl_kr = rkr * ds.materials.kr[mat]
        push_refl = (can_bounce & (inside != gid) & reflective[mat]
                     & (vec.magsqr(refl_kr) > thresh))
        refl_d = shading.reflect_dir(rd, normal, b)

        refr_kt = rkr * ds.materials.kt[mat]
        refr_d, refr_valid = shading.refract_dir(
            rd, normal, b, aux["is_outside"],
            ds.materials.refractive_index[mat])
        push_refr = (can_bounce & transparent[mat] & refr_valid
                     & (vec.magsqr(refr_kt) > thresh))

        hit_pt = aux["hit_pt"]
        # push refraction first so reflection is popped first (DFS order of
        # the reference — order only affects float summation order)
        pre_count = st.count
        st = _stack_push(st, push_refr, hit_pt, refr_d, refr_kt,
                         remaining - 1, gid)
        st = _stack_push(st, push_refl, hit_pt, refl_d, refl_kr,
                         remaining - 1,
                         jnp.full((P,), -1, jnp.int32))
        n_hit = jnp.sum(active_hit.astype(jnp.float32))
        n_primary_hit = jnp.sum(
            (active_hit & is_primary).astype(jnp.float32))
        wanted = push_refr.astype(jnp.int32) + push_refl.astype(jnp.int32)
        pushed = (st.count - pre_count).astype(jnp.float32)
        stats = stats + jnp.stack([
            jnp.sum(active.astype(jnp.float32)),            # main rays
            n_hit * shadow_rays_per_hit,                    # shadow rays
            (n_hit * gi_per_secondary                       # gi rays (+ spp
             + n_primary_hit * (gi_per_primary - gi_per_secondary)),
            jnp.sum(pushed),                                # children pushed
            jnp.sum(wanted.astype(jnp.float32)) - jnp.sum(pushed),  # dropped
        ])
        return (st, color, z, stats)

    body = jax.checkpoint(round_body) if cfg.remat else round_body
    (stf, color, z, stats), _ = jax.lax.scan(
        body, (st0, color0, z0, stats0), jnp.arange(rounds))
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
        )
        return color, z, stats_dict
    return color, z
