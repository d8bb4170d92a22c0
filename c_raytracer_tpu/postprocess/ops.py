"""Postprocessing effects (the reference's separate ``postprocess`` binary,
postproc.c:36-188), as pure JAX image ops.

Depth-of-field is the interesting one: the reference does a forward-mapped
z-buffer *scatter* — each source pixel splats pixel·α over its
circle-of-confusion disc onto pixels at greater-or-equal depth, then
normalizes by accumulated α (postproc.c:104-164).  Scatters are slow on
TPU, so this is reformulated as a *gather*: for each destination pixel,
sum over source offsets (dy, dx) within the maximum CoC radius, accepting a
source if (a) the offset lies inside the source's own CoC disc (by the
reference's integer disc rasterization) and (b) source depth ≤ destination
depth.  Same math, same occlusion rule, TPU-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def brighten(image, factor):
    """Scalar multiply (postproc.c:94-102)."""
    return image * jnp.float32(factor)


def mist(image, z_buffer, start, depth, falloff, color):
    """Depth-based fog blend (postproc.c:166-188).

    falloff: "lin" | "quad" | "inv_quad" (sqrt).
    """
    opacity = jnp.clip((z_buffer - start) * (1.0 / depth), 0.0, 1.0)
    if falloff == "quad":
        opacity = opacity * opacity
    elif falloff == "inv_quad":
        opacity = jnp.sqrt(opacity)
    elif falloff != "lin":
        raise ValueError(f"Unrecognized falloff type [{falloff}].")
    color = jnp.asarray(color, jnp.float32)
    return (image * (1.0 - opacity)[..., None]
            + color * opacity[..., None])


def dof_camera_params(z_buffer, aperture, focal_length, plane_in_focus):
    """--dof-camera scale/bias derivation (postproc.c:52-68)."""
    z_min = float(jnp.min(z_buffer))
    z_max = float(jnp.max(z_buffer))
    scale = ((aperture * focal_length * plane_in_focus * (z_max - z_min))
             / ((plane_in_focus - focal_length) * z_min * z_max))
    bias = ((aperture * focal_length * (z_min - plane_in_focus))
            / ((plane_in_focus * focal_length) * z_min))
    return scale, bias


def depth_of_field(image, z_buffer, scale, bias, *, max_radius: int | None = None):
    """Forward-mapped z-buffer DoF (postproc.c:104-164), gather form.

    Per source pixel: CoC radius r = int(|depth·scale+bias|·0.5),
    α = min(1/r², 1); the splat covers integer offsets x ∈ [−r, r],
    y ∈ [−hh, hh] with hh = int(sqrt(r²−x²)), only onto destinations with
    depth ≥ source depth; destination value = Σ(pixel·α) / Σα.

    Cost is O(pixels · max_radius²) — dense over the offset window, unlike
    the reference's per-source adaptive scatter which is O(Σ r_src²).  For
    camera-derived parameters CoC radii are modest; pass ``max_radius`` to
    cap the window explicitly (sources with larger CoC are then truncated).
    """
    h, w, _ = image.shape
    z = z_buffer.reshape(h, w)
    coc = jnp.abs(z * scale + bias)
    radius = (coc * 0.5).astype(jnp.int32)
    if max_radius is None:
        max_radius = int(jnp.max(radius))
    r_f = radius.astype(jnp.float32)
    alpha = jnp.minimum(1.0 / jnp.maximum(r_f * r_f, 1.0), 1.0)
    # NOTE r==0: the reference computes 1/0² = inf, MIN(inf,1)=1 → α=1
    alpha = jnp.where(radius == 0, 1.0, alpha)
    weighted = image * alpha[..., None]

    # gather: for each integer offset within the max radius, shift the
    # source plane and accumulate where the offset is inside the source's
    # own rasterized disc and the occlusion test passes.
    def accum_for_dx(carry, dx):
        acc, asum = carry
        hh_src = jnp.sqrt(
            jnp.maximum((r_f * r_f) - dx.astype(jnp.float32) ** 2, 0.0)
        ).astype(jnp.int32)
        in_x = jnp.abs(dx) <= radius

        def accum_for_dy(carry2, dy):
            acc2, asum2 = carry2
            # source at (y-dy, x-dx) splats onto destination (y, x)
            src_w = jnp.roll(weighted, (dy, dx), axis=(0, 1))
            src_a = jnp.roll(alpha, (dy, dx), axis=(0, 1))
            src_z = jnp.roll(z, (dy, dx), axis=(0, 1))
            src_hh = jnp.roll(hh_src, (dy, dx), axis=(0, 1))
            src_in_x = jnp.roll(in_x, (dy, dx), axis=(0, 1))
            # reference bounds-checks instead of wrapping (postproc.c:124-140)
            yy = jnp.arange(h)[:, None] - dy
            xx = jnp.arange(w)[None, :] - dx
            in_bounds = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            ok = (src_in_x & (jnp.abs(dy) <= src_hh) & in_bounds
                  & (src_z <= z))
            acc2 = acc2 + jnp.where(ok[..., None], src_w, 0.0)
            asum2 = asum2 + jnp.where(ok, src_a, 0.0)
            return (acc2, asum2), None

        (acc, asum), _ = jax.lax.scan(
            accum_for_dy, (acc, asum),
            jnp.arange(-max_radius, max_radius + 1))
        return (acc, asum), None

    acc = jnp.zeros_like(image)
    asum = jnp.zeros((h, w), jnp.float32)
    (acc, asum), _ = jax.lax.scan(
        accum_for_dx, (acc, asum), jnp.arange(-max_radius, max_radius + 1))
    # normalize (postproc.c:160-161); α sum is 0 only where nothing splatted
    return acc / jnp.where(asum > 0, asum, 1.0)[..., None]
