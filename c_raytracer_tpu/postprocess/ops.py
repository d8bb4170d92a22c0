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


def depth_of_field(image, z_buffer, scale, bias,
                   *, max_radius: int | None = None):
    """Forward-mapped z-buffer DoF (postproc.c:104-164), gather form.

    Per source pixel: CoC radius r = int(|depth·scale+bias|·0.5),
    α = min(1/r², 1); the splat covers integer offsets x ∈ [−r, r],
    y ∈ [−hh, hh] with hh = int(sqrt(r²−x²)), only onto destinations with
    depth ≥ source depth; destination value = Σ(pixel·α) / Σα.

    TPU execution shape: one ``lax.scan`` over the static list of integer
    offsets inside the radius-``max_radius`` rasterized disc (the only
    offsets any source can splat along — |dy| ≤ int(sqrt(r²−dx²)) ⊆ the
    disc).  Each step rolls ONE fused (h, w, 6) plane (weighted rgb, α, z,
    r) — a single bandwidth-bound pass per offset, ~π/4 of the dense
    window.

    ``max_radius``: static disc bound.  ``None`` reads the true maximum
    from the z-buffer (one host sync — fine eagerly, not allowed under
    jit).  Under jit pass an explicit bound; sources with a larger CoC are
    truncated to it (their in-disc offsets beyond the window are dropped).
    """
    h, w, _ = image.shape
    z = z_buffer.reshape(h, w)
    coc = jnp.abs(z * scale + bias)
    radius = (coc * 0.5).astype(jnp.int32)
    if max_radius is None:
        if isinstance(jnp.max(radius), jax.core.Tracer):
            raise ValueError(
                "depth_of_field under jit needs a static max_radius")
        max_radius = int(jnp.max(radius))
    R = int(max_radius)
    r_f = radius.astype(jnp.float32)
    alpha = jnp.minimum(1.0 / jnp.maximum(r_f * r_f, 1.0), 1.0)
    # NOTE r==0: the reference computes 1/0² = inf, MIN(inf,1)=1 → α=1
    alpha = jnp.where(radius == 0, 1.0, alpha)

    # fused source plane: rgb·α | α | z | r   (one roll per offset)
    stacked = jnp.concatenate(
        [image * alpha[..., None], alpha[..., None], z[..., None],
         r_f[..., None]], axis=-1)

    # static offset list: the rasterized disc of radius R
    offs = [(dy, dx)
            for dx in range(-R, R + 1)
            for dy in range(-int(np.sqrt(R * R - dx * dx)),
                            int(np.sqrt(R * R - dx * dx)) + 1)]
    offs = jnp.asarray(offs, jnp.int32)                    # (n, 2)

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]

    def step(carry, off):
        acc, asum = carry
        dy, dx = off[0], off[1]
        s = jnp.roll(stacked, (dy, dx), axis=(0, 1))
        src_w, src_a = s[..., :3], s[..., 3]
        src_z, src_r = s[..., 4], s[..., 5]
        # source's own rasterized disc: |dx| <= r and |dy| <= int(sqrt(r²-dx²))
        dxf = dx.astype(jnp.float32)
        hh = jnp.floor(jnp.sqrt(jnp.maximum(src_r * src_r - dxf * dxf, 0.0)))
        in_disc = (jnp.abs(dxf) <= src_r) & (jnp.abs(dy) <= hh)
        # reference bounds-checks instead of wrapping (postproc.c:124-140)
        in_bounds = ((yy - dy >= 0) & (yy - dy < h)
                     & (xx - dx >= 0) & (xx - dx < w))
        ok = in_disc & in_bounds & (src_z <= z)
        acc = acc + jnp.where(ok[..., None], src_w, 0.0)
        asum = asum + jnp.where(ok, src_a, 0.0)
        return (acc, asum), None

    acc = jnp.zeros_like(image)
    asum = jnp.zeros((h, w), jnp.float32)
    (acc, asum), _ = jax.lax.scan(step, (acc, asum), offs)
    # normalize (postproc.c:160-161); α sum is 0 only where nothing splatted
    return acc / jnp.where(asum > 0, asum, 1.0)[..., None]
