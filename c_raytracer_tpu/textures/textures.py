"""Procedural textures, branchless over a per-material parameter table.

The reference dispatches through per-texture function pointers
(material.c:152-200); here all four texture types are evaluated as masked
blends selected by the material's static texture type id — no divergent
control flow on the vector unit.

Texture parameter packing (scene/types.py Materials):
  uniform:         tex_color = color
  checkerboard:    tex_color/tex_color2 = colors[0]/[1], tex_scale = scale
  brick:           + tex_p1 = mortar width
  noisy periodic:  tex_color = base color, tex_color2 = color gradient,
                   tex_scale = noise feature scale, tex_p1 = noise scale,
                   tex_p2 = frequency scale, func = periodic function id
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from c_raytracer_tpu.core.noise import simplex_noise
from c_raytracer_tpu.scene import types as T


def _uniform(color, *_):
    return color


def _checkerboard(point, color0, color1, scale):
    """Parity of truncated scaled coords (material.c:159-166).

    NOTE the reference uses C float->uint32 casts (truncation toward zero,
    negative values wrap); replicated with an int32 truncation which matches
    the parity of the uint32 cast for all finite inputs."""
    sp = point * scale[..., None]
    ip = sp.astype(jnp.int32)  # trunc toward zero, like (uint32_t) cast mod 2
    parity = (ip[..., 0] + ip[..., 1] + ip[..., 2]) % 2
    # C computes ((uint32)x+(uint32)y+(uint32)z) % 2u; for negative floats the
    # uint32 cast is UB in C but gcc produces (uint32)(int32)x — parity equal.
    return jnp.where((parity != 0)[..., None], color1, color0)


def _brick(point, color0, color1, scale, mortar_width):
    """Offset rows + mortar threshold (material.c:168-177)."""
    sp = point * scale[..., None]
    x = sp[..., 0]
    y = sp[..., 1]
    parity = (x.astype(jnp.int32) % 2).astype(jnp.float32)
    y = y - parity * 0.5
    is_mortar = ((x - jnp.floor(x) < mortar_width)
                 | (y - jnp.floor(y) < mortar_width))
    return jnp.where(is_mortar[..., None], color1, color0)


def _noisy_periodic(point, color, gradient, feature_scale, noise_scale,
                    freq_scale, func_id):
    """angle = (x + noise(p*fs)*ns)*freq, envelope × gradient + base
    (material.c:179-200)."""
    sp = point * feature_scale[..., None]
    n = simplex_noise(sp[..., 0], sp[..., 1], sp[..., 2])
    angle = (point[..., 0] + n * noise_scale) * freq_scale
    sin_a = jnp.sin(angle)
    frac = angle - jnp.floor(angle)
    env_sin = (1.0 + sin_a) * 0.5
    env_saw = frac
    env_tri = jnp.abs(2.0 * (frac - 0.5))
    env_sq = (~jnp.signbit(sin_a)).astype(jnp.float32)
    env = jnp.select(
        [func_id == T.FUNC_SIN, func_id == T.FUNC_SAW,
         func_id == T.FUNC_TRIANGLE, func_id == T.FUNC_SQUARE],
        [env_sin, env_saw, env_tri, env_sq], env_sin)
    return gradient * env[..., None] + color


def texture_color(materials: T.Materials, tex_type, tex_func, mat_idx, point):
    """Evaluate the texture color for hit points.

    materials: Materials table; tex_type/tex_func: static int arrays (M,);
    mat_idx: (R,) material index per hit; point: (R, 3) world hit points.
    Returns (R, 3).
    """
    tt = jnp.asarray(np.asarray(tex_type, np.int32))[mat_idx]
    fn = jnp.asarray(np.asarray(tex_func, np.int32))[mat_idx]
    c0 = materials.tex_color[mat_idx]
    c1 = materials.tex_color2[mat_idx]
    scale = materials.tex_scale[mat_idx]
    p1 = materials.tex_p1[mat_idx]
    p2 = materials.tex_p2[mat_idx]

    # static pruning: only evaluate texture families the scene actually uses
    used = set(int(t) for t in tex_type)
    out = c0  # uniform
    if T.TEX_CHECKERBOARD in used:
        out = jnp.where((tt == T.TEX_CHECKERBOARD)[..., None],
                        _checkerboard(point, c0, c1, scale), out)
    if T.TEX_BRICK in used:
        out = jnp.where((tt == T.TEX_BRICK)[..., None],
                        _brick(point, c0, c1, scale, p1), out)
    if T.TEX_NOISY_PERIODIC in used:
        out = jnp.where((tt == T.TEX_NOISY_PERIODIC)[..., None],
                        _noisy_periodic(point, c0, c1, scale, p1, p2, fn), out)
    return out


# ---------------------------------------------------------------------------
# SoA hot path: statically unrolled over the material table
# ---------------------------------------------------------------------------

from c_raytracer_tpu.core import v3 as v3m  # noqa: E402
from c_raytracer_tpu.core.v3 import V3  # noqa: E402


def texture_color_soa(materials: T.Materials, static, mat, point: V3) -> V3:
    """Texture color per lane, SoA.

    ``mat``: (P,) material index; ``point``: V3 (P,) world hit points.
    Unrolled over the (tiny, static) material table: each material's
    texture family is known at trace time, so there is no runtime type
    dispatch and no parameter gathers — each family is evaluated with its
    material's traced scalar parameters and blended by ``mat == m``.
    """
    M = len(static.tex_type)
    out = v3m.zeros(jnp.shape(mat))
    for m in range(M):
        tt = static.tex_type[m]
        c0 = v3m.splat(materials.tex_color[m])
        if tt == T.TEX_UNIFORM:
            col = c0
        elif tt == T.TEX_CHECKERBOARD:
            c1 = v3m.splat(materials.tex_color2[m])
            sp = point * materials.tex_scale[m]
            # C float->uint cast truncates toward zero (material.c:159-166);
            # int32 matches the uint32 parity for all finite inputs
            parity = (sp.x.astype(jnp.int32) + sp.y.astype(jnp.int32)
                      + sp.z.astype(jnp.int32)) % 2
            col = v3m.where(parity != 0, c1, c0)
        elif tt == T.TEX_BRICK:
            c1 = v3m.splat(materials.tex_color2[m])
            sp = point * materials.tex_scale[m]
            mortar = materials.tex_p1[m]
            par = (sp.x.astype(jnp.int32) % 2).astype(jnp.float32)
            y = sp.y - par * 0.5
            is_mortar = ((sp.x - jnp.floor(sp.x) < mortar)
                         | (y - jnp.floor(y) < mortar))
            col = v3m.where(is_mortar, c1, c0)
        else:  # TEX_NOISY_PERIODIC (material.c:179-200)
            grad = v3m.splat(materials.tex_color2[m])
            sp = point * materials.tex_scale[m]
            n = simplex_noise(sp.x, sp.y, sp.z)
            angle = (point.x + n * materials.tex_p1[m]) * materials.tex_p2[m]
            fid = static.tex_func[m]
            if fid == T.FUNC_SIN:
                env = (1.0 + jnp.sin(angle)) * 0.5
            elif fid == T.FUNC_SAW:
                env = angle - jnp.floor(angle)
            elif fid == T.FUNC_TRIANGLE:
                env = jnp.abs(2.0 * (angle - jnp.floor(angle) - 0.5))
            else:  # FUNC_SQUARE
                env = (~jnp.signbit(jnp.sin(angle))).astype(jnp.float32)
            col = grad * env + c0
        out = v3m.where(mat == m, col, out)
    return out
