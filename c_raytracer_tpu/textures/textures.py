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


from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.core.v3 import V3


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
