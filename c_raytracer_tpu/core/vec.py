"""Vector math on trailing-axis-3 arrays.

TPU-native equivalent of the reference's scalar v3 helpers
(``/root/reference/src/core/calc.c:1-208``): every op here is batched over
arbitrary leading axes so the whole wavefront is one vector program, instead
of per-pixel scalar calls.

All math is float32 (the reference is float-only, ``type.h:19-21``).
"""

from __future__ import annotations

import jax.numpy as jnp

# float32 pi constant used by the reference (type.h:32)
PI = jnp.float32(3.1415927)


def dot(a, b):
    """Batched dot product over the trailing axis (calc.c dot3)."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    """Batched 3D cross product (calc.c cross)."""
    return jnp.cross(a, b)


def magsqr(a):
    """Squared magnitude (calc.c magsqr3)."""
    return jnp.sum(a * a, axis=-1)


def mag(a):
    """Magnitude (calc.c mag3)."""
    return jnp.sqrt(magsqr(a))


def safe_mag(a):
    """Magnitude with a clean gradient at zero vectors (sqrt's VJP is inf
    at 0 even under a zero cotangent — the double-where trick)."""
    m2 = magsqr(a)
    ok = m2 > 0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, m2, 1.0)), 0.0)


def norm(a):
    """Normalize; like the reference's norm3 there is no zero guard —
    normalizing a zero/NaN vector yields NaN, which downstream intersection
    tests treat as a miss (render.c:337 NaN refraction rays).
    """
    return a / mag(a)[..., None]


def spherical_to_cartesian(radius, inclination, azimuth):
    """SPHERICAL_TO_CARTESIAN macro (calc.h:17-22).

    Returns ``radius * (cos(az)·sin(inc), sin(az)·sin(inc), cos(inc))``
    stacked on a new trailing axis.
    """
    si = jnp.sin(inclination)
    return jnp.stack(
        [
            radius * jnp.cos(azimuth) * si,
            radius * jnp.sin(azimuth) * si,
            radius * jnp.cos(inclination),
        ],
        axis=-1,
    )


def v3(x, y, z, dtype=jnp.float32):
    return jnp.array([x, y, z], dtype=dtype)
