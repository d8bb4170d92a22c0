"""3D simplex noise, vectorized for TPU.

Numerically equivalent to the reference's vendored SimplexNoise
(``/root/reference/lib/SimplexNoise/SimplexNoise.c:99-194``), which is
Stefan Gustavson's public-domain 3D simplex noise.  Procedural "noisy
periodic" textures (material.c:179-200) feed hit points through this
function, so the permutation table and arithmetic must match exactly for
texture parity.  The permutation table below is Ken Perlin's canonical
public-domain 256-entry table used by every implementation of this
algorithm.

The implementation is branchless (corner-offset selection via rank
comparisons instead of nested ifs) and batched over arbitrary leading axes —
one gather-heavy vector program instead of per-point recursion.  It is pure
arithmetic + 256-entry table gathers: differentiable almost everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Ken Perlin's canonical permutation table (public domain).
_PERM = np.array([
    151, 160, 137, 91, 90, 15,
    131, 13, 201, 95, 96, 53, 194, 233, 7, 225, 140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23,
    190, 6, 148, 247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32, 57, 177, 33,
    88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175, 74, 165, 71, 134, 139, 48, 27, 166,
    77, 146, 158, 231, 83, 111, 229, 122, 60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244,
    102, 143, 54, 65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169, 200, 196,
    135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64, 52, 217, 226, 250, 124, 123,
    5, 202, 38, 147, 118, 126, 255, 82, 85, 212, 207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42,
    223, 183, 170, 213, 119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104, 218, 246, 97, 228,
    251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241, 81, 51, 145, 235, 249, 14, 239, 107,
    49, 192, 214, 31, 181, 199, 106, 157, 184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254,
    138, 236, 205, 93, 222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
], dtype=np.int32)

_F3 = np.float32(1.0 / 3.0)
_G3 = np.float32(1.0 / 6.0)


def _hash(i):
    """perm[(uint8)i] (SimplexNoise.c:31)."""
    return jnp.take(jnp.asarray(_PERM), jnp.bitwise_and(i, 255), axis=0)


def _grad(h, x, y, z):
    """Gradient dot residual for the low 4 bits of a hash
    (SimplexNoise.c:82-88), branchless."""
    h = jnp.bitwise_and(h, 15)
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    u = jnp.where(jnp.bitwise_and(h, 1) != 0, -u, u)
    v = jnp.where(jnp.bitwise_and(h, 2) != 0, -v, v)
    return u + v


def simplex_noise(x, y, z):
    """Batched 3D simplex noise in [-1, 1]; 0 at all integer coordinates.

    Matches ``simplex_noise`` (SimplexNoise.c:99-194) bit-for-bit in float32
    up to reassociation of the final sums.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)

    s = (x + y + z) * _F3
    i = jnp.floor(x + s).astype(jnp.int32)
    j = jnp.floor(y + s).astype(jnp.int32)
    k = jnp.floor(z + s).astype(jnp.int32)
    t = (i + j + k).astype(jnp.float32) * _G3
    x0 = x - (i.astype(jnp.float32) - t)
    y0 = y - (j.astype(jnp.float32) - t)
    z0 = z - (k.astype(jnp.float32) - t)

    # Branchless simplex-corner ordering: the reference's nested ifs
    # (SimplexNoise.c:124-140) pick offsets by the ordering of (x0, y0, z0).
    x_ge_y = x0 >= y0
    y_ge_z = y0 >= z0
    x_ge_z = x0 >= z0

    # Explicit truth table of the six simplex orderings:
    c_xyz = x_ge_y & y_ge_z                     # X Y Z order
    c_xzy = x_ge_y & ~y_ge_z & x_ge_z           # X Z Y
    c_zxy = x_ge_y & ~y_ge_z & ~x_ge_z          # Z X Y
    c_zyx = ~x_ge_y & ~y_ge_z                   # Z Y X  (y0 < z0)
    c_yzx = ~x_ge_y & y_ge_z & ~x_ge_z          # Y Z X  (x0 < z0)
    c_yxz = ~x_ge_y & y_ge_z & x_ge_z           # Y X Z

    def pick(a, b, c, d, e, f):
        return (
            jnp.where(c_xyz, a, 0) + jnp.where(c_xzy, b, 0)
            + jnp.where(c_zxy, c, 0) + jnp.where(c_zyx, d, 0)
            + jnp.where(c_yzx, e, 0) + jnp.where(c_yxz, f, 0)
        ).astype(jnp.int32)

    i1 = pick(1, 1, 0, 0, 0, 0)
    j1 = pick(0, 0, 0, 0, 1, 1)
    k1 = pick(0, 0, 1, 1, 0, 0)
    i2 = pick(1, 1, 1, 0, 0, 1)
    j2 = pick(1, 0, 0, 1, 1, 1)
    k2 = pick(0, 1, 1, 1, 1, 0)

    i1f = i1.astype(jnp.float32)
    j1f = j1.astype(jnp.float32)
    k1f = k1.astype(jnp.float32)
    i2f = i2.astype(jnp.float32)
    j2f = j2.astype(jnp.float32)
    k2f = k2.astype(jnp.float32)

    x1 = x0 - i1f + _G3
    y1 = y0 - j1f + _G3
    z1 = z0 - k1f + _G3
    x2 = x0 - i2f + 2.0 * _G3
    y2 = y0 - j2f + 2.0 * _G3
    z2 = z0 - k2f + 2.0 * _G3
    x3 = x0 - 1.0 + 3.0 * _G3
    y3 = y0 - 1.0 + 3.0 * _G3
    z3 = z0 - 1.0 + 3.0 * _G3

    gi0 = _hash(i + _hash(j + _hash(k)))
    gi1 = _hash(i + i1 + _hash(j + j1 + _hash(k + k1)))
    gi2 = _hash(i + i2 + _hash(j + j2 + _hash(k + k2)))
    gi3 = _hash(i + 1 + _hash(j + 1 + _hash(k + 1)))

    def corner(t_, gi, cx, cy, cz):
        t_ = jnp.float32(0.6) - cx * cx - cy * cy - cz * cz
        t2 = t_ * t_
        n = t2 * t2 * _grad(gi, cx, cy, cz)
        return jnp.where(t_ < 0, jnp.float32(0.0), n)

    n0 = corner(None, gi0, x0, y0, z0)
    n1 = corner(None, gi1, x1, y1, z1)
    n2 = corner(None, gi2, x2, y2, z2)
    n3 = corner(None, gi3, x3, y3, z3)

    return jnp.float32(32.0) * (n0 + n1 + n2 + n3)
