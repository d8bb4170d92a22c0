"""Structure-of-arrays 3-vectors: the TPU-native vector representation.

The reference's ``v3`` is a 3-float struct (type.h:19-21) and the first
TPU port kept that shape as ``(..., 3)`` arrays.  That trailing small axis
is hostile to the TPU's (sublane, lane) = (8, 128) register tiling: XLA
must either pad the 3 up a tile axis (up to ~42× wasted HBM traffic and
VPU lanes, measured on the wavefront ray stack) or insert layout-changing
copies between fusions.

``V3`` instead keeps x/y/z as three separate arrays of identical shape —
any shape, with the BIG axis (pixels/rays) last-minor so every elementwise
op runs on dense (8, 128) tiles.  It is a NamedTuple, hence a pytree:
it can ride through ``lax.scan`` carries, ``jax.grad``, and ``tree.map``
unchanged.

Every helper mirrors a reference calc.c op (dot3, cross, mul3s, norm3...)
— see core/vec.py for the array-of-structs originals kept for the API
boundary (images are (..., 3) for users).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PI = jnp.float32(3.1415927)  # type.h:32


class V3(NamedTuple):
    """Three same-shaped component arrays (or scalars)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array

    # --- elementwise arithmetic (scalar operands broadcast per component)
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        """Componentwise (Hadamard) with V3 (calc.c mul3v), scalar else
        (calc.c mul3s)."""
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    @property
    def shape(self):
        return jnp.shape(self.x)

    def map(self, f):
        return V3(f(self.x), f(self.y), f(self.z))

    def __getitem__(self, idx):
        # NamedTuple defines tuple indexing; preserve it for ints, slice
        # component arrays otherwise
        if isinstance(idx, int) and -3 <= idx < 3:
            return tuple.__getitem__(self, idx)
        return V3(self.x[idx], self.y[idx], self.z[idx])


def dot(a: V3, b: V3):
    """dot3 (calc.c)."""
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    """cross (calc.c)."""
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def magsqr(a: V3):
    return a.x * a.x + a.y * a.y + a.z * a.z


def mag(a: V3):
    return jnp.sqrt(magsqr(a))


def safe_mag(a: V3):
    """Magnitude with a clean gradient at zero (double-where)."""
    m2 = magsqr(a)
    ok = m2 > 0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, m2, 1.0)), 0.0)


def norm(a: V3) -> V3:
    """norm3; no zero guard, like the reference (NaN rays miss)."""
    return a * (1.0 / mag(a))


def safe_norm(a: V3) -> V3:
    """Normalize with zero vectors passed through unchanged (grad-clean)."""
    m = safe_mag(a)
    return a * (1.0 / jnp.where(m == 0.0, 1.0, m))


def where(m, a: V3, b: V3) -> V3:
    """Componentwise select; ``m`` broadcasts against the components."""
    if not isinstance(a, V3):
        a = V3(a, a, a)
    if not isinstance(b, V3):
        b = V3(b, b, b)
    return V3(jnp.where(m, a.x, b.x), jnp.where(m, a.y, b.y),
              jnp.where(m, a.z, b.z))


def splat(v) -> V3:
    """A (3,) array (e.g. one traced table row) -> V3 of scalars."""
    return V3(v[0], v[1], v[2])


def full(shape, v) -> V3:
    return V3(jnp.full(shape, v, jnp.float32),
              jnp.full(shape, v, jnp.float32),
              jnp.full(shape, v, jnp.float32))


def zeros(shape) -> V3:
    return full(shape, 0.0)


def ones(shape) -> V3:
    return full(shape, 1.0)


def from_aos(arr) -> V3:
    """(..., 3) -> V3 of (...,) components."""
    return V3(arr[..., 0], arr[..., 1], arr[..., 2])


def to_aos(v: V3):
    """V3 -> (..., 3)."""
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def from_rows(arr) -> V3:
    """(N, 3) table -> V3 of (N,) columns (SoA scene arrays)."""
    return V3(arr[:, 0], arr[:, 1], arr[:, 2])


def spherical_to_cartesian(radius, inclination, azimuth) -> V3:
    """SPHERICAL_TO_CARTESIAN macro (calc.h:17-22).

    The four trig arrays are materialized behind an optimization barrier:
    the three cartesian components land in different consumer fusions, and
    without the barrier XLA recomputes the sin/cos into each of them
    (2-3× the transcendental ALU of the renderer's sample generation —
    measured on the scene1 1024² shadow sweep)."""
    si, ci, sa, ca = jax.lax.optimization_barrier(
        (jnp.sin(inclination), jnp.cos(inclination),
         jnp.sin(azimuth), jnp.cos(azimuth)))
    return V3(radius * ca * si, radius * sa * si, radius * ci)


def select_scalar(idx, values, init=None):
    """Unrolled table select: values[m] broadcast where idx == m.

    ``values`` is a sequence of scalar (or broadcastable) arrays indexed by
    a small static range — the TPU-native replacement for a gather from a
    tiny table (XLA lowers small gathers to slow kCustom fusions).
    """
    out = jnp.zeros_like(idx, dtype=jnp.result_type(values[0])) \
        if init is None else init
    for m, v in enumerate(values):
        out = jnp.where(idx == m, v, out)
    return out


def select_v3(idx, rows) -> V3:
    """Unrolled V3 table select: rows[m] is a V3 of scalars."""
    x = jnp.zeros(jnp.shape(idx), jnp.float32)
    y = jnp.zeros(jnp.shape(idx), jnp.float32)
    z = jnp.zeros(jnp.shape(idx), jnp.float32)
    for m, v in enumerate(rows):
        x = jnp.where(idx == m, v.x, x)
        y = jnp.where(idx == m, v.y, y)
        z = jnp.where(idx == m, v.z, z)
    return V3(x, y, z)
