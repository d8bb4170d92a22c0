"""C99 float-semantics helpers.

The reference leans on several libm behaviors that differ from naive
``jnp`` translations; the renderer's numerics depend on them:

* ``powf(negative, integral)`` is well-defined in C (render.c:224 uses
  ``powf(specular_mul, shininess)`` with possibly-negative base and integral
  shininess values in the shipped scenes) — ``jnp.power`` returns NaN there.
* ``fmaxf(0.f, NaN)`` returns 0 (C99 fmax ignores NaN operands) —
  ``jnp.maximum`` propagates NaN.  Used to clamp the specular term.
* ``signbit`` distinguishes -0.0 (render.c:167 ``is_outside``).
"""

from __future__ import annotations

import jax.numpy as jnp


def c_powf(base, exponent):
    """powf with C99 semantics for negative bases and integral exponents.

    - base > 0: ordinary power
    - base == 0: 0^0 = 1, 0^pos = 0, 0^neg = inf
    - base < 0: integral exponent -> signed power, else NaN
    """
    base = jnp.asarray(base, jnp.float32)
    exponent = jnp.asarray(exponent, jnp.float32)
    # guard base==0 out of the power so grad w.r.t. exponent (log|base|)
    # stays finite; restore the C 0**e values explicitly
    is_zero = base == 0.0
    safe = jnp.where(is_zero, 1.0, jnp.abs(base))
    mag_pow = safe ** exponent
    zero_val = jnp.where(exponent > 0, 0.0,
                         jnp.where(exponent == 0, 1.0, jnp.float32(jnp.inf)))
    mag_pow = jnp.where(is_zero, zero_val, mag_pow)
    is_integral = exponent == jnp.floor(exponent)
    # sign of (-1)^e for integral e: odd -> -1
    is_odd = jnp.mod(jnp.abs(exponent), 2.0) == 1.0
    signed = jnp.where(is_odd, -mag_pow, mag_pow)
    neg_result = jnp.where(is_integral, signed, jnp.float32(jnp.nan))
    return jnp.where(base < 0, neg_result, mag_pow)


def fmaxf_zero(x):
    """C ``fmaxf(0.f, x)``: returns 0 for NaN (render.c:205,224)."""
    return jnp.where(x > 0, x, jnp.zeros_like(x))


def signbit(x):
    """IEEE signbit incl. -0.0 (render.c:167, object.c:481)."""
    return jnp.signbit(x)


def clampf(x, lo, hi):
    """calc.c clamp."""
    return jnp.clip(x, lo, hi)
