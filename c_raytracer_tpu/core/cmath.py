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

import jax
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


@jax.custom_vjp
def _fmax0_powf_core(base, exponent):
    return fmaxf_zero(c_powf(base, exponent))


def _fmax0_powf_fwd(base, exponent):
    p = _fmax0_powf_core(base, exponent)
    return p, (base, exponent, p)


def _fmax0_powf_bwd(res, g):
    # On active lanes (p > 0, x != 0) the primal is p = ±|x|^s with p
    # positive, so d/dx = s·x^(s-1) = s·p/x and d/ds = p·log|x| — one divide
    # and one log instead of re-deriving the power and its select cascade.
    # Inactive lanes (clamped to 0, NaN, or x == 0 — including 0^neg where
    # p = inf) carry zero gradient, matching the where-branch gradients of
    # the naive composition a.e.  The cotangent sits *inside* the select so
    # a NaN g on an inactive lane cannot leak through (0*NaN = NaN).
    x, s, p = res
    active = (p > 0) & (x != 0)
    safe_x = jnp.where(x == 0, 1.0, x)
    dx = jnp.where(active, s * p / safe_x * g, 0.0)
    ds = jnp.where(active, p * jnp.log(jnp.abs(safe_x)) * g, 0.0)
    return dx, ds


_fmax0_powf_core.defvjp(_fmax0_powf_fwd, _fmax0_powf_bwd)


def fmax0_powf(base, exponent):
    """``fmaxf(0.f, powf(base, exponent))`` — the specular clamp-power of
    render.c:205,224 — with a closed-form VJP.

    The naive composition's reverse pass recomputes ``x**(s-1)`` (an extra
    exp+log per lane) and differentiates c_powf's integral/sign select
    cascade; this fuses the pair and backpropagates via ``s·p/x`` and
    ``p·log|x|`` using only the saved primal output.  Inputs are broadcast
    first so the VJP shapes are trivial (broadcast_to's transpose does the
    cotangent sum-reduction)."""
    base = jnp.asarray(base, jnp.float32)
    exponent = jnp.asarray(exponent, jnp.float32)
    shape = jnp.broadcast_shapes(jnp.shape(base), jnp.shape(exponent))
    return _fmax0_powf_core(jnp.broadcast_to(base, shape),
                            jnp.broadcast_to(exponent, shape))


def signbit(x):
    """IEEE signbit incl. -0.0 (render.c:167, object.c:481)."""
    return jnp.signbit(x)


def clampf(x, lo, hi):
    """calc.c clamp."""
    return jnp.clip(x, lo, hi)
