"""Tests for core math: vec ops, C-semantics helpers, simplex noise.

The noise test compiles the reference's vendored SimplexNoise.c (read-only)
into a shared lib and compares outputs — a golden test, not a code copy.
"""

import ctypes
import os
import subprocess
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.core import cmath, noise, vec


class TestVec:
    def test_dot_cross_norm(self, rng):
        a = rng.standard_normal((17, 3)).astype(np.float32)
        b = rng.standard_normal((17, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(vec.dot(a, b)), np.sum(a * b, -1), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vec.cross(a, b)), np.cross(a, b), rtol=1e-5, atol=1e-6)
        n = np.asarray(vec.norm(a))
        np.testing.assert_allclose(
            np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)

    def test_spherical_to_cartesian(self):
        # calc.h:17-22 convention: (r cos(az) sin(inc), r sin(az) sin(inc), r cos(inc))
        out = np.asarray(vec.spherical_to_cartesian(
            jnp.float32(2.0), jnp.float32(np.pi / 2), jnp.float32(0.0)))
        np.testing.assert_allclose(out, [2.0, 0.0, 0.0], atol=1e-6)
        out = np.asarray(vec.spherical_to_cartesian(
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(1.0)))
        np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-6)


class TestCMath:
    def test_powf_negative_integral(self):
        # C: powf(-2, 2) == 4, powf(-2, 3) == -8
        assert float(cmath.c_powf(-2.0, 2.0)) == 4.0
        assert float(cmath.c_powf(-2.0, 3.0)) == -8.0
        assert np.isnan(float(cmath.c_powf(-2.0, 2.5)))
        assert float(cmath.c_powf(0.0, 0.0)) == 1.0
        assert float(cmath.c_powf(0.0, 2.0)) == 0.0
        assert np.isinf(float(cmath.c_powf(0.0, -1.0)))

    def test_fmax_zero_nan(self):
        # C fmaxf(0, NaN) == 0 — clamps the NaN specular term (render.c:224)
        assert float(cmath.fmaxf_zero(jnp.float32(np.nan))) == 0.0
        assert float(cmath.fmaxf_zero(jnp.float32(-3.0))) == 0.0
        assert float(cmath.fmaxf_zero(jnp.float32(5.0))) == 5.0

    def test_fmax0_powf_grad_parity(self):
        """The custom VJP must match jax.grad of the naive composition
        fmaxf_zero(c_powf(x, s)) on every lane class the renderer can hit:
        positive, negative-integral, negative-non-integral (NaN->0),
        zero-base (0^0, 0^pos, 0^neg), zero-exponent."""
        import jax
        x = jnp.array([2.0, 0.5, -2.0, -2.0, -2.0, 0.0, 0.0, 0.0, 3.0, 1.0],
                      jnp.float32)
        s = jnp.array([3.0, 2.0, 2.0, 3.0, 2.5, 0.0, 2.0, -1.0, 0.0, 5.0],
                      jnp.float32)

        def naive(x, s):
            return jnp.sum(jnp.where(
                jnp.isnan(cmath.c_powf(x, s)), 0.0,
                cmath.fmaxf_zero(cmath.c_powf(x, s))))

        def fused(x, s):
            return jnp.sum(cmath.fmax0_powf(x, s))

        gx_n, gs_n = jax.grad(naive, (0, 1))(x, s)
        gx_f, gs_f = jax.grad(fused, (0, 1))(x, s)
        assert np.isfinite(np.asarray(gx_f)).all()
        assert np.isfinite(np.asarray(gs_f)).all()
        np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_f),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gs_n), np.asarray(gs_f),
                                   rtol=1e-5, atol=1e-6)

    def test_fmax0_powf_zero_base_negative_exponent_no_nan(self):
        """base==0, s<0 gives p=inf; the backward mask must exclude it
        (ADVICE r1): gradients are zero, not inf/NaN."""
        import jax
        gx, gs = jax.grad(
            lambda x, s: jnp.sum(cmath.fmax0_powf(x, s)), (0, 1))(
                jnp.float32(0.0), jnp.float32(-2.0))
        assert float(gx) == 0.0 and float(gs) == 0.0

    def test_fmax0_powf_blocks_nan_cotangent_on_inactive_lanes(self):
        """A NaN incoming cotangent on a clamped lane must not leak
        (cotangent inside the select, not 0*NaN)."""
        import jax
        x = jnp.array([-1.5, 2.0], jnp.float32)   # lane 0: NaN->0 (inactive)
        s = jnp.array([2.5, 2.0], jnp.float32)
        _, vjp = jax.vjp(cmath.fmax0_powf, x, s)
        gx, gs = vjp(jnp.array([np.nan, 1.0], jnp.float32))
        assert float(gx[0]) == 0.0 and float(gs[0]) == 0.0
        assert np.isfinite(float(gx[1])) and np.isfinite(float(gs[1]))


@pytest.fixture(scope="module")
def ref_noise(reference_root):
    """Compile the reference SimplexNoise into a shared object for golden
    comparison."""
    src = os.path.join(reference_root, "lib/SimplexNoise/SimplexNoise.c")
    inc = os.path.join(reference_root, "lib/SimplexNoise")
    if not os.path.exists(src):
        pytest.skip("reference SimplexNoise.c not present")
    tmp = tempfile.mkdtemp(prefix="refnoise_")
    so = os.path.join(tmp, "noise.so")
    try:
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", "-I", inc, src, "-o", so, "-lm"],
            check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("gcc unavailable")
    lib = ctypes.CDLL(so)
    lib.simplex_noise.restype = ctypes.c_float
    lib.simplex_noise.argtypes = [ctypes.c_float] * 3
    return lib


class TestNoise:
    def test_zero_at_integers(self):
        pts = np.arange(-3, 4, dtype=np.float32)
        out = np.asarray(noise.simplex_noise(pts, pts, pts))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_range(self, rng):
        p = (rng.standard_normal((4096, 3)) * 10).astype(np.float32)
        out = np.asarray(noise.simplex_noise(p[:, 0], p[:, 1], p[:, 2]))
        assert np.all(np.abs(out) <= 1.0 + 1e-5)
        assert np.std(out) > 0.05  # non-degenerate

    def test_matches_reference(self, ref_noise, rng):
        p = (rng.standard_normal((2000, 3)) * 7).astype(np.float32)
        ours = np.asarray(noise.simplex_noise(p[:, 0], p[:, 1], p[:, 2]))
        theirs = np.array(
            [ref_noise.simplex_noise(*map(float, q)) for q in p],
            dtype=np.float32)
        np.testing.assert_allclose(ours, theirs, atol=2e-6)
