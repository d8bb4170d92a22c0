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
