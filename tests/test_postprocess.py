"""Postprocess ops vs the reference postprocess binary's output, plus TIFF
codec roundtrips (raw handoff = the reference's checkpoint/resume format)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.image import read_tiff, write_tiff_raw, write_tiff_rgb8
from c_raytracer_tpu.image.tiff import quantize_rgb8
from c_raytracer_tpu.postprocess import brighten, depth_of_field, mist

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def raw():
    # NOTE: the reference raster is malloc'd uninitialized (image.c:45) and
    # miss pixels are never written, so the raw golden contains garbage
    # incl. NaN on background pixels; quantize_rgb8 replicates the C NaN
    # clamp (NaN -> 255) so comparisons still match.
    img, z = read_tiff(os.path.join(GOLDEN_DIR, "scene1_96_raw.tif"))
    assert z is not None and z.shape[0] == 96 * 96
    return img, z.reshape(96, 96)


def q8(img):
    return quantize_rgb8(np.asarray(img)).astype(np.int32)


def golden(name):
    img, _ = read_tiff(os.path.join(GOLDEN_DIR, name))
    return (img * 255.0).astype(np.int32)


class TestTiff:
    def test_raw_roundtrip(self, tmp_path, rng):
        img = rng.random((13, 17, 3)).astype(np.float32)
        z = rng.random(13 * 17).astype(np.float32)
        p = str(tmp_path / "r.tif")
        write_tiff_raw(p, img, z)
        img2, z2 = read_tiff(p)
        np.testing.assert_array_equal(img, img2)
        np.testing.assert_array_equal(z, z2)

    def test_rgb8_roundtrip(self, tmp_path, rng):
        img = rng.random((8, 8, 3)).astype(np.float32)
        p = str(tmp_path / "q.tif")
        write_tiff_rgb8(p, img)
        img2, z2 = read_tiff(p)
        assert z2 is None
        np.testing.assert_allclose(img2, np.clip(img, 0, 1), atol=1 / 255.0)

    def test_pil_can_read_ours(self, tmp_path, rng):
        PIL = pytest.importorskip("PIL.Image")
        img = rng.random((9, 11, 3)).astype(np.float32)
        p = str(tmp_path / "q.tif")
        write_tiff_rgb8(p, img)
        arr = np.array(PIL.open(p))
        assert arr.shape == (9, 11, 3)

    def test_reads_libtiff_output(self, raw):
        img, z = raw
        assert img.shape == (96, 96, 3)
        assert img.dtype == np.float32


class TestBrighten:
    def test_vs_reference(self, raw):
        img, _ = raw
        ours = q8(brighten(jnp.asarray(img), 2.5))
        np.testing.assert_array_equal(ours, golden("pp_brighten.tif"))


class TestMist:
    def test_vs_reference(self, raw):
        img, z = raw
        ours = q8(mist(jnp.asarray(img), jnp.asarray(z), 2.0, 10.0, "lin",
                       [0.5, 0.6, 0.7]))
        diff = np.abs(ours - golden("pp_mist.tif"))
        assert (diff <= 1).mean() > 0.999 and diff.max() <= 2


class TestDoF:
    def test_vs_reference(self, raw):
        img, z = raw
        b = brighten(jnp.asarray(img), 2.0)
        ours = q8(depth_of_field(b, jnp.asarray(z), 0.02, -1.0))
        diff = np.abs(ours - golden("pp_dof.tif"))
        # forward-scatter vs gather reformulation: identical math, float
        # summation order differs inside the normalization
        assert (diff.max(-1) <= 1).mean() > 0.995, (
            f"mean {diff.mean()}, max {diff.max()}")

    def test_no_blur_identity(self, raw):
        img, z = raw
        # scale=0, bias=0 -> radius 0 everywhere -> alpha 1, identity
        out = depth_of_field(jnp.asarray(img), jnp.asarray(z), 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


@pytest.fixture(scope="module")
def raw3():
    """scene3 raw render (closed room: every ray hits, z > 0 everywhere —
    --dof-camera divides by z_min, so the reference segfaults on images
    with background pixels)."""
    img, z = read_tiff(os.path.join(GOLDEN_DIR, "scene3_96_raw.tif"))
    return img, z.reshape(96, 96)


class TestDoFCamera:
    def test_vs_reference(self, raw3):
        """--dof-camera golden (postproc.c:52-69 scale/bias derivation)."""
        from c_raytracer_tpu.postprocess import dof_camera_params
        img, z = raw3
        scale, bias = dof_camera_params(jnp.asarray(z), 0.1, 0.2, 3.0)
        ours = q8(depth_of_field(jnp.asarray(img), jnp.asarray(z),
                                 scale, bias))
        np.testing.assert_array_equal(ours, golden("pp_dof_camera.tif"))

    def test_big_radius_vs_reference(self, raw3):
        """CoC radii up to 9 px: exercises the full rasterized-disc logic
        (hh = int(sqrt(r²−x²)), occlusion, boundary clamp) vs the C binary.

        Gate is 99.9% (not exact): the raw input contains the reference
        raster's uninitialized-memory garbage (±1e36 texels); a few pixels
        accumulate sums OF that garbage whose sign depends on float
        summation order, flipping their 0/255 clamp across platforms."""
        img, z = raw3
        ours = q8(depth_of_field(jnp.asarray(img), jnp.asarray(z),
                                 1.2, -12.0))
        diff = np.abs(ours - golden("pp_dof_big.tif")).max(-1)
        assert (diff <= 1).mean() >= 0.999, (
            f"within1={(diff <= 1).mean()}, max={diff.max()}")

    def test_jit_static_radius_matches_eager(self, raw3):
        """Production path: jitted with a static max_radius bound (no host
        sync) must equal the eager auto-radius result when the bound
        covers the true max."""
        import functools
        img, z = raw3
        eager = np.asarray(depth_of_field(jnp.asarray(img), jnp.asarray(z),
                                          1.2, -12.0))
        f = jax.jit(functools.partial(depth_of_field, max_radius=12))
        jitted = np.asarray(f(jnp.asarray(img), jnp.asarray(z), 1.2, -12.0))
        fin = np.isfinite(eager)   # raw input has NaN texels; NaN == NaN
        np.testing.assert_array_equal(fin, np.isfinite(jitted))
        np.testing.assert_array_equal(eager[fin], jitted[fin])

    def test_jit_under_trace_requires_bound(self, raw3):
        img, z = raw3
        with pytest.raises((ValueError, jax.errors.ConcretizationTypeError)):
            jax.jit(depth_of_field)(jnp.asarray(img), jnp.asarray(z),
                                    1.2, -12.0)


class TestCLI:
    def test_mist_inv_quad_token(self, tmp_path, rng):
        """The reference accepts the token 'inv-quad' (pp/main.c:41,
        postproc.c:84 hash 624812280); a reference-valid command line must
        work here too."""
        from c_raytracer_tpu.cli.postprocess import main
        img = rng.random((8, 8, 3)).astype(np.float32)
        z = rng.random(8 * 8).astype(np.float32) * 5.0
        inp, outp = str(tmp_path / "in.tif"), str(tmp_path / "out.tif")
        write_tiff_raw(inp, img, z)
        rc = main([inp, outp, "--mist", "1", "10", "inv-quad",
                   "0.5", "0.6", "0.7"])
        assert rc == 0
        got, _ = read_tiff(outp)
        want = q8(mist(jnp.asarray(img), jnp.asarray(z.reshape(8, 8)),
                       1.0, 10.0, "inv_quad", [0.5, 0.6, 0.7]))
        np.testing.assert_array_equal((got * 255.0).astype(np.int32), want)

    def test_mist_bad_token_rejected(self, tmp_path, rng):
        from c_raytracer_tpu.cli.postprocess import main
        img = rng.random((4, 4, 3)).astype(np.float32)
        z = np.ones(16, np.float32)
        inp = str(tmp_path / "in.tif")
        write_tiff_raw(inp, img, z)
        assert main([inp, str(tmp_path / "o.tif"),
                     "--mist", "1", "10", "cubic", "0", "0", "0"]) == 1
