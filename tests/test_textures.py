"""Texture evaluator unit tests vs closed-form cases (material.c:152-200).

These pin the SoA evaluators (the render path's single implementation)
directly; end-to-end coverage comes from the scene2/scene6 goldens."""

import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.scene import make_scene
from c_raytracer_tpu.scene import types as T
from c_raytracer_tpu.textures import texture_color_soa


def _scene():
    base = dict(ks=[0, 0, 0], ka=[0, 0, 0], kr=[0, 0, 0], kt=[0, 0, 0],
                ke=[0, 0, 0], shininess=1.0, refractive_index=1.0)
    mats = [
        dict(base, tex_type=T.TEX_UNIFORM, tex_color=[0.2, 0.4, 0.6]),
        dict(base, tex_type=T.TEX_CHECKERBOARD, tex_color=[1, 1, 1],
             tex_color2=[0, 0, 0], tex_scale=1.0),
        dict(base, tex_type=T.TEX_BRICK, tex_color=[0.8, 0.2, 0.1],
             tex_color2=[0.5, 0.5, 0.5], tex_scale=1.0, tex_p1=0.1),
        dict(base, tex_type=T.TEX_NOISY_PERIODIC, tex_color=[0.1, 0.1, 0.1],
             tex_color2=[0.5, 0.25, 0.125], tex_scale=1.0, tex_p1=0.0,
             tex_p2=1.0, tex_func=T.FUNC_SAW),
        dict(base, ke=[1, 1, 1]),
    ]
    return make_scene(
        sphere_center=[[0, 0, 0]], sphere_radius=[1.0], sphere_material=[4],
        sphere_lights=[1], materials=mats,
        camera=dict(position=[0, 0, -5], vector_x=[1, 0, 0],
                    vector_y=[0, 1, 0], fov=90, focal_length=1.0))


@pytest.fixture(scope="module")
def setup():
    sc = _scene()
    from c_raytracer_tpu.geometry import primitives as G
    ds = G.device_scene(sc.params, sc.static)
    def ev(mat, pts):
        pts = np.asarray(pts, np.float32)
        out = texture_color_soa(
            ds.materials, sc.static,
            jnp.full((len(pts),), mat, jnp.int32),
            v3m.from_aos(jnp.asarray(pts)))
        return np.asarray(v3m.to_aos(out))
    return ev


class TestTextures:
    def test_uniform(self, setup):
        np.testing.assert_allclose(
            setup(0, [[3.7, -1.2, 9.9]]), [[0.2, 0.4, 0.6]], rtol=1e-6)

    def test_checkerboard_parity(self, setup):
        # (material.c:159-166) parity of truncated scaled coords;
        # truncation toward zero: (0.5,0,0)->0 even; (1.5,0,0)->1 odd;
        # (-0.5,0,0) truncates to 0 -> even
        out = setup(1, [[0.5, 0.2, 0.2], [1.5, 0.2, 0.2], [-0.5, 0.2, 0.2],
                        [1.5, 1.5, 0.2]])
        np.testing.assert_allclose(
            out, [[1, 1, 1], [0, 0, 0], [1, 1, 1], [1, 1, 1]], atol=1e-7)

    def test_brick_mortar_and_row_offset(self, setup):
        # (material.c:168-177) mortar where frac(x) < w or frac(y') < w,
        # y' = y - 0.5·(int(x) % 2)
        out = setup(2, [
            [0.05, 0.5, 0.0],    # frac(x)=0.05 < 0.1 -> mortar
            [0.5, 0.5, 0.0],     # brick
            [1.5, 1.02, 0.0],    # odd column: y'=0.52 -> brick
            [1.5, 0.55, 0.0],    # odd column: y'=0.05 -> mortar
        ])
        np.testing.assert_allclose(
            out, [[0.5, 0.5, 0.5], [0.8, 0.2, 0.1],
                  [0.8, 0.2, 0.1], [0.5, 0.5, 0.5]], rtol=1e-6)

    def test_noisy_periodic_saw_envelope(self, setup):
        # noise scale 0 -> angle = x·freq; saw envelope = frac(angle)
        # (material.c:179-200); color = gradient·env + base
        x = np.array([0.25, 1.75, -0.5], np.float32)
        out = setup(3, [[v, 0.3, 0.7] for v in x])
        env = x - np.floor(x)
        want = np.outer(env, [0.5, 0.25, 0.125]) + 0.1
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
