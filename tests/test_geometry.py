"""Intersection unit tests vs closed-form cases (SURVEY.md §4), on the SoA
render-path kernels (the only implementations — the unused AoS duplicates
were removed; one source of truth per kernel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.scene import make_scene


def simple_scene():
    """One sphere at origin r=1, one triangle in z=2 plane, one floor
    plane y=-2, plus an emitter sphere."""
    return make_scene(
        sphere_center=[[0, 0, 0], [10, 10, 10]],
        sphere_radius=[1.0, 0.5],
        sphere_material=[0, 1], sphere_epsilon=[1e-4, 1e-4],
        sphere_lights=[0, 10],
        tri_vertices=[[[-1, -1, 2], [1, -1, 2], [0, 1, 2]]],
        tri_material=[0], tri_epsilon=[1e-4], tri_lights=[0],
        plane_point=[[0, -2, 0]], plane_normal=[[0, 1, 0]],
        plane_material=[0], plane_epsilon=[1e-6],
        materials=[
            dict(ks=[0, 0, 0], ka=[1, 1, 1], kr=[0, 0, 0], kt=[0, 0, 0],
                 ke=[0, 0, 0], shininess=1.0, refractive_index=1.0,
                 tex_color=[1, 0, 0]),
            dict(ks=[0, 0, 0], ka=[0, 0, 0], kr=[0, 0, 0], kt=[0, 0, 0],
                 ke=[1, 1, 1], shininess=1.0, refractive_index=1.0),
        ],
        camera=dict(position=[0, 0, -5], vector_x=[1, 0, 0],
                    vector_y=[0, 1, 0], fov=90, focal_length=1.0),
    )


@pytest.fixture(scope="module")
def scene():
    return simple_scene()


@pytest.fixture(scope="module")
def ds(scene):
    return G.device_scene(scene.params, scene.static)


def closest(ds, static, o, d, **kw):
    t, gid, mat, n = G.closest_hit_soa(
        ds, static, v3m.from_aos(jnp.asarray(o, jnp.float32)),
        v3m.from_aos(jnp.asarray(d, jnp.float32)), **kw)
    return t, gid, np.asarray(v3m.to_aos(n))


def any_tint(ds, static, o, d, max_dist, exclude, **kw):
    blocked, tint = G.any_hit_tint_soa(
        ds, static, v3m.from_aos(jnp.asarray(o, jnp.float32)),
        v3m.from_aos(jnp.asarray(d, jnp.float32)),
        jnp.asarray(max_dist, jnp.float32),
        jnp.asarray(exclude, jnp.int32), **kw)
    return blocked, np.asarray(v3m.to_aos(tint))


class TestClosestHit:
    def test_sphere_front(self, ds, scene):
        t, gid, n = closest(ds, scene.static,
                            [[0.0, 0.0, -5.0]], [[0.0, 0.0, 1.0]])
        assert float(t[0]) == pytest.approx(4.0, abs=1e-5)
        assert int(gid[0]) == 0
        np.testing.assert_allclose(n[0], [0, 0, -1], atol=1e-5)

    def test_inside_sphere_far_root(self, ds, scene):
        # ray from center: near root negative, far root positive
        # (object.c:316-320)
        t, gid, n = closest(ds, scene.static,
                            [[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
        assert float(t[0]) == pytest.approx(1.0, abs=1e-5)
        assert int(gid[0]) == 0
        # outward normal (not flipped): points along +z = same as ray
        np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-5)

    def test_triangle_hit_and_miss(self, ds, scene):
        t, gid, n = closest(
            ds, scene.static,
            [[0.0, 0.0, 1.5], [5.0, 5.0, 1.5]],
            [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        assert float(t[0]) == pytest.approx(0.5, abs=1e-5)
        assert int(gid[0]) == 2  # global id: spheres 0,1 then triangle 2
        assert int(gid[1]) == -1

    def test_plane_backside_normal_flip(self, ds, scene):
        # from below the floor, normal returned faces the ray
        # (object.c:481-484)
        t, gid, n = closest(ds, scene.static,
                            [[0.0, -3.0, 0.0]], [[0.0, 1.0, 0.0]])
        assert float(t[0]) == pytest.approx(1.0, abs=1e-5)
        assert int(gid[0]) == 3
        np.testing.assert_allclose(n[0], [0, -1, 0], atol=1e-6)

    def test_epsilon_rejects_self_hit(self, ds, scene):
        # origin on sphere surface, ray tangent-outward: no self hit
        t, gid, n = closest(ds, scene.static,
                            [[0.0, 0.0, -1.0]], [[0.0, 0.0, -1.0]])
        assert int(gid[0]) == -1

    def test_nan_ray_misses(self, ds, scene):
        # NaN refraction rays must miss everything (render.c:337 behavior)
        t, gid, n = closest(ds, scene.static, [[0.0, 0.0, -5.0]],
                            [[jnp.nan, jnp.nan, jnp.nan]])
        assert int(gid[0]) == -1


class TestAnyHit:
    def test_opaque_blocks(self, ds, scene):
        blocked, tint = any_tint(ds, scene.static,
                                 [[0.0, 0.0, -5.0]], [[0.0, 0.0, 1.0]],
                                 [100.0], [-1])
        assert bool(blocked[0])

    def test_exclude_emitter(self, ds, scene):
        # ray toward emitter sphere (gid 1) only
        blocked, _ = any_tint(ds, scene.static,
                              [[10.0, 10.0, 5.0]], [[0.0, 0.0, 1.0]],
                              [100.0], [1])
        assert not bool(blocked[0])

    def test_out_of_range_not_blocking(self, ds, scene):
        blocked, _ = any_tint(ds, scene.static,
                              [[0.0, 0.0, -5.0]], [[0.0, 0.0, 1.0]],
                              [2.0], [-1])  # sphere at t=4
        assert not bool(blocked[0])


class TestIntersectPrim:
    def test_single_sphere(self, ds):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, hit, n = G.intersect_prim(ds, o, d, jnp.array([0], jnp.int32))
        assert bool(hit[0]) and float(t[0]) == pytest.approx(1.0, abs=1e-5)

    def test_gid_minus_one_misses(self, ds):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, hit, n = G.intersect_prim(ds, o, d, jnp.array([-1], jnp.int32))
        assert not bool(hit[0])

    def test_plane_prim(self, ds):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, -1.0, 0.0]])
        t, hit, n = G.intersect_prim(ds, o, d, jnp.array([3], jnp.int32))
        assert bool(hit[0]) and float(t[0]) == pytest.approx(2.0, abs=1e-5)
        np.testing.assert_allclose(np.asarray(n[0]), [0, 1, 0], atol=1e-6)


class TestChunking:
    def test_triangle_chunked_equals_unchunked(self, rng):
        # many triangles so chunking kicks in
        nt = 300
        v = rng.standard_normal((nt, 3, 3)).astype(np.float32) * 2
        sc = make_scene(
            sphere_center=[[50, 50, 50]], sphere_radius=[1.0],
            sphere_material=[1], sphere_epsilon=[1e-4], sphere_lights=[1],
            tri_vertices=v, tri_material=[0] * nt, tri_epsilon=[1e-5] * nt,
            tri_lights=[0] * nt,
            materials=[
                dict(ks=[0, 0, 0], ka=[1, 1, 1], kr=[0, 0, 0], kt=[0, 0, 0],
                     ke=[0, 0, 0], shininess=1.0, refractive_index=1.0),
                dict(ks=[0, 0, 0], ka=[0, 0, 0], kr=[0, 0, 0], kt=[0, 0, 0],
                     ke=[1, 1, 1], shininess=1.0, refractive_index=1.0),
            ],
            camera=dict(position=[0, 0, -5], vector_x=[1, 0, 0],
                        vector_y=[0, 1, 0], fov=90, focal_length=1.0),
        )
        ds = G.device_scene(sc.params, sc.static)
        o = rng.standard_normal((64, 3)).astype(np.float32) * 5
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        t1, g1, n1 = closest(ds, sc.static, o, d, tri_chunk=64)
        t2, g2, n2 = closest(ds, sc.static, o, d, tri_chunk=4096)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
