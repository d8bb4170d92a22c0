"""Intersection unit tests vs closed-form cases (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

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
def ds():
    sc = simple_scene()
    return G.device_scene(sc.params, sc.static)


class TestClosestHit:
    def test_sphere_front(self, ds):
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, gid, n = G.closest_hit(ds, o, d)
        assert float(t[0]) == pytest.approx(4.0, abs=1e-5)
        assert int(gid[0]) == 0
        np.testing.assert_allclose(np.asarray(n[0]), [0, 0, -1], atol=1e-5)

    def test_inside_sphere_far_root(self, ds):
        # ray from center: near root negative, far root positive
        # (object.c:316-320)
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t, gid, n = G.closest_hit(ds, o, d)
        assert float(t[0]) == pytest.approx(1.0, abs=1e-5)
        assert int(gid[0]) == 0
        # outward normal (not flipped): points along +z = same as ray
        np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-5)

    def test_triangle_hit_and_miss(self, ds):
        o = jnp.array([[0.0, 0.0, 1.5], [5.0, 5.0, 1.5]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        t, gid, n = G.closest_hit(ds, o, d)
        assert float(t[0]) == pytest.approx(0.5, abs=1e-5)
        assert int(gid[0]) == 2  # global id: spheres 0,1 then triangle 2
        assert int(gid[1]) == -1

    def test_plane_backside_normal_flip(self, ds):
        # from below the floor, normal returned faces the ray
        # (object.c:481-484)
        o = jnp.array([[0.0, -3.0, 0.0]])
        d = jnp.array([[0.0, 1.0, 0.0]])
        t, gid, n = G.closest_hit(ds, o, d)
        assert float(t[0]) == pytest.approx(1.0, abs=1e-5)
        assert int(gid[0]) == 3
        np.testing.assert_allclose(np.asarray(n[0]), [0, -1, 0], atol=1e-6)

    def test_epsilon_rejects_self_hit(self, ds):
        # origin on sphere surface, ray tangent-outward: no self hit
        o = jnp.array([[0.0, 0.0, -1.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        t, gid, n = G.closest_hit(ds, o, d)
        assert int(gid[0]) == -1

    def test_nan_ray_misses(self, ds):
        # NaN refraction rays must miss everything (render.c:337 behavior)
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[jnp.nan, jnp.nan, jnp.nan]])
        t, gid, n = G.closest_hit(ds, o, d)
        assert int(gid[0]) == -1


class TestAnyHit:
    def test_opaque_blocks(self, ds):
        sc = simple_scene()
        transp = jnp.array(sc.static.is_transparent)
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        blocked, tint = G.any_hit_tint(
            ds, transp, ds.materials.kt, o, d,
            jnp.array([100.0]), jnp.array([-1], jnp.int32))
        assert bool(blocked[0])

    def test_exclude_emitter(self, ds):
        sc = simple_scene()
        transp = jnp.array(sc.static.is_transparent)
        # ray toward emitter sphere (gid 1) only
        o = jnp.array([[10.0, 10.0, 5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        blocked, _ = G.any_hit_tint(
            ds, transp, ds.materials.kt, o, d,
            jnp.array([100.0]), jnp.array([1], jnp.int32))
        assert not bool(blocked[0])

    def test_out_of_range_not_blocking(self, ds):
        sc = simple_scene()
        transp = jnp.array(sc.static.is_transparent)
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        blocked, _ = G.any_hit_tint(
            ds, transp, ds.materials.kt, o, d,
            jnp.array([2.0]), jnp.array([-1], jnp.int32))  # sphere at t=4
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
        o = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32) * 5)
        d = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t1, g1, n1 = G.closest_hit(ds, o, d, tri_chunk=64)
        t2, g2, n2 = G.closest_hit(ds, o, d, tri_chunk=4096)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
