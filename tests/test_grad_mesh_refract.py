"""FD-gradient gates beyond scene1 (VERDICT r3 #3): central-difference
checks of (a) triangle-vertex gradients on a mesh scene with the CLUSTER
path ON — covering the AABB-refit/stop_gradient seams of
accel/traverse.pack_clusters and the Möller-Trumbore VJP
(object.c:422-441) — and (b) the refraction VJP (render.c:319-340,
shading.refract_dir) via d(loss)/d(refractive_index), which flows
EXCLUSIVELY through the Snell rotation chain.

Methodology follows tests/test_grad.py: deterministic key, smooth weighted
pixel loss, tolerance-gated (hit/occlusion boundaries make the image only
a.e.-differentiable; min_mag floors the float32 FD noise).  A sign-flipped
gradient fails every parametrization whose magnitude clears the floor.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import types as T

from test_grad import check_component, _set


def _bumpy_mesh_scene(n=8):
    """Deterministic bumpy height-field mesh (2·n² triangles), emitter
    sphere, ambient — every center triangle is directly visible so vertex
    perturbations change hit t, the derived normal, and shading."""
    xs = np.linspace(-3, 3, n + 1, dtype=np.float32)
    zs = np.linspace(-3, 3, n + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    gy = 0.4 * np.sin(gx) * np.cos(gz)
    v = np.stack([gx, gy, gz], -1)                      # (n+1, n+1, 3)
    tris = []
    for i in range(n):
        for j in range(n):
            a, b = v[i, j], v[i + 1, j]
            c, d = v[i + 1, j + 1], v[i, j + 1]
            tris.append([a, b, c])
            tris.append([a, c, d])
    tv = np.asarray(tris, np.float32)                   # (2n², 3, 3)
    return T.make_scene(
        sphere_center=[[0.0, 6.0, 0.0]], sphere_radius=[0.5],
        sphere_material=[1], sphere_lights=[4],
        tri_vertices=tv, tri_material=[0] * len(tv),
        materials=[
            dict(ks=[0.6, 0.6, 0.6], ka=[0.3, 0.3, 0.3], shininess=4.0,
                 tex_color=[0.9, 0.8, 0.7]),
            dict(ke=[30.0, 30.0, 30.0], tex_color=[1, 1, 1]),
        ],
        camera=dict(position=[0.0, 2.5, -5.0], vector_x=[1, 0, 0],
                    vector_y=[0, 1, 0.4], fov=70, focal_length=1),
        ambient=(0.25, 0.25, 0.25))


def _glass_sphere_scene():
    """Transparent sphere over a lit plane (scene3 class): camera rays
    refract through the sphere onto the plane, so the plane-hit position,
    segment attenuation and shadow kt tints all vary smoothly with the
    refractive index and kt."""
    return T.make_scene(
        sphere_center=[[0.0, 0.0, 0.0], [1.5, 3.0, -2.0]],
        sphere_radius=[1.0, 0.4],
        sphere_material=[0, 2], sphere_lights=[0, 4],
        plane_point=[[0, -2.0, 0]], plane_normal=[[0, 1, 0]],
        plane_material=[1],
        materials=[
            dict(ks=[0.3, 0.3, 0.3], kt=[0.9, 0.85, 0.8], shininess=5.0,
                 refractive_index=1.5, tex_color=[0, 0, 0]),
            dict(ks=[0.2, 0.2, 0.2], ka=[0.4, 0.4, 0.4], shininess=2.0,
                 tex_color=[0.8, 0.85, 0.9]),
            dict(ke=[25.0, 25.0, 25.0], tex_color=[1, 1, 1]),
        ],
        camera=dict(position=[0.0, 0.3, -4.0], vector_x=[1, 0, 0],
                    vector_y=[0, 1, 0.08], fov=55, focal_length=1),
        ambient=(0.2, 0.2, 0.2))


@pytest.fixture(scope="module")
def mesh_setup():
    scene = _bumpy_mesh_scene()
    # cluster path ON despite the small mesh (auto would pick dense):
    # the vertex VJP must traverse pack_clusters' packed blocks and the
    # refit/stop_gradient seams, not the brute-force path
    cfg = RenderConfig(max_bounces=2, rounds=3, accel="cluster",
                       bvh_cluster=16, bvh_visits=8, light_chunk=8)
    fn = make_renderer(scene.static, cfg, 24, 24, jit=False)
    key = jax.random.PRNGKey(5)
    w = jax.random.uniform(jax.random.PRNGKey(13), (24, 24, 3))

    def loss(params):
        img, _ = fn(params, key)
        return jnp.sum(img * w)

    g = jax.jit(jax.grad(loss))(scene.params)
    return scene, jax.jit(loss), g


@pytest.fixture(scope="module")
def glass_setup():
    scene = _glass_sphere_scene()
    cfg = RenderConfig(max_bounces=4, rounds=8, light_chunk=8)
    fn = make_renderer(scene.static, cfg, 24, 24, jit=False)
    key = jax.random.PRNGKey(7)
    w = jax.random.uniform(jax.random.PRNGKey(17), (24, 24, 3))

    def loss(params):
        img, _ = fn(params, key)
        return jnp.sum(img * w)

    g = jax.jit(jax.grad(loss))(scene.params)
    return scene, jax.jit(loss), g


class TestTriangleVertexGrads:
    """d(loss)/d(tri_vertices) vs central differences, cluster path ON."""

    def test_grads_finite_and_substantial(self, mesh_setup):
        _, _, g = mesh_setup
        tv = np.asarray(g.tri_vertices)
        assert np.all(np.isfinite(tv))
        # the mesh fills the frame: many triangles must carry real signal
        assert (np.abs(tv).max(axis=(1, 2)) > 1e-3).sum() > 20

    # central-ish triangles of the 8x8 grid (2 tris per cell, row-major
    # over (i, j)): cell (4, 4) -> tris 72/73; cell (3, 4) -> 56/57.
    # eps swept on CPU: 2.5e-4 sits below the crack-silhouette scale
    # (perturbing a vertex opens an eps-wide crack between duplicated
    # vertices) while keeping the FD secant on-slope.
    @pytest.mark.parametrize("ti,vi,ci,eps", [
        (72, 0, 1, 2.5e-4),   # center cell, vertex 0, y (height)
        (72, 1, 0, 2.5e-4),   # center cell, vertex 1, x
        (73, 2, 1, 2.5e-4),
        (56, 0, 1, 2.5e-4),
        (57, 1, 2, 2.5e-4),   # z component
    ])
    def test_vertex_fd(self, mesh_setup, ti, vi, ci, eps):
        scene, loss, g = mesh_setup

        def getter(tree):
            return tree.tri_vertices[ti, vi, ci]

        def setter(tree, v):
            tv = _set(tree.tri_vertices, (ti, vi, ci), v)
            return dataclasses.replace(tree, tri_vertices=tv)

        check_component(loss, scene.params, g, getter, setter,
                        eps=eps, rtol=0.25, min_mag=2e-3)


class TestRefractionGrads:
    """d(loss)/d(refractive_index) flows only through refract_dir's VJP
    (render.c:319-340); kt flows through both the carried throughput and
    the shadow tint product (accel.c:370-373)."""

    def test_refraction_chain_is_live(self, glass_setup):
        scene, loss, g = glass_setup
        # the glass material's ior gradient must be nonzero — if the
        # refraction push never fires the test scene is miscalibrated
        assert abs(float(g.materials.refractive_index[0])) > 1e-3

    def test_ior_fd(self, glass_setup):
        scene, loss, g = glass_setup

        def getter(tree):
            return tree.materials.refractive_index[0]

        def setter(tree, v):
            mats = dataclasses.replace(
                tree.materials,
                refractive_index=_set(tree.materials.refractive_index,
                                      0, v))
            return dataclasses.replace(tree, materials=mats)

        # TIR boundaries at the sphere limb flip under perturbation;
        # interior refraction dominates the weighted loss
        check_component(loss, scene.params, g, getter, setter,
                        eps=1e-3, rtol=0.25, min_mag=1e-3)

    @pytest.mark.parametrize("ci", [0, 1, 2])
    def test_kt_fd(self, glass_setup, ci):
        scene, loss, g = glass_setup

        def getter(tree):
            return tree.materials.kt[0, ci]

        def setter(tree, v):
            mats = dataclasses.replace(
                tree.materials, kt=_set(tree.materials.kt, (0, ci), v))
            return dataclasses.replace(tree, materials=mats)

        check_component(loss, scene.params, g, getter, setter,
                        eps=1e-3, rtol=0.15, min_mag=1e-3)

    def test_glass_center_fd(self, glass_setup):
        """Sphere-center z: hit distances AND the refraction geometry move
        together — the composite VJP against FD."""
        scene, loss, g = glass_setup

        def getter(tree):
            return tree.sphere_center[0, 2]

        def setter(tree, v):
            sc = _set(tree.sphere_center, (0, 2), v)
            return dataclasses.replace(tree, sphere_center=sc)

        check_component(loss, scene.params, g, getter, setter,
                        eps=2.5e-4, rtol=0.3, min_mag=2e-3)

    def test_sign_flip_detected(self, glass_setup):
        """The gate actually discriminates: a sign-flipped analytic ior
        gradient must fail the same tolerance check."""
        scene, loss, g = glass_setup
        flipped = -float(g.materials.refractive_index[0])
        from test_grad import fd

        def getter(tree):
            return tree.materials.refractive_index[0]

        def setter(tree, v):
            mats = dataclasses.replace(
                tree.materials,
                refractive_index=_set(tree.materials.refractive_index,
                                      0, v))
            return dataclasses.replace(tree, materials=mats)

        numeric = fd(loss, scene.params, getter, setter, 1e-3)
        assert abs(flipped - numeric) > 0.25 * max(abs(flipped),
                                                   abs(numeric))
