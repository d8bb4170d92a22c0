"""Differentiability gate (BASELINE.json): jax.grad of the renderer vs
central finite differences on scene1.

The renderer is a deterministic function of (params, key); with a fixed key
the FD probe perturbs the same program.  Hit/miss and occlusion boundaries
make the image only a.e.-differentiable, so the loss is a smooth weighted
sum over all pixels (boundary pixels are measure-~0 at the FD step) and the
comparison is tolerance-gated.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene


@pytest.fixture(scope="module")
def setup(reference_root):
    scene = load_scene(os.path.join(reference_root, "scenes/scene1.json"))
    # few light samples keep FD cheap; bounces exercise the reflect chain
    static = dataclasses.replace(
        scene.static,
        num_lights=tuple(min(n, 4) for n in scene.static.num_lights))
    cfg = RenderConfig(max_bounces=3, rounds=4)
    fn = make_renderer(static, cfg, 24, 24, jit=False)
    key = jax.random.PRNGKey(3)
    w = jax.random.uniform(jax.random.PRNGKey(11), (24, 24, 3))

    def loss(params):
        img, _ = fn(params, key)
        return jnp.sum(img * w)

    g = jax.jit(jax.grad(loss))(scene.params)
    return scene, jax.jit(loss), g


def fd(loss, params, get, setv, eps):
    p0 = get(params)
    lp = float(loss(setv(params, p0 + eps)))
    lm = float(loss(setv(params, p0 - eps)))
    return (lp - lm) / (2 * eps)


def replace_leaf(params, path, value):
    """Replace a scalar inside the params pytree via flatten/unflatten."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out = []
    for i, leaf in enumerate(leaves):
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def check_component(loss, params, grads, getter, setter, eps, rtol,
                    min_mag=1e-4):
    """min_mag is the float32 central-difference noise floor: the loss sums
    ~1.7k products of O(0.1) values, so FD deltas below ~1e-4 are
    quantization noise, not signal."""
    analytic = float(getter(grads))
    numeric = fd(loss, params, getter, setter, eps)
    if abs(analytic) < min_mag and abs(numeric) < min_mag:
        return  # both below the FD noise floor
    assert np.isfinite(analytic) and np.isfinite(numeric)
    assert abs(analytic - numeric) <= rtol * max(
        abs(analytic), abs(numeric)), (
        f"grad mismatch: analytic {analytic} vs FD {numeric}")


def _set(leaf, idx, v):
    """Functional index-set on a host-side (NumPy) SceneParams leaf."""
    leaf = np.array(leaf)
    leaf[idx] = v
    return leaf


class TestGradVsFiniteDifferences:
    def test_all_grads_finite(self, setup):
        _, _, g = setup
        for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
            assert bool(jnp.all(jnp.isfinite(leaf))), \
                f"non-finite grad at {jax.tree_util.keystr(path)}"

    @pytest.mark.parametrize("which", [
        # eps per component (verified sweeps on CPU and TPU):
        # sphere_center[1,0] flips silhouette/occlusion boundaries at
        # eps >= 5e-4 and needs the tiny step, while plane_d's loss has
        # curvature at the 5e-4..1e-3 scale on BOTH platforms (secant
        # reads -0.21 vs slope -0.26) plus TPU rounding noise at 2.5e-4,
        # and only stabilizes near 2e-3.
        ("sphere_center", 0, 2, 2.5e-4),   # big sphere z
        ("sphere_center", 1, 0, 2.5e-4),   # second sphere x
        ("sphere_radius", 0, None, 2.5e-4),
        ("plane_d", 0, None, 2e-3),
    ])
    def test_geometry_grads(self, setup, which):
        scene, loss, g = setup
        name, i, j, eps = which

        def getter(tree):
            leaf = getattr(tree, name)
            return leaf[i] if j is None else leaf[i, j]

        def setter(tree, v):
            leaf = getattr(tree, name)
            leaf = _set(leaf, i if j is None else (i, j), v)
            return dataclasses.replace(tree, **{name: leaf})

        check_component(loss, scene.params, g, getter, setter,
                        eps=eps, rtol=0.2)

    def test_analytic_grads_match_cpu_backend(self, setup):
        """Hardware gate: when the suite runs on the real chip
        (CRT_TEST_TPU=1), the full analytic gradient pytree must agree
        with the CPU backend's — FD on TPU is noise-limited, but the
        reverse-mode program itself must not drift across backends."""
        if jax.default_backend() == "cpu":
            pytest.skip("single-backend run")
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            pytest.skip("no CPU backend registered")
        scene, loss, g = setup
        with jax.default_device(cpu):
            g_cpu = jax.jit(jax.grad(lambda p: loss(p)))(scene.params)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g)[0],
                jax.tree_util.tree_flatten_with_path(g_cpu)[0]):
            a, b = np.asarray(a), np.asarray(b)
            if a.size == 0:     # e.g. tri_vertices in a mesh-free scene
                continue
            scale = max(np.abs(a).max(), np.abs(b).max(), 1e-3)
            assert np.allclose(a, b, atol=0.05 * scale), (
                f"backend grad drift at {jax.tree_util.keystr(path)}: "
                f"max |a-b| = {np.abs(a - b).max()} vs scale {scale}")

    @pytest.mark.parametrize("field,idx", [
        ("ka", (0, 0)), ("ke", (4, 1)), ("ks", (1, 2)), ("kr", (0, 0)),
        ("tex_color", (2, 1)),
    ])
    def test_material_grads(self, setup, field, idx):
        scene, loss, g = setup

        def getter(tree):
            return getattr(tree.materials, field)[idx]

        def setter(tree, v):
            mats = dataclasses.replace(
                tree.materials,
                **{field: _set(getattr(tree.materials, field), idx, v)})
            return dataclasses.replace(tree, materials=mats)

        check_component(loss, scene.params, g, getter, setter,
                        eps=1e-3, rtol=0.1)

    @pytest.mark.parametrize("field,idx", [
        ("position", 1), ("focal_length", None), ("fov", None),
    ])
    def test_camera_grads(self, setup, field, idx):
        scene, loss, g = setup

        def getter(tree):
            v = getattr(tree.camera, field)
            return v if idx is None else v[idx]

        def setter(tree, v):
            old = getattr(tree.camera, field)
            new = (_set(old, idx, v) if idx is not None
                   else np.float32(v))
            cam = dataclasses.replace(tree.camera, **{field: new})
            return dataclasses.replace(tree, camera=cam)

        # camera moves shift silhouettes -> larger FD noise; looser gate.
        # min_mag: focal_length's true gradient is exactly 0 (the pinhole
        # construction scales vx and plane_center both ∝ focal, so the
        # normalized directions are invariant, image.c:42-55) — analytic
        # and FD are both float noise there.  The FD noise for this
        # eps/loss is ~6e-4 on TPU (measured), so the floor sits at 1e-3.
        check_component(loss, scene.params, g, getter, setter,
                        eps=2e-3, rtol=0.3, min_mag=1e-3)


class TestNoiseTextureGrads:
    """FD gate for the SimplexNoise texture chain (material.c:179-200):
    tex_scale / tex_p1 / tex_p2 / tex_color / tex_color2 gradients flow
    through ``core/noise.py`` end-to-end on scene2 (the noisy-periodic
    reference scene).

    The probed material (index 9, the noisy-periodic sphere in view at
    24²) ships with the SAW envelope, whose wrap discontinuities put
    delta functions in the true derivative that neither FD nor the
    analytic gradient can represent — so this gate substitutes the SIN
    envelope statically (tex_func is static topology) and checks the
    smooth chain: point → simplex_noise(p·fs) → angle → sin → gradient
    blend.  The saw/square envelopes keep their finite-and-nonzero
    coverage via the scene2 golden + test_all_grads_finite."""

    MAT = 9   # scene2 material id 10: noisy periodic on the 4th sphere
    SIN = 0   # T.FUNC_SIN

    @pytest.fixture(scope="class")
    def setup2(self, reference_root):
        scene = load_scene(
            os.path.join(reference_root, "scenes/scene2.json"))
        static = dataclasses.replace(
            scene.static,
            num_lights=tuple(min(n, 4) for n in scene.static.num_lights),
            tex_func=tuple(self.SIN for _ in scene.static.tex_func))
        cfg = RenderConfig(max_bounces=2, rounds=3)
        fn = make_renderer(static, cfg, 24, 24, jit=False)
        key = jax.random.PRNGKey(3)
        w = jax.random.uniform(jax.random.PRNGKey(11), (24, 24, 3))

        def loss(params):
            img, _ = fn(params, key)
            return jnp.sum(img * w)

        g = jax.jit(jax.grad(loss))(scene.params)
        return scene, jax.jit(loss), g

    @pytest.mark.parametrize("field,idx,eps", [
        # eps per parameter (CPU sweeps): the angle is
        # (x + noise·tex_p1)·tex_p2 with tex_p2 = 40 on this material, so
        # tex_p1 perturbations are amplified 40× — smallest step there
        ("tex_scale", MAT, 1e-3),
        ("tex_p1", MAT, 1e-4),
        ("tex_p2", MAT, 1e-3),
        ("tex_color", (MAT, 0), 1e-3),
        ("tex_color2", (MAT, 1), 1e-3),
    ])
    def test_noise_texture_grads(self, setup2, field, idx, eps):
        scene, loss, g = setup2

        def getter(tree):
            return getattr(tree.materials, field)[idx]

        def setter(tree, v):
            mats = dataclasses.replace(
                tree.materials,
                **{field: _set(getattr(tree.materials, field), idx, v)})
            return dataclasses.replace(tree, materials=mats)

        # measured agreement is ~5% (probe in the round-5 session);
        # min_mag 5e-5: tex_p2's true gradient is O(3e-4) here and its
        # FD reads are stable to 3% at this eps
        check_component(loss, scene.params, g, getter, setter,
                        eps=eps, rtol=0.15, min_mag=5e-5)


class TestPathGIGrads:
    """FD gate through the hemisphere-sampling path-GI estimator
    (render.c:271-287): gradients of material and geometry parameters
    with ``gi_model="path"`` must match finite differences — the sampled
    directions are a deterministic function of (key, normal), so
    material-parameter FD probes perturb the exact same program and
    geometry probes move the normals smoothly."""

    @pytest.fixture(scope="class")
    def setup_path(self, reference_root):
        scene = load_scene(
            os.path.join(reference_root, "scenes/scene1.json"))
        static = dataclasses.replace(
            scene.static,
            num_lights=tuple(min(n, 4) for n in scene.static.num_lights))
        cfg = RenderConfig(max_bounces=2, rounds=3, gi_model="path",
                           samples_per_pixel=4)
        fn = make_renderer(static, cfg, 24, 24, jit=False)
        key = jax.random.PRNGKey(3)
        w = jax.random.uniform(jax.random.PRNGKey(11), (24, 24, 3))

        def loss(params):
            img, _ = fn(params, key)
            return jnp.sum(img * w)

        g = jax.jit(jax.grad(loss))(scene.params)
        return scene, jax.jit(loss), g

    @pytest.mark.parametrize("field,idx", [
        # ke flows through BOTH the direct chain and the indirect child
        # shade (the emitter lights the child hit points); tex_color/ks
        # reach the loss through the cosine-weighted child accumulation
        ("ke", (4, 1)), ("tex_color", (2, 1)), ("ks", (1, 2)),
    ])
    def test_material_grads_path(self, setup_path, field, idx):
        scene, loss, g = setup_path

        def getter(tree):
            return getattr(tree.materials, field)[idx]

        def setter(tree, v):
            mats = dataclasses.replace(
                tree.materials,
                **{field: _set(getattr(tree.materials, field), idx, v)})
            return dataclasses.replace(tree, materials=mats)

        check_component(loss, scene.params, g, getter, setter,
                        eps=1e-3, rtol=0.1, min_mag=5e-5)

    def test_geometry_grads_path(self, setup_path):
        """sphere_center through the path estimator: normals (and with
        them the sampled hemisphere directions) move with the geometry."""
        scene, loss, g = setup_path

        def getter(tree):
            return tree.sphere_center[1, 0]

        def setter(tree, v):
            return dataclasses.replace(
                tree, sphere_center=_set(tree.sphere_center, (1, 0), v))

        check_component(loss, scene.params, g, getter, setter,
                        eps=2.5e-4, rtol=0.2)
