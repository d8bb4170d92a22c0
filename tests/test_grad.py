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
