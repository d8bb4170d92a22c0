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
        ("sphere_center", 0, 2),   # big sphere z
        ("sphere_center", 1, 0),   # second sphere x
        ("sphere_radius", 0, None),
        ("plane_d", 0, None),
    ])
    def test_geometry_grads(self, setup, which):
        scene, loss, g = setup
        name, i, j = which

        def getter(tree):
            leaf = getattr(tree, name)
            return leaf[i] if j is None else leaf[i, j]

        def setter(tree, v):
            leaf = getattr(tree, name)
            leaf = _set(leaf, i if j is None else (i, j), v)
            return dataclasses.replace(tree, **{name: leaf})

        # eps must stay below the first silhouette/occlusion pixel flip:
        # at 2e-3 the FD crosses discrete boundaries and diverges, at
        # 2.5e-4 it converges to the analytic value (verified sweep)
        check_component(loss, scene.params, g, getter, setter,
                        eps=2.5e-4, rtol=0.2)

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
        # and FD are both float noise there, and the FD noise for this
        # eps/loss sits just above the default 1e-4 floor.
        check_component(loss, scene.params, g, getter, setter,
                        eps=2e-3, rtol=0.3, min_mag=5e-4)
