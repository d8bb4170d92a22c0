"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded rendering must match single-device output, and the full sharded
training step must produce finite, moving parameters."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.parallel import (
    make_mesh, make_sharded_renderer, make_train_step)
from c_raytracer_tpu.render import RenderConfig, make_renderer
from c_raytracer_tpu.scene import load_scene


@pytest.fixture(scope="module")
def scene(reference_root):
    sc = load_scene(os.path.join(reference_root, "scenes/scene1.json"))
    static = dataclasses.replace(
        sc.static, num_lights=tuple(min(n, 4) for n in sc.static.num_lights))
    return dataclasses.replace(sc, static=static)


needs_8_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 devices")


@needs_8_devices
class TestShardedRender:
    def test_px_sharded_matches_single(self, scene):
        cfg = RenderConfig(max_bounces=2, rounds=3)
        key = jax.random.PRNGKey(5)
        single = make_renderer(scene.static, cfg, 32, 32)
        img0, z0 = single(scene.params, key)

        mesh = make_mesh(n_px=8, n_sp=1)
        sharded = make_sharded_renderer(scene.static, cfg, 32, 32, mesh)
        img1, z1 = sharded(scene.params, key)

        # identical program modulo sharding -> near-bitwise agreement
        np.testing.assert_allclose(
            np.asarray(img0), np.asarray(img1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-5)

    def test_pixel_axis_partitions_memory(self, scene):
        """Auto-sharding proof (BASELINE '>90% linear scaling' precondition):
        per-device temp memory of the compiled sharded program must shrink
        ~1/N — wall-clock on shared-core virtual CPU devices proves nothing,
        compiled per-device buffer sizes do."""
        cfg = RenderConfig(max_bounces=2, rounds=3)
        key = jax.random.PRNGKey(0)
        temps = {}
        for n in (1, 8):
            mesh = make_mesh(n_px=n, n_sp=1, devices=jax.devices()[:n])
            fn = make_sharded_renderer(scene.static, cfg, 128, 128, mesh)
            ma = fn.lower(scene.params, key).compile().memory_analysis()
            temps[n] = ma.temp_size_in_bytes
        # require at least 4x shrink at 8 devices (ideal 8x; padding and
        # replicated scene constants eat a bit)
        assert temps[8] * 4 <= temps[1], temps

    def test_sp_axis_path_tracing(self, scene):
        # sample-parallel path GI: 2 sp groups x 2 local spp == spp 4
        cfg = RenderConfig(max_bounces=2, rounds=3, gi_model="path",
                           samples_per_pixel=4, light_chunk=4)
        mesh = make_mesh(n_px=4, n_sp=2)
        sharded = make_sharded_renderer(scene.static, cfg, 32, 32, mesh)
        img, z = sharded(scene.params, jax.random.PRNGKey(0))
        assert bool(jnp.all(jnp.isfinite(img)))
        assert float(jnp.max(img)) > 0


@needs_8_devices
class TestTrainStep:
    def test_step_moves_params_finite(self, scene):
        cfg = RenderConfig(max_bounces=2, rounds=3, gi_model="path",
                           samples_per_pixel=2, light_chunk=4)
        mesh = make_mesh(n_px=4, n_sp=2)
        step = make_train_step(scene.static, cfg, 16, 16, mesh,
                               learning_rate=1e-2)
        target = jnp.zeros((16, 16, 3))
        p1, loss1 = step(scene.params, jax.random.PRNGKey(0), target)
        p2, loss2 = step(p1, jax.random.PRNGKey(1), target)
        for leaf in jax.tree.leaves(p2):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
        # descending toward a black target must reduce emitted radiance
        assert float(loss2) <= float(loss1) * 1.5  # loose: SGD + MC noise
