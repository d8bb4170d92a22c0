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


class TestPrSharding:
    """Primitive-range sharding (SURVEY §2.5 row 3, geometry/sharded.py):
    triangle arrays split into contiguous per-device ranges, hit folds
    all-reduced.  Equality targets per the module docstring: closest hit
    and blocked bit-exact, kt tint to ~1 ulp."""

    @pytest.fixture(scope="class")
    def soup(self):
        from test_accel import _soup_scene
        return _soup_scene(np.random.default_rng(0))

    def test_folds_match_replicated_bitexact(self, soup):
        from test_accel import _rays
        from c_raytracer_tpu.core import v3 as v3m
        from c_raytracer_tpu.geometry import primitives as G
        from c_raytracer_tpu.geometry import sharded

        ds = G.device_scene(soup.params, soup.static)
        o_a, d_a = _rays(np.random.default_rng(1), 257)
        o, d = v3m.from_aos(o_a), v3m.from_aos(d_a)
        sh = sharded.shard_triangles(ds, soup.static, 8, tri_chunk=512)

        t1, g1, m1, n1 = jax.jit(
            lambda: G.closest_hit_soa(ds, soup.static, o, d))()
        t2, g2, m2, n2 = jax.jit(
            lambda: sharded.closest_hit_sharded(ds, soup.static, sh, o, d))()
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        for c in "xyz":
            np.testing.assert_array_equal(
                np.asarray(getattr(n1, c)), np.asarray(getattr(n2, c)))

        md = jnp.full(o.x.shape, 5.0)
        b1, tn1 = jax.jit(
            lambda: G.any_hit_tint_soa(ds, soup.static, o, d, md, -1))()
        b2, tn2 = jax.jit(
            lambda: sharded.any_hit_tint_sharded(
                ds, soup.static, sh, o, d, md, -1))()
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        for c in "xyz":
            np.testing.assert_allclose(
                np.asarray(getattr(tn1, c)), np.asarray(getattr(tn2, c)),
                rtol=3e-7)

    @needs_8_devices
    def test_pr_arrays_partition_across_devices(self, soup):
        """The stacked triangle arrays must actually live sharded: each of
        the 8 pr devices holds exactly one (1, m) shard — the check
        VERDICT r1 asked for (addressable-shard shapes shrink 1/N)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from c_raytracer_tpu.geometry import primitives as G
        from c_raytracer_tpu.geometry import sharded

        mesh = make_mesh(n_px=1, n_sp=1, n_pr=8)
        ds = G.device_scene(soup.params, soup.static)
        sh = jax.jit(
            lambda: sharded.shard_triangles(
                ds, soup.static, 8,
                sharding=NamedSharding(mesh, P("pr"))))()
        S, m = sh.eps.shape
        assert S == 8
        shards = sh.eps.addressable_shards
        assert len(shards) == 8
        for s in shards:
            assert s.data.shape == (1, m), s.data.shape
        assert sh.v0.x.addressable_shards[0].data.shape == (1, m)
        assert sh.kt.addressable_shards[0].data.shape == (1, m, 3)

    @needs_8_devices
    def test_pr_render_matches_single(self, soup):
        """Full wavefront render (stack mode: the soup has transparent
        triangles) with px x pr sharding vs the single-device dense fold."""
        cfg = RenderConfig(max_bounces=2, rounds=4, accel="none",
                           light_chunk=4)
        key = jax.random.PRNGKey(3)
        single = make_renderer(soup.static, cfg, 24, 24)
        img0, z0 = single(soup.params, key)

        mesh = make_mesh(n_px=2, n_sp=1, n_pr=4)
        sharded_fn = make_sharded_renderer(soup.static, cfg, 24, 24, mesh)
        img1, z1 = sharded_fn(soup.params, key)
        np.testing.assert_allclose(
            np.asarray(img0), np.asarray(img1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(z0), np.asarray(z1), atol=1e-5)


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
