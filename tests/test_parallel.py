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


def _lit_soup(nt=600, transparent=True):
    """Triangle soup with an emittant sphere and nonzero ambient so renders
    are actually lit — a black frame exercises neither shading nor the
    shadow-tint folds (round-2 lesson: the pr render test compared black
    to black).  ``transparent=False`` makes the triangles opaque, which
    exercises the shared-origin shadow sweep (shadow_mode auto picks
    per-ray folds for transparent scenes)."""
    from c_raytracer_tpu.scene import types as T
    rng = np.random.default_rng(0)
    tv = rng.uniform(-3, 3, (nt, 3, 3)).astype(np.float32)
    tv[:, 1:] = tv[:, :1] + rng.uniform(-0.4, 0.4, (nt, 2, 3)).astype(
        np.float32)
    tri_mat = dict(ks=[1, 1, 1], ka=[.2, .2, .2], tex_color=[1, 1, 1])
    if transparent:
        tri_mat["kt"] = [.5, .6, .7]
    return T.make_scene(
        sphere_center=[[0.0, 0.0, 0.0], [0.0, 6.0, -2.0]],
        sphere_radius=[0.5, 1.0],
        sphere_material=[0, 2], sphere_lights=[0, 4],
        tri_vertices=tv, tri_material=[1] * nt,
        plane_point=[[0, -4, 0]], plane_normal=[[0, 1, 0]],
        plane_material=[0],
        materials=[
            dict(ks=[1, 1, 1], ka=[.1, .1, .1], tex_color=[1, 1, 1]),
            tri_mat,
            dict(ke=[4, 4, 4], tex_color=[1, 1, 1]),
        ],
        camera=dict(position=[0, 0, -8], vector_x=[1, 0, 0],
                    vector_y=[0, 1, 0], fov=60, focal_length=1),
        ambient=(0.3, 0.3, 0.3))


class TestPrSharding:
    """Primitive-range sharding (SURVEY §2.5 row 3, geometry/sharded.py):
    triangle arrays split into contiguous per-device ranges, hit folds
    all-reduced.  Equality targets per the module docstring: closest hit
    and blocked bit-exact, kt tint to ~1 ulp."""

    @pytest.fixture(scope="class")
    def soup(self):
        from test_accel import _soup_scene
        return _soup_scene(np.random.default_rng(0))

    @pytest.fixture(scope="class")
    def lit(self):
        from c_raytracer_tpu.accel.build import reorder_scene
        return reorder_scene(_lit_soup())

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

    def test_inside_retest_matches_replicated(self, soup):
        """The inside-object re-test (render.c:143-144) routed through the
        owner shard (intersect_prim_sharded) must match the replicated
        per-ray gather bit-exactly — including rays whose gid is a sphere,
        a plane, or -1 (no enclosing object)."""
        from test_accel import _rays
        from c_raytracer_tpu.core import v3 as v3m
        from c_raytracer_tpu.geometry import primitives as G
        from c_raytracer_tpu.geometry import sharded

        ds = G.device_scene(soup.params, soup.static)
        sh = sharded.shard_triangles(ds, soup.static, 8, tri_chunk=512)
        o_a, d_a = _rays(np.random.default_rng(2), 301)
        o, d = v3m.from_aos(o_a), v3m.from_aos(d_a)
        rng = np.random.default_rng(3)
        gid = jnp.asarray(
            rng.integers(-1, soup.static.n_prims, 301, dtype=np.int32))

        t1, h1, n1 = jax.jit(
            lambda: G.intersect_prim_soa(ds, o, d, gid))()
        t2, h2, n2 = jax.jit(
            lambda: sharded.intersect_prim_sharded(
                ds, soup.static, sh, o, d, gid))()
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        # miss-lane t values are garbage in both paths; compare hits only
        hm = np.asarray(h1)
        np.testing.assert_array_equal(np.asarray(t1)[hm], np.asarray(t2)[hm])
        for c in "xyz":
            np.testing.assert_array_equal(
                np.asarray(getattr(n1, c))[hm],
                np.asarray(getattr(n2, c))[hm])

    @needs_8_devices
    def test_pr_axis_partitions_geometry_memory(self):
        """pr sharding must shrink compiled per-device geometry memory on a
        geometry-dominated workload (ADVICE r2: the shard-shape test alone
        doesn't prove the replicated arrays go dead).  The decisive number
        is per-device ARGUMENT bytes: params.tri_vertices dominates the
        inputs, and the sharding constraints must let XLA place it sharded
        over pr (~1/8) instead of replicated.  Temps shrink too, but only
        partially — the per-ray sweep gathers scale with rays × visits,
        which pr does not divide."""
        from c_raytracer_tpu.accel.build import reorder_scene
        lit = reorder_scene(_lit_soup(nt=60000))
        cfg = RenderConfig(max_bounces=1, rounds=2, accel="cluster",
                           light_chunk=8, bvh_visits=4,
                           bvh_shadow_visits=4, bvh_shadow_shortlist=0)
        key = jax.random.PRNGKey(0)
        temps, args = {}, {}
        for n in (1, 8):
            mesh = make_mesh(n_px=1, n_sp=1, n_pr=n,
                             devices=jax.devices()[:n])
            fn = make_sharded_renderer(lit.static, cfg, 8, 8, mesh)
            ma = fn.lower(lit.params, key).compile().memory_analysis()
            temps[n] = ma.temp_size_in_bytes
            args[n] = ma.argument_size_in_bytes
        assert args[8] * 6 <= args[1], args
        assert temps[8] * 3 <= temps[1] * 2, temps

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

    def test_pr_cluster_folds_match_replicated_cluster(self, lit):
        """pr-sharded per-shard cluster sweeps (accel/traverse.py
        pack_clusters_sharded + the cross-shard folds in Intersector) must
        reproduce the single replicated cluster sweep bit-exactly — the
        composition VERDICT r2 named as missing (shards used to force
        brute folds)."""
        from test_accel import _rays
        from c_raytracer_tpu.accel.intersect import make_intersector
        from c_raytracer_tpu.core import v3 as v3m
        from c_raytracer_tpu.geometry import primitives as G
        from c_raytracer_tpu.geometry import sharded

        ds = G.device_scene(lit.params, lit.static)
        cfg = RenderConfig(accel="cluster", bvh_cluster=16, bvh_visits=64)
        sh = sharded.shard_triangles(ds, lit.static, 4, tri_chunk=512)
        ic = make_intersector(ds, lit.static, cfg)
        isc = make_intersector(ds, lit.static, cfg, shards=sh)
        assert isc.clusters is not None, "shards must compose with clusters"
        assert isc.clusters.blk.ndim == 4   # leading shard axis

        o_a, d_a = _rays(np.random.default_rng(1), 513)
        o, d = v3m.from_aos(o_a), v3m.from_aos(d_a)
        t1, g1, m1, n1 = jax.jit(ic.closest)(o, d)
        t2, g2, m2, n2 = jax.jit(isc.closest)(o, d)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        for c in "xyz":
            np.testing.assert_array_equal(
                np.asarray(getattr(n1, c)), np.asarray(getattr(n2, c)))

        md = jnp.full(o.x.shape, 5.0)
        ex = jnp.full(o.x.shape, -1, jnp.int32)
        b1, tn1 = jax.jit(lambda: ic.any_tint(o, d, md, ex))()
        b2, tn2 = jax.jit(lambda: isc.any_tint(o, d, md, ex))()
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        for c in "xyz":
            np.testing.assert_allclose(
                np.asarray(getattr(tn1, c)), np.asarray(getattr(tn2, c)),
                rtol=3e-7)

    @needs_8_devices
    def test_pr_render_matches_single(self, lit):
        """Full wavefront render (stack mode: transparent triangles, a real
        emitter so the frame is lit) with px×pr sharding AND cluster
        traversal ON, vs the single-device replicated cluster render."""
        # visits ≥ cluster count on both sides and NO shortlist: the sweep
        # is exhaustive, so the only sharded-vs-single difference left is
        # kt-product regrouping (~ulp).  With truncation on, the per-shard
        # shortlist keeps n_pr× more candidates than the replicated one
        # and legitimately finds blockers the single-device sweep dropped.
        cfg = RenderConfig(max_bounces=2, rounds=4, accel="cluster",
                           light_chunk=4, bvh_visits=64,
                           bvh_shadow_visits=64, bvh_shadow_shortlist=0)
        key = jax.random.PRNGKey(3)
        single = make_renderer(lit.static, cfg, 24, 24)
        img0, z0 = single(lit.params, key)
        assert float(jnp.max(img0)) > 1e-3, "test frame must be lit"

        mesh = make_mesh(n_px=2, n_sp=1, n_pr=4)
        sharded_fn = make_sharded_renderer(lit.static, cfg, 24, 24, mesh)
        img1, z1 = sharded_fn(lit.params, key)
        np.testing.assert_allclose(
            np.asarray(img0), np.asarray(img1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(z0), np.asarray(z1), atol=1e-5)

    @needs_8_devices
    def test_pr_render_matches_single_opaque_shared_sweep(self):
        """Opaque mesh scene: the pr-sharded SHARED-ORIGIN shadow sweep
        (vmapped shadow_visit_order + shortlist per shard) vs the
        single-device one.  Transparent scenes route shadows per-ray, so
        this is the only coverage of the sharded shadow_query path."""
        from c_raytracer_tpu.accel.build import reorder_scene
        lit_op = reorder_scene(_lit_soup(transparent=False))
        cfg = RenderConfig(max_bounces=2, rounds=3, accel="cluster",
                           light_chunk=4, bvh_visits=64,
                           bvh_shadow_visits=64, bvh_shadow_shortlist=0)
        key = jax.random.PRNGKey(4)
        single = make_renderer(lit_op.static, cfg, 24, 24)
        img0, z0 = single(lit_op.params, key)
        assert float(jnp.max(img0)) > 1e-3, "test frame must be lit"

        mesh = make_mesh(n_px=2, n_sp=1, n_pr=4)
        sharded_fn = make_sharded_renderer(lit_op.static, cfg, 24, 24, mesh)
        img1, z1 = sharded_fn(lit_op.params, key)
        np.testing.assert_allclose(
            np.asarray(img0), np.asarray(img1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(z0), np.asarray(z1), atol=1e-5)

    @needs_8_devices
    def test_pr_shortlist_matches_single_at_spill0(self):
        """pr-sharding × shadow SHORTLIST, pinned at a spill==0 config
        (VERDICT r3 #6): with K ≥ the total triangle count the shortlist
        can never drop a candidate on either side, so the per-shard
        shortlists (which otherwise keep n_pr× more candidates than the
        replicated one and legitimately diverge under truncation) must
        reproduce the single-device render exactly.  Under truncation the
        combination remains intentionally unpinned — use spill==0 configs
        (accel/validate.py tuned_config) when sharding with shortlists."""
        from c_raytracer_tpu.accel.build import reorder_scene
        lit_op = reorder_scene(_lit_soup(transparent=False))
        nt = lit_op.static.n_triangles
        cfg = RenderConfig(max_bounces=2, rounds=3, accel="cluster",
                           light_chunk=4, bvh_visits=64,
                           bvh_shadow_visits=64,
                           bvh_shadow_shortlist=nt)  # K=all: no truncation
        key = jax.random.PRNGKey(4)
        single = make_renderer(lit_op.static, cfg, 24, 24)
        img0, z0 = single(lit_op.params, key)
        assert float(jnp.max(img0)) > 1e-3, "test frame must be lit"

        mesh = make_mesh(n_px=2, n_sp=1, n_pr=4)
        sharded_fn = make_sharded_renderer(lit_op.static, cfg, 24, 24, mesh)
        img1, z1 = sharded_fn(lit_op.params, key)
        np.testing.assert_allclose(
            np.asarray(img0), np.asarray(img1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(z0), np.asarray(z1), atol=1e-5)

    @needs_8_devices
    def test_pr_train_step_grads(self, lit):
        """Gradient flow through the pr-sharded training step — the exact
        path the driver's multichip gate runs (grad through the per-shard
        cluster sweeps, the masked-sum winner folds, and the sharding
        constraints).  Round 2 shipped a red gate because nothing covered
        it; asserts are on the GRADIENTS, not post-SGD float motion."""
        cfg = RenderConfig(max_bounces=2, rounds=3, accel="cluster",
                           light_chunk=4, bvh_visits=32,
                           bvh_shadow_visits=32, bvh_shadow_shortlist=32)
        mesh = make_mesh(n_px=2, n_sp=1, n_pr=4)
        step = make_train_step(lit.static, cfg, 16, 16, mesh,
                               learning_rate=1e-3, with_grads=True)
        target = jnp.zeros((16, 16, 3))
        p1, loss, grads = step(lit.params, jax.random.PRNGKey(0), target)
        assert np.isfinite(float(loss)) and float(loss) > 0
        for leaf in jax.tree.leaves(grads):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        gv = float(jnp.max(jnp.abs(grads.tri_vertices)))
        assert gv > 0, "no gradient reached the pr-sharded triangle vertices"
        gm = max(float(jnp.max(jnp.abs(g)))
                 for g in jax.tree.leaves(grads.materials))
        assert gm > 0, "no gradient reached the materials"


@needs_8_devices
class TestTrainStep:
    def test_step_gradients_flow_and_loss_decreases(self, scene):
        """Replicated-path training step: per-family gradient flow (the
        silent-zero-grad regression detector VERDICT r2 asked for) and a
        deterministic loss descent over a few steps (fixed key ⇒ the
        renderer is deterministic, so SGD with a small lr must descend)."""
        cfg = RenderConfig(max_bounces=2, rounds=3, gi_model="path",
                           samples_per_pixel=2, light_chunk=4)
        mesh = make_mesh(n_px=4, n_sp=2)
        step = make_train_step(scene.static, cfg, 16, 16, mesh,
                               learning_rate=1e-2, with_grads=True)
        target = jnp.zeros((16, 16, 3))
        key = jax.random.PRNGKey(0)
        p1, loss1, grads = step(scene.params, key, target)
        for leaf in jax.tree.leaves(p1):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree.leaves(grads):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        # scene1 signal must reach every geometry/material/camera family
        for fam in ("sphere_center", "sphere_radius", "camera"):
            leaves = jax.tree.leaves(getattr(grads, fam))
            gmax = max(float(jnp.max(jnp.abs(g))) for g in leaves)
            assert gmax > 0, f"zero gradient for {fam}"
        gmat = max(float(jnp.max(jnp.abs(g)))
                   for g in jax.tree.leaves(grads.materials))
        assert gmat > 0, "zero gradient for materials"
        # same key every step -> deterministic loss; SGD must descend
        losses = [float(loss1)]
        p = p1
        for _ in range(2):
            p, lo, _ = step(p, key, target)
            losses.append(float(lo))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses
