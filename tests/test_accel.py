"""Acceleration-structure tests: Morton build (native C++ vs NumPy),
cluster traversal vs brute force, scene reordering invariance, and scene4
golden parity (slow, gated).

The reference has no tests; its BVH correctness story is "same image with
-DNDEBUG" (SURVEY.md §4).  Here the cluster sweep must be *exactly* the
brute-force result whenever visits cover every overlapped cluster.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_raytracer_tpu.accel import (build, make_intersector, native,
                                   reorder_scene)
from c_raytracer_tpu.core import v3 as v3m
from c_raytracer_tpu.geometry import primitives as G
from c_raytracer_tpu.render.config import RenderConfig
from c_raytracer_tpu.scene import types as T


def _soup_scene(rng, nt=600):
    tv = rng.uniform(-3, 3, (nt, 3, 3)).astype(np.float32)
    tv[:, 1:] = tv[:, :1] + rng.uniform(-0.4, 0.4, (nt, 2, 3)).astype(
        np.float32)
    return T.make_scene(
        sphere_center=[[0.0, 0.0, 0.0]], sphere_radius=[0.5],
        sphere_material=[0],
        tri_vertices=tv, tri_material=[1] * nt,
        plane_point=[[0, -4, 0]], plane_normal=[[0, 1, 0]],
        plane_material=[0],
        materials=[
            dict(ks=[1, 1, 1], ka=[.1, .1, .1], tex_color=[1, 1, 1]),
            dict(ks=[1, 1, 1], kt=[.5, .6, .7], tex_color=[1, 1, 1]),
        ],
        camera=dict(position=[0, 0, -8], vector_x=[1, 0, 0],
                    vector_y=[0, 1, 0], fov=60, focal_length=1))


def _rays(rng, n):
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestMortonBuild:
    def test_numpy_expand_bits(self):
        # expand_bits injects 2 zero bits between each of the low 10 bits
        v = np.array([0, 1, 0b1111111111], np.uint32)
        out = build.expand_bits_np(v)
        assert out[0] == 0 and out[1] == 1
        assert out[2] == 0b1001001001001001001001001001

    def test_native_matches_numpy(self):
        if not native.available():
            pytest.skip("native builder unavailable (no g++)")
        rng = np.random.default_rng(7)
        cen = rng.uniform(-10, 10, (5000, 3)).astype(np.float32)
        perm_native, codes_native = native.morton_sort(cen)
        codes_np = build.morton_codes_np(cen)
        np.testing.assert_array_equal(codes_native, codes_np)
        np.testing.assert_array_equal(
            perm_native, np.argsort(codes_np, kind="stable"))

    def test_native_stl_matches_numpy(self):
        if not native.available():
            pytest.skip("native builder unavailable (no g++)")
        path = "/root/reference/meshes/utah_teapot_lowpoly.stl"
        if not os.path.exists(path):
            pytest.skip("reference mesh not mounted")
        from c_raytracer_tpu.scene import stl
        ours = stl.load_stl(path)
        nat = native.stl_read(path)
        np.testing.assert_array_equal(nat, ours)

    def test_lbvh_ranges_split_rule(self):
        if not native.available():
            pytest.skip("native builder unavailable (no g++)")
        # sorted codes with an obvious top split at the high bit
        codes = np.array([0b000, 0b001, 0b011, 0b100, 0b110], np.uint32)
        ranges = native.lbvh_ranges(codes)
        # root covers [0,4]; highest differing bit splits 011|100 -> split=2
        first, last, split = ranges[0]
        assert (first, last, split) == (0, 4, 2)


class TestClusterTraversal:
    @pytest.fixture(scope="class")
    def scene(self):
        return reorder_scene(_soup_scene(np.random.default_rng(0)))

    def test_closest_matches_brute(self, scene):
        ds = G.device_scene(scene.params, scene.static)
        o, d = _rays(np.random.default_rng(1), 2048)
        o, d = v3m.from_aos(o), v3m.from_aos(d)
        ib = make_intersector(ds, scene.static, RenderConfig(accel="none"))
        ic = make_intersector(ds, scene.static, RenderConfig(
            accel="cluster", bvh_cluster=64, bvh_visits=64,
            bvh_ray_chunk=900))  # chunked path exercised
        tb, gb, mb, nb = jax.jit(ib.closest)(o, d)
        tc, gc, mc, nc = jax.jit(ic.closest)(o, d)
        np.testing.assert_array_equal(np.asarray(gb), np.asarray(gc))
        hit = np.asarray(gb) >= 0
        np.testing.assert_array_equal(np.asarray(mb)[hit],
                                      np.asarray(mc)[hit])
        np.testing.assert_allclose(
            np.asarray(tb)[hit], np.asarray(tc)[hit], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(v3m.to_aos(nb))[hit], np.asarray(v3m.to_aos(nc))[hit],
            rtol=1e-5, atol=1e-6)

    def test_any_tint_matches_brute(self, scene):
        ds = G.device_scene(scene.params, scene.static)
        o, d = _rays(np.random.default_rng(2), 2048)
        o, d = v3m.from_aos(o), v3m.from_aos(d)
        md = jnp.full((2048,), 6.0)
        ex = jnp.full((2048,), -1, jnp.int32)
        ib = make_intersector(ds, scene.static, RenderConfig(accel="none"))
        ic = make_intersector(ds, scene.static, RenderConfig(
            accel="cluster", bvh_cluster=64, bvh_visits=64))
        bb, tb = jax.jit(lambda *a: ib.any_tint(*a))(o, d, md, ex)
        bc, tc = jax.jit(lambda *a: ic.any_tint(*a))(o, d, md, ex)
        np.testing.assert_array_equal(np.asarray(bb), np.asarray(bc))
        np.testing.assert_allclose(np.asarray(v3m.to_aos(tb)),
                                   np.asarray(v3m.to_aos(tc)), rtol=1e-6)

    def test_gradients_flow_through_clusters(self, scene):
        """d(sum of hit distances)/d(vertices) must match brute force."""
        o, d = _rays(np.random.default_rng(3), 256)

        def loss(tv, cfg):
            params = dataclasses.replace(scene.params, tri_vertices=tv)
            ds = G.device_scene(params, scene.static)
            ix = make_intersector(ds, scene.static, cfg)
            t, gid, mat, n = ix.closest(v3m.from_aos(o), v3m.from_aos(d))
            return jnp.sum(jnp.where(gid >= 0, t, 0.0))

        gb = jax.grad(loss)(scene.params.tri_vertices,
                            RenderConfig(accel="none"))
        gc = jax.grad(loss)(scene.params.tri_vertices,
                            RenderConfig(accel="cluster", bvh_cluster=64,
                                         bvh_visits=64))
        # componentwise MT vs stacked MT reassociate float ops; allow noise
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gc),
                                   rtol=2e-3, atol=1e-5)


class TestShadowShortlist:
    """The per-pixel triangle shortlist (traverse.shadow_shortlist) must
    reproduce the cluster-streaming shared-origin sweep exactly whenever K
    covers every capsule-overlapping triangle."""

    def test_matches_streamed_sweep(self):
        scene = reorder_scene(_soup_scene(np.random.default_rng(8), nt=300))
        ds = G.device_scene(scene.params, scene.static)
        rng = np.random.default_rng(9)
        P = 256
        origin = v3m.from_aos(jnp.asarray(
            rng.uniform(-2, 2, (P, 3)).astype(np.float32)))
        egid = 0  # the sphere
        lc, nchunks = 8, 3
        # shared-origin contract: every sample segment runs from the pixel
        # origin to a point on/in the emitter (the capsule cull assumes it)
        origin_np = np.asarray(v3m.to_aos(origin))          # (P, 3)
        c = np.asarray(scene.params.sphere_center[0])
        r = float(np.asarray(scene.params.sphere_radius[0]))
        pts = c + rng.uniform(-r, r, (nchunks, lc, P, 3)).astype(np.float32)
        seg = pts - origin_np[None, None]
        dist_np = np.linalg.norm(seg, axis=-1).astype(np.float32)
        dirs = jnp.asarray(seg / dist_np[..., None])
        dists = jnp.asarray(dist_np)

        def run(cfg):
            ix = make_intersector(ds, scene.static, cfg)
            lo, hi = ix.emitter_bounds(egid)

            def dirs_fn(i):
                return v3m.from_aos(dirs[i]), dists[i]
            return jax.jit(lambda: ix.shadow_query(
                origin, lo, hi, dirs_fn, egid, nchunks, lc))()

        base_cfg = RenderConfig(accel="cluster", bvh_cluster=16,
                                bvh_visits=64)
        b0, t0, _ = run(dataclasses.replace(base_cfg,
                                            bvh_shadow_shortlist=0))
        # K = all triangles: the shortlist can never drop a candidate
        b1, t1, _ = run(dataclasses.replace(base_cfg,
                                            bvh_shadow_shortlist=512))
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        for a, b in zip(t0, t1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)


class TestReorder:
    def test_reorder_is_pure_permutation(self):
        scene = _soup_scene(np.random.default_rng(4), nt=100)
        re = reorder_scene(scene)
        # same triangle multiset
        a = np.asarray(scene.params.tri_vertices)
        b = np.asarray(re.params.tri_vertices)
        assert sorted(map(tuple, a.reshape(100, -1).tolist())) \
            == sorted(map(tuple, b.reshape(100, -1).tolist()))
        # per-triangle tables permuted consistently
        perm = build.morton_order(a)
        ns = scene.static.n_spheres
        assert re.static.material_index[ns:ns + 100] == tuple(
            scene.static.material_index[ns + int(i)] for i in perm)
        # identical closest-hit results
        o, d = _rays(np.random.default_rng(5), 512)
        dsa = G.device_scene(scene.params, scene.static)
        dsb = G.device_scene(re.params, re.static)
        cfg = RenderConfig(accel="none")
        ov, dv = v3m.from_aos(o), v3m.from_aos(d)
        ta, ga, _, _ = make_intersector(dsa, scene.static, cfg).closest(ov, dv)
        tb, gb, _, _ = make_intersector(dsb, re.static, cfg).closest(ov, dv)
        hit = np.asarray(ga) >= 0
        np.testing.assert_array_equal(hit, np.asarray(gb) >= 0)
        np.testing.assert_allclose(np.asarray(ta)[hit], np.asarray(tb)[hit],
                                   rtol=1e-6)


@pytest.mark.skipif(not os.environ.get("CRT_SLOW"),
                    reason="slow golden test; set CRT_SLOW=1")
class TestMeshSceneGoldens:
    """Full mesh scenes against fresh renders of the reference binary (built
    in a scratch dir with the substitute dragon/menger meshes from
    assets/meshes in its meshes/ dir) — run on TPU (CRT_TEST_TPU=1
    CRT_SLOW=1) or be patient on CPU.

    scene4: 12 STL meshes, 27.6k tris, opaque (chain integrator).
    scene5: ~100k-tri glass dragon — transparent triangles through the
            cluster sweep + stack integrator + kt-tinted shadows
            (accel.c:360-387, render.c:319-340) at scale.
    scene6: 36k-tri Menger sponge, noisy-periodic texture, 100-sample light.

    Reference C-vs-C rerenders of scene5/6 agree within 1 LSB on 100% of
    pixels (converged 300/100-sample soft shadows), so tight gates are
    safe."""

    @pytest.mark.parametrize("name,min_within1", [
        ("scene4", 0.995), ("scene6", 0.99)])
    def test_golden(self, reference_root, name, min_within1):
        from c_raytracer_tpu.image import read_tiff
        from c_raytracer_tpu.render import render
        from c_raytracer_tpu.scene import load_scene
        sc = reorder_scene(
            load_scene(os.path.join(reference_root, f"scenes/{name}.json"),
                       mesh_root=reference_root))
        img, _ = render(sc, RenderConfig(), 128, 128, jax.random.PRNGKey(0))
        q = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.int32)
        g, _ = read_tiff(os.path.join(os.path.dirname(__file__), "goldens",
                                      f"{name}_128_default.tif"))
        gq = (g * 255.0).astype(np.int32)
        diff = np.abs(q - gq).max(-1)
        assert (diff <= 1).mean() >= min_within1, (
            f"{name}: within1={(diff <= 1).mean()}, max={diff.max()}")

    def test_scene5_float_vs_reference(self, reference_root):
        """scene5 (glass dragon) FLOAT-radiance parity against a raw
        float32 render of the reference C binary (engine -f, 64², 100
        light samples) — scene5's radiance is O(1e-3), below one 8-bit
        LSB, so an 8-bit golden gate is blind there (VERDICT r2); the
        raw-TIFF comparison is the real transparent-path parity evidence.

        The exact per-ray kt path costs minutes of device time at this
        size, so the render goes through make_host_tiled_renderer — one
        device program per 256-pixel tile (remote-attached accelerators
        kill long single calls).  Both renderers are Monte-Carlo at 100
        soft-shadow samples (~10% per-pixel noise each, uncorrelated
        streams), so the gates are estimand-level: overall radiance scale
        within 5% and mean relative error on lit pixels under 3.5×
        the expected combined sample noise."""
        import dataclasses as dc
        from c_raytracer_tpu.image import read_tiff
        from c_raytracer_tpu.render import make_host_tiled_renderer
        from c_raytracer_tpu.scene import load_scene
        sc = reorder_scene(
            load_scene(os.path.join(reference_root, "scenes/scene5.json"),
                       mesh_root=reference_root))
        nl = tuple(min(n, 100) for n in sc.static.num_lights)
        sc = dc.replace(sc, static=dc.replace(sc.static, num_lights=nl))
        cfg = RenderConfig(tile_size=256)
        fn = make_host_tiled_renderer(sc.static, cfg, 64, 64)
        img, z = fn(sc.params, jax.random.PRNGKey(0))
        ref, zr = read_tiff(os.path.join(os.path.dirname(__file__),
                                         "goldens",
                                         "scene5_64_l100_raw.tif"))
        ours = np.asarray(img).astype(np.float64)
        ref = np.asarray(ref).astype(np.float64)
        scale = ours.mean() / ref.mean()
        assert 0.9 <= scale <= 1.1, f"radiance scale {scale}"
        # per-pixel gates are MEDIAN-based: the kt soft-shadow estimator is
        # heavy-tailed (a sample either threads the glass or not), so a few
        # high-variance pixels dominate the mean |rel| while the median
        # measured 2.7-3.9% across all brightness tiers (3x margin here)
        lum_o, lum_r = ours.mean(-1), ref.mean(-1)
        for q in (50, 90):
            lit = lum_r > np.percentile(lum_r, q)
            rel = np.abs(lum_o - lum_r)[lit] / lum_r[lit]
            med = float(np.median(rel))
            assert med < 0.12, f"median rel err at q{q}: {med}"
        # z-buffer is deterministic geometry: compare tightly
        zo = np.asarray(z).reshape(-1)
        zrr = np.asarray(zr).reshape(-1)
        both = (zo > 0) & (zrr > 0)
        assert both.mean() > 0.97
        np.testing.assert_allclose(zo[both], zrr[both], rtol=2e-3)


class TestScene56Substitutes:
    """scene5/scene6 reference the dragon/menger STLs missing from the
    mount (.MISSING_LARGE_BLOBS); the loader falls back to generated
    substitutes in assets/meshes (tools/gen_meshes.py)."""

    @pytest.fixture(scope="class", autouse=True)
    def meshes(self):
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        need = [os.path.join(repo, "assets", "meshes", f)
                for f in ("dragon.stl", "menger_sponge.stl")]
        if not all(os.path.exists(p) for p in need):
            subprocess.run(
                [sys.executable, os.path.join(repo, "tools/gen_meshes.py")],
                check=True, timeout=300)

    @pytest.mark.parametrize("num,min_tris", [(5, 50000), (6, 20000)])
    def test_loads(self, reference_root, num, min_tris):
        from c_raytracer_tpu.scene import load_scene
        sc = load_scene(
            os.path.join(reference_root, f"scenes/scene{num}.json"))
        assert sc.static.n_triangles >= min_tris
        assert sc.static.emitter_prims  # the light sphere

    def test_scene5_renders(self, reference_root):
        from c_raytracer_tpu.render import render
        from c_raytracer_tpu.scene import load_scene
        sc = load_scene(
            os.path.join(reference_root, "scenes/scene5.json"))
        sc = reorder_scene(sc)
        nl = tuple(min(n, 2) for n in sc.static.num_lights)
        sc = dataclasses.replace(
            sc, static=dataclasses.replace(sc.static, num_lights=nl))
        img, z = render(sc, RenderConfig(max_bounces=2, rounds=4), 24, 24,
                        jax.random.PRNGKey(0))
        img = np.asarray(img)
        assert np.isfinite(img).all() and (np.asarray(z) > 0).any()


class TestTransparentSceneDefaults:
    """Float-space (not 8-bit) render parity at DEFAULT knobs on a
    transparent scene — the round-2 truncation hole: nearest-V shadow
    truncation leaked 22× radiance on scene5 while all 8-bit goldens
    passed.  The scene-aware auto policy (config.py: transparent scenes
    get shadow visits ≥ 64 and NO shortlist) must make the cluster render
    match brute force in float space."""

    def test_default_knobs_float_parity(self):
        from test_parallel import _lit_soup
        from c_raytracer_tpu.render import make_renderer

        scene = reorder_scene(_lit_soup())
        key = jax.random.PRNGKey(7)
        fb = make_renderer(scene.static, RenderConfig(
            max_bounces=3, rounds=5, accel="none", light_chunk=4), 24, 24)
        img_b, _ = fb(scene.params, key)
        assert float(jnp.max(img_b)) > 1e-3, "frame must be lit"
        fc = make_renderer(scene.static, RenderConfig(
            max_bounces=3, rounds=5, accel="cluster", light_chunk=4), 24, 24)
        img_c, _ = fc(scene.params, key)
        ad = np.abs(np.asarray(img_c) - np.asarray(img_b))
        denom = np.maximum(np.asarray(np.abs(img_b)), 1e-6)
        assert float((ad / denom).max()) < 1e-3, (
            f"cluster-vs-brute relative radiance error "
            f"{float((ad/denom).max()):.3e}")

    def test_spill_counters(self):
        """spill == 0 proves the sweep was exhaustive; the counters are the
        basis of the validate/auto-tune spill policy."""
        from c_raytracer_tpu.accel import traverse

        scene = reorder_scene(_soup_scene(np.random.default_rng(0)))
        ds = G.device_scene(scene.params, scene.static)
        ix = make_intersector(ds, scene.static,
                              RenderConfig(accel="cluster"))
        o, d = _rays(np.random.default_rng(4), 257)
        K = ix.clusters.lo.shape[0]
        n_ov, spill = jax.jit(
            lambda: traverse.spill_counts(ix.clusters, o, d, K))()
        # budget = cluster count -> nothing can spill
        assert int(jnp.max(spill)) == 0
        assert int(jnp.max(n_ov)) <= K
        # a tiny budget must report spill for rays overlapping >1 cluster
        n_ov1, spill1 = jax.jit(
            lambda: traverse.spill_counts(ix.clusters, o, d, 1))()
        np.testing.assert_array_equal(np.asarray(spill1),
                                      np.maximum(np.asarray(n_ov1) - 1, 0))

        lo = jnp.asarray([2.0, 2.0, 2.0])
        hi = jnp.asarray([3.0, 3.0, 3.0])
        cl_sp, tri_sp = jax.jit(lambda: traverse.shadow_spill_counts(
            ix.clusters, o, lo, hi, K, 10_000))()
        assert int(jnp.max(cl_sp)) == 0
        assert int(jnp.max(tri_sp)) == 0


class TestUnionShadowMode:
    """Round-4 work compaction: shadow_mode="union" sweeps the EXACT
    per-pixel union of every sample segment's slab overlaps
    (traverse.shadow_union_visit_order) — same guarantee as per_ray, with
    each cluster block gathered once per pixel and dead visit slots
    cond-skipped.  Default for transparent scenes (config.py)."""

    @pytest.fixture(scope="class")
    def soup(self):
        from test_parallel import _lit_soup
        return reorder_scene(_lit_soup())

    def test_union_matches_per_ray_and_brute(self, soup):
        from c_raytracer_tpu.render import make_renderer
        key = jax.random.PRNGKey(7)
        imgs = {}
        for name, cfg in {
            "brute": RenderConfig(max_bounces=3, rounds=5, accel="none",
                                  light_chunk=4),
            "per_ray": RenderConfig(max_bounces=3, rounds=5,
                                    accel="cluster",
                                    shadow_mode="per_ray", light_chunk=4),
            "union": RenderConfig(max_bounces=3, rounds=5, accel="cluster",
                                  shadow_mode="union", light_chunk=4),
            # non-default shadow cluster size exercises the separate
            # shadow ClusterSet packing
            "union_c32": RenderConfig(max_bounces=3, rounds=5,
                                      accel="cluster", shadow_mode="union",
                                      bvh_shadow_cluster=32,
                                      light_chunk=4),
        }.items():
            fn = make_renderer(soup.static, cfg, 24, 24)
            img, _ = fn(soup.params, key)
            imgs[name] = np.asarray(img)
        assert imgs["brute"].max() > 1e-3, "frame must be lit"
        for name in ("per_ray", "union", "union_c32"):
            ad = np.abs(imgs[name] - imgs["brute"])
            denom = np.maximum(np.abs(imgs["brute"]), 1e-6)
            assert float((ad / denom).max()) < 1e-3, name

    def test_runtime_spill_guard(self, soup):
        """The render stats surface union-sweep truncation: a starved
        visit budget must report spill > 0 (the loud-warning trigger in
        cli/engine.py), the default generous budget spill == 0 (the
        provable-exhaustive policy)."""
        from c_raytracer_tpu.render import make_renderer
        key = jax.random.PRNGKey(7)
        f_ok = make_renderer(soup.static, RenderConfig(
            max_bounces=2, rounds=3, accel="cluster", shadow_mode="union",
            light_chunk=4), 16, 16, with_stats=True)
        _, _, stats_ok = f_ok(soup.params, key)
        assert float(stats_ok["shadow_spill_max"]) == 0.0

        f_starved = make_renderer(soup.static, RenderConfig(
            max_bounces=2, rounds=3, accel="cluster", shadow_mode="union",
            bvh_shadow_visits=1, light_chunk=4), 16, 16, with_stats=True)
        _, _, stats_bad = f_starved(soup.params, key)
        assert float(stats_bad["shadow_spill_max"]) > 0.0

    def test_union_compact_bit_identical(self, soup):
        """Pixel compaction by union length (union_compact): per-pixel
        fold order is unchanged, so the compacted sweep must be
        BIT-identical to the uncompacted one — image and gradients."""
        from c_raytracer_tpu.render import make_renderer
        key = jax.random.PRNGKey(7)
        # 32² = 1024 px ≥ 512: auto compaction engages
        mk = lambda mode, stats=True: make_renderer(  # noqa: E731
            soup.static, RenderConfig(
                max_bounces=2, rounds=3, shadow_mode="union",
                light_chunk=4, union_compact=mode), 32, 32,
            with_stats=stats)
        i0, _, s0 = mk("off")(soup.params, key)
        i1, _, s1 = mk("on")(soup.params, key)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        assert float(s0["shadow_spill_max"]) == \
            float(s1["shadow_spill_max"])

        w = jax.random.uniform(jax.random.PRNGKey(5), (32, 32, 3))

        def grad_of(mode):
            fn = make_renderer(soup.static, RenderConfig(
                max_bounces=2, rounds=3, shadow_mode="union",
                light_chunk=4, union_compact=mode), 32, 32, jit=False)
            return jax.jit(jax.grad(
                lambda p: jnp.sum(fn(p, key)[0] * w)))(soup.params)

        g0, g1 = grad_of("off"), grad_of("on")
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g0)[0],
                jax.tree_util.tree_flatten_with_path(g1)[0]):
            a, b = np.asarray(a), np.asarray(b)
            if a.size == 0:
                continue
            scale = max(np.abs(a).max(), np.abs(b).max(), 1e-9)
            assert np.allclose(a, b, atol=1e-6 * scale), (
                jax.tree_util.keystr(path))

    def test_closest_compact_bit_identical(self, soup):
        """Closest-hit ray compaction (closest_compact): each ray folds
        its own visit list in the same order regardless of batch
        composition, so the compacted sweep must be BIT-identical to the
        uncompacted one — image and gradients (the scene4 analogue of
        union pixel compaction)."""
        from c_raytracer_tpu.render import make_renderer
        key = jax.random.PRNGKey(7)
        # 48² = 2304 rays: block rule picks 256-ray sub-blocks (9 blocks)
        mk = lambda mode: make_renderer(  # noqa: E731
            soup.static, RenderConfig(
                max_bounces=2, rounds=3, light_chunk=4,
                closest_compact=mode), 48, 48)
        i0, z0 = mk("off")(soup.params, key)
        i1, z1 = mk("on")(soup.params, key)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))

        w = jax.random.uniform(jax.random.PRNGKey(5), (48, 48, 3))

        def grad_of(mode):
            fn = make_renderer(soup.static, RenderConfig(
                max_bounces=2, rounds=3, light_chunk=4,
                closest_compact=mode), 48, 48, jit=False)
            return jax.jit(jax.grad(
                lambda p: jnp.sum(fn(p, key)[0] * w)))(soup.params)

        g0, g1 = grad_of("off"), grad_of("on")
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g0)[0],
                jax.tree_util.tree_flatten_with_path(g1)[0]):
            a, b = np.asarray(a), np.asarray(b)
            if a.size == 0:
                continue
            scale = max(np.abs(a).max(), np.abs(b).max(), 1e-9)
            assert np.allclose(a, b, atol=1e-6 * scale), (
                jax.tree_util.keystr(path))

    def test_per_ray_runtime_spill_guard(self, soup):
        """per_ray mode counts its own in-range segment truncation (a
        user opting into --shadow-mode per_ray on a transparent scene
        must get real runtime evidence, not a constant 0)."""
        from c_raytracer_tpu.render import make_renderer
        key = jax.random.PRNGKey(7)
        f_ok = make_renderer(soup.static, RenderConfig(
            max_bounces=2, rounds=3, accel="cluster",
            shadow_mode="per_ray", light_chunk=4), 16, 16, with_stats=True)
        _, _, stats_ok = f_ok(soup.params, key)
        assert float(stats_ok["shadow_spill_max"]) == 0.0

        f_starved = make_renderer(soup.static, RenderConfig(
            max_bounces=2, rounds=3, accel="cluster",
            shadow_mode="per_ray", bvh_shadow_visits=1, light_chunk=4),
            16, 16, with_stats=True)
        _, _, stats_bad = f_starved(soup.params, key)
        assert float(stats_bad["shadow_spill_max"]) > 0.0

    def test_closest_hit_runtime_spill_guard(self, soup):
        """The closest-hit sweeps carry an always-on overlap-rank spill
        counter (visit_spill_max): starved visit budgets must report it,
        generous ones must prove exhaustiveness with 0."""
        from c_raytracer_tpu.render import make_renderer
        key = jax.random.PRNGKey(7)
        K = None  # generous: budget = cluster count can never spill
        f_ok = make_renderer(soup.static, RenderConfig(
            max_bounces=2, rounds=3, accel="cluster", bvh_visits=4096,
            light_chunk=4), 16, 16, with_stats=True)
        _, _, stats_ok = f_ok(soup.params, key)
        assert float(stats_ok["visit_spill_max"]) == 0.0

        f_starved = make_renderer(soup.static, RenderConfig(
            max_bounces=2, rounds=3, accel="cluster", bvh_visits=1,
            light_chunk=4), 16, 16, with_stats=True)
        _, _, stats_bad = f_starved(soup.params, key)
        assert float(stats_bad["visit_spill_max"]) > 0.0

    def test_super_prefilter_parity_and_guard(self):
        """Opt-in two-level super prefilter (_visit_order_super; measured
        negative on chip, config.bvh_super_group): with S covering every
        super the render must equal the dense visit order exactly; with a
        starved S the always-on guard must report super-level spill."""
        from test_parallel import _lit_soup
        from c_raytracer_tpu.render import make_renderer
        soup = reorder_scene(_lit_soup(nt=2000, transparent=False))
        K = -(-2000 // 16)          # clusters at C=16
        Ks = -(-K // 16)            # supers at G=16
        key = jax.random.PRNGKey(1)
        # visits >= K: full coverage on both paths — any budget below
        # the true overlap makes the kept-set tie-break-dependent for
        # inside-cluster origins (entry 0 ties), which is truncation
        # policy, not a parity target
        base = dict(max_bounces=2, rounds=3, accel="cluster",
                    light_chunk=4, bvh_visits=128)
        f_dense = make_renderer(soup.static, RenderConfig(
            bvh_super_group=0, **base), 16, 16, with_stats=True)
        img_d, _, st_d = f_dense(soup.params, key)
        f_super = make_renderer(soup.static, RenderConfig(
            bvh_super_group=16, bvh_super_sel=Ks, **base), 16, 16,
            with_stats=True)
        img_s, _, st_s = f_super(soup.params, key)
        np.testing.assert_array_equal(np.asarray(img_s), np.asarray(img_d))
        assert float(st_s["visit_spill_max"]) == \
            float(st_d["visit_spill_max"])

        f_starved = make_renderer(soup.static, RenderConfig(
            bvh_super_group=16, bvh_super_sel=1, **base), 16, 16,
            with_stats=True)
        _, _, st_b = f_starved(soup.params, key)
        assert float(st_b["visit_spill_max"]) > \
            float(st_d["visit_spill_max"])

    def test_gi_child_spill_reaches_guard(self):
        """GI child shades/traces feed the runtime guard (the round-4
        blind spot: path-traced child hit points see the highest cluster
        overlap, and their truncation was invisible to the stats).

        Geometry built so PRIMARY work is spill-free under the starved
        budgets — camera rays and primary shadow segments pass under the
        triangle soup — while path-GI children bounce up into the soup:
        ambient GI must report 0 spill, path GI must report > 0."""
        import dataclasses

        from test_parallel import _lit_soup
        from c_raytracer_tpu.render import make_renderer
        from c_raytracer_tpu.scene import types as T

        base = _lit_soup()
        p = base.params
        # lift the soup triangles well above the floor (y ∈ [1, 7]); the
        # camera looks STRAIGHT DOWN from just above the floor and the
        # emitter sits at floor level, so every primary ray and every
        # primary shadow segment stays under y ≈ -3.5, far below the
        # soup's cluster AABBs — only upward GI children can cross them
        verts = np.asarray(p.tri_vertices) + np.asarray(
            [0.0, 4.0, 0.0], np.float32)
        centers = np.asarray(p.sphere_center).copy()
        centers[1] = [0.0, -3.5, -6.0]       # the emitter, low and behind
        cam = dataclasses.replace(
            p.camera,
            position=jnp.asarray([0.0, -0.5, 0.0], jnp.float32),
            vector_x=jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
            vector_y=jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
        scene = dataclasses.replace(base, params=dataclasses.replace(
            p, tri_vertices=jnp.asarray(verts),
            sphere_center=jnp.asarray(centers), camera=cam))
        scene = reorder_scene(scene)

        key = jax.random.PRNGKey(3)
        starved = dict(max_bounces=2, rounds=3, accel="cluster",
                       bvh_visits=1, bvh_shadow_visits=1, light_chunk=4)
        f_amb = make_renderer(scene.static, RenderConfig(
            gi_model="ambient", **starved), 12, 12, with_stats=True)
        _, _, st_amb = f_amb(scene.params, key)
        f_path = make_renderer(scene.static, RenderConfig(
            gi_model="path", samples_per_pixel=4, **starved), 12, 12,
            with_stats=True)
        _, _, st_path = f_path(scene.params, key)
        amb = max(float(st_amb["shadow_spill_max"]),
                  float(st_amb["visit_spill_max"]))
        path = max(float(st_path["shadow_spill_max"]),
                   float(st_path["visit_spill_max"]))
        assert amb == 0.0, (
            f"primary work unexpectedly spills ({st_amb}) — geometry no "
            f"longer isolates the child-shade guard")
        assert path > 0.0, "GI-child truncation invisible to the guard"

    def test_union_grads_match_brute(self, soup):
        """Vertex/material gradients through the union sweep vs brute."""
        from c_raytracer_tpu.render import make_renderer
        key = jax.random.PRNGKey(3)
        w = jax.random.uniform(jax.random.PRNGKey(5), (16, 16, 3))

        def loss_with(cfg):
            fn = make_renderer(soup.static, cfg, 16, 16, jit=False)
            return lambda p: jnp.sum(fn(p, key)[0] * w)

        gb = jax.jit(jax.grad(loss_with(RenderConfig(
            max_bounces=2, rounds=3, accel="none",
            light_chunk=4))))(soup.params)
        gu = jax.jit(jax.grad(loss_with(RenderConfig(
            max_bounces=2, rounds=3, accel="cluster", shadow_mode="union",
            light_chunk=4))))(soup.params)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(gb)[0],
                jax.tree_util.tree_flatten_with_path(gu)[0]):
            a, b = np.asarray(a), np.asarray(b)
            if a.size == 0:
                continue
            scale = max(np.abs(a).max(), np.abs(b).max())
            if scale < 1e-6:
                continue  # both pure float noise (e.g. focal_length,
                #           whose true gradient is exactly 0)
            assert np.allclose(a, b, atol=1e-4 * scale), (
                jax.tree_util.keystr(path))


@pytest.mark.skipif(not os.environ.get("CRT_SLOW"),
                    reason="slow float-parity test; set CRT_SLOW=1")
class TestScene5FloatParity:
    """FLOAT-space (not 8-bit) cluster-vs-brute parity on the glass dragon
    at DEFAULT knobs.  The 8-bit goldens can't see this: raw scene5
    radiance is O(1e-3), which quantizes to ≤0.3 LSB — round 2's defaults
    leaked 22× radiance on bright pixels while every golden passed.  The
    scene-aware auto policy (per-ray transparent shadows + visits 64)
    measured exact to 1e-12 (tools/profiling/s5_diag.py); this pins it."""

    def test_default_knobs_match_brute(self, reference_root):
        import dataclasses as dc
        from c_raytracer_tpu.render import make_renderer
        from c_raytracer_tpu.scene import load_scene

        sc = reorder_scene(load_scene(
            os.path.join(reference_root, "scenes/scene5.json")))
        nl = tuple(min(n, 4) for n in sc.static.num_lights)
        sc = dc.replace(sc, static=dc.replace(sc.static, num_lights=nl))
        key = jax.random.PRNGKey(0)
        base = dict(max_bounces=4, rounds=6, tri_chunk=8192)
        img_b, _ = make_renderer(
            sc.static, RenderConfig(accel="none", **base), 32, 32)(
                sc.params, key)
        img_c, _ = make_renderer(
            sc.static, RenderConfig(accel="cluster", **base), 32, 32)(
                sc.params, key)
        ad = np.abs(np.asarray(img_c) - np.asarray(img_b))
        denom = np.maximum(np.abs(np.asarray(img_b)), 1e-6)
        rel = float((ad / denom).max())
        assert rel < 1e-3, f"cluster-vs-brute rel radiance error {rel:.3e}"


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="interpret-mode parity is a CPU check (Pallas "
                           "interpret semantics differ on device backends; "
                           "the compiled kernel is opt-in via pallas_visit)")
class TestPallasVisitOrder:
    """Fused VMEM visit-order kernel (accel/pallas_visit.py) vs the XLA
    _visit_order — exact equality of (cids, ok, entry) on live lanes.
    Interpret mode on CPU; the compiled kernel is gated off by default
    (config.pallas_visit) until a target-toolchain compile is shown."""

    @pytest.mark.parametrize("V", [4, 16])
    def test_matches_xla_visit_order(self, V):
        from c_raytracer_tpu.accel import pallas_visit, traverse
        scene = reorder_scene(_soup_scene(np.random.default_rng(0)))
        ds = G.device_scene(scene.params, scene.static)
        ix = make_intersector(ds, scene.static,
                              RenderConfig(accel="cluster"))
        cs = ix.clusters
        K = cs.lo.shape[0]
        o, d = _rays(np.random.default_rng(5), 256)
        cids0, ok0, entry0, _sp = jax.jit(
            lambda: traverse._visit_order(cs, o, d, V))()
        Kp = -(-K // 128) * 128
        inf = jnp.full((Kp - K, 3), np.float32(np.inf))
        lo = jnp.concatenate([cs.lo, inf])
        hi = jnp.concatenate([cs.hi, inf])
        cids1, entry1 = pallas_visit.visit_order_fused(
            o, d, lo, hi, V=min(V, K), interpret=True)
        ok1 = np.asarray(entry1) < pallas_visit.FLT_MAX
        ok0 = np.asarray(ok0)
        np.testing.assert_array_equal(ok0, ok1)
        m = ok0
        np.testing.assert_array_equal(np.asarray(cids0)[m],
                                      np.asarray(cids1)[m])
        np.testing.assert_array_equal(np.asarray(entry0)[m],
                                      np.asarray(entry1)[m])

    def test_traverse_route_matches(self):
        """_visit_order(use_pallas=True) in interpret-capable shapes must
        give identical closest hits (pad/clip plumbing covered)."""
        from c_raytracer_tpu.accel import traverse
        scene = reorder_scene(_soup_scene(np.random.default_rng(0)))
        ds = G.device_scene(scene.params, scene.static)
        ix = make_intersector(ds, scene.static,
                              RenderConfig(accel="cluster"))
        cs = ix.clusters
        o, d = _rays(np.random.default_rng(6), 300)   # non-multiple of 128
        import unittest.mock as mock
        from c_raytracer_tpu.accel import pallas_visit as pv
        real = pv.visit_order_fused

        def interp(*a, **k):
            k["interpret"] = True
            return real(*a, **k)

        R = o.shape[0]
        best0 = (jnp.full((R,), traverse.FLT_MAX),
                 jnp.full((R,), 2**31 - 1, jnp.int32),
                 jnp.zeros((R, 3), jnp.float32))
        t0, g0, n0 = jax.jit(lambda: traverse.closest_hit_clusters(
            cs, o, d, best0, visits=16))()
        with mock.patch.object(pv, "visit_order_fused", interp):
            t1, g1, n1 = traverse.closest_hit_clusters(
                cs, o, d, best0, visits=16, pallas_visit=True)
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


class TestValidatePolicy:
    """spill_report / tuned_config (accel/validate.py): the measure-and
    -prove policy behind --accel-report/--accel-tune, including the
    union-mode branch (probes the SHADOW cluster set with the union
    budget)."""

    def test_spill_report_union_mode(self):
        from test_parallel import _lit_soup
        from c_raytracer_tpu.accel.validate import spill_report
        scene = reorder_scene(_lit_soup())
        cfg = RenderConfig(accel="cluster")   # transparent -> union auto
        rep = spill_report(scene, cfg, 16, 16)
        assert rep["shadow_mode"] == "union"
        assert rep["closest"]["visits"] == 64
        for s in rep["shadow"]:
            assert s["visits"] == cfg.resolved_union_visits(True)
            assert s["shortlist"] == 0
            assert s["tri_spill_max"] == 0

    def test_tuned_config_covers_measured_overlap(self):
        from test_parallel import _lit_soup
        from c_raytracer_tpu.accel.validate import spill_report, tuned_config
        scene = reorder_scene(_lit_soup())
        # starved starting budgets: tuning must raise them to cover
        cfg = RenderConfig(accel="cluster", bvh_visits=1,
                           bvh_shadow_visits=1)
        tuned, rep = tuned_config(scene, cfg, 16, 16)
        assert tuned.bvh_visits >= rep["closest"]["overlap_max"]
        rep2 = spill_report(scene, tuned, 16, 16)
        assert rep2["closest"]["spill_max"] == 0
        for s in rep2["shadow"]:
            assert s["cluster_spill_max"] == 0


class TestUnionChunkScope:
    """Per-chunk union lists (union_scope="chunk", the auto default) must
    match the per-frame lists and brute force exactly on a MULTI-chunk
    emitter — each chunk sweeps only its own segment union."""

    def test_chunk_scope_matches_frame_and_brute(self):
        from test_parallel import _lit_soup
        from c_raytracer_tpu.render import make_renderer
        import dataclasses as dc
        soup = reorder_scene(_lit_soup())
        # 24 light samples at light_chunk=8 -> 3 chunks
        nl = tuple(24 if n else 0 for n in soup.static.num_lights)
        soup = dc.replace(soup, static=dc.replace(soup.static,
                                                  num_lights=nl))
        key = jax.random.PRNGKey(11)
        imgs = {}
        for name, cfg in {
            "brute": RenderConfig(max_bounces=3, rounds=5, accel="none",
                                  light_chunk=8),
            "chunk": RenderConfig(max_bounces=3, rounds=5, accel="cluster",
                                  shadow_mode="union",
                                  union_scope="chunk", light_chunk=8),
            "frame": RenderConfig(max_bounces=3, rounds=5, accel="cluster",
                                  shadow_mode="union",
                                  union_scope="frame", light_chunk=8),
        }.items():
            fn = make_renderer(soup.static, cfg, 24, 24, with_stats=True)
            img, _, stats = fn(soup.params, key)
            imgs[name] = np.asarray(img)
            assert float(stats["shadow_spill_max"]) == 0.0, name
        assert imgs["brute"].max() > 1e-3
        for name in ("chunk", "frame"):
            ad = np.abs(imgs[name] - imgs["brute"])
            denom = np.maximum(np.abs(imgs["brute"]), 1e-6)
            assert float((ad / denom).max()) < 1e-3, name
