"""Progressive rendering + checkpoint/resume (render/progressive.py).

The reference persists its raw raster for the postprocess handoff
(image.c:64-85); here that file doubles as a render checkpoint: resuming an
interrupted progressive render is bit-exact with never having stopped.
"""

import os

import jax
import numpy as np

from c_raytracer_tpu.render import RenderConfig, render_progressive
from c_raytracer_tpu.scene import load_scene

SCENE = "/root/reference/scenes/scene1.json"


def _scene():
    return load_scene(SCENE)


class TestProgressive:
    def test_mean_of_chunks(self, reference_root):
        sc = _scene()
        cfg = RenderConfig(max_bounces=2)
        key = jax.random.PRNGKey(7)
        img, z = render_progressive(sc, cfg, 32, 32, key, chunks=3)
        # manual mean of the same chunk keys
        from c_raytracer_tpu.render import make_renderer
        fn = make_renderer(sc.static, cfg, 32, 32)
        imgs = [np.asarray(fn(sc.params, jax.random.fold_in(key, c))[0])
                for c in range(3)]
        np.testing.assert_allclose(img, np.mean(imgs, axis=0), atol=1e-6)
        assert z.shape == (32, 32)

    def test_resume_bit_exact(self, reference_root, tmp_path):
        sc = _scene()
        cfg = RenderConfig(max_bounces=2)
        key = jax.random.PRNGKey(3)
        ck = str(tmp_path / "ckpt.tif")

        full, _ = render_progressive(sc, cfg, 32, 32, key, chunks=4)

        # simulate interruption: render only 2 chunks by lying about the
        # chunk count... instead: run 4-chunk render but stop after 2 by
        # rendering a 2-chunk prefix with the same sidecar layout
        render_progressive(sc, cfg, 32, 32, key, chunks=4, checkpoint=ck,
                           resume=False, _stop_after=2)
        resumed, _ = render_progressive(sc, cfg, 32, 32, key, chunks=4,
                                        checkpoint=ck, resume=True)
        np.testing.assert_allclose(resumed, full, atol=2e-7)

    def test_incompatible_checkpoint_ignored(self, reference_root, tmp_path):
        sc = _scene()
        cfg = RenderConfig(max_bounces=2)
        ck = str(tmp_path / "ckpt.tif")
        render_progressive(sc, cfg, 32, 32, jax.random.PRNGKey(1), chunks=2,
                           checkpoint=ck)
        # different base key -> sidecar incompatible -> fresh render
        img, _ = render_progressive(sc, cfg, 32, 32, jax.random.PRNGKey(2),
                                    chunks=2, checkpoint=ck)
        fresh, _ = render_progressive(sc, cfg, 32, 32, jax.random.PRNGKey(2),
                                      chunks=2)
        np.testing.assert_allclose(img, fresh, atol=1e-7)


class TestSppChunked:
    """EXACT spp-chunk composition (render_spp_chunked): the host mean of
    k offset chunks at spp/k samples each must equal the single-call
    render at the full spp up to float summation order — the BASELINE
    flagship's 256-spp = 4×64-spp composition, scaled down for CI."""

    def test_chain_mode_equals_single_call(self, reference_root):
        import dataclasses

        from c_raytracer_tpu.render import make_renderer, render_spp_chunked
        sc = _scene()
        static = dataclasses.replace(
            sc.static,
            num_lights=tuple(min(n, 4) for n in sc.static.num_lights))
        sc = dataclasses.replace(sc, static=static)
        cfg = RenderConfig(max_bounces=2, rounds=3, gi_model="path",
                           samples_per_pixel=8)
        key = jax.random.PRNGKey(5)
        single, z1 = make_renderer(sc.static, cfg, 24, 24)(sc.params, key)
        single = np.asarray(single)
        for host_tiled in (False, True):
            img, z = render_spp_chunked(sc, cfg, 24, 24, key,
                                        spp_chunks=2,
                                        host_tiled=host_tiled)
            np.testing.assert_allclose(
                img, single, rtol=1e-4, atol=1e-6,
                err_msg=f"host_tiled={host_tiled}")
            # z is the primary-hit t: the chunked pass is a DIFFERENT
            # compiled program (spp is a static shape), and XLA's fusion
            # choices perturb the trace arithmetic by ~1 ulp
            np.testing.assert_allclose(np.asarray(z), np.asarray(z1),
                                       rtol=1e-5, atol=1e-6)

    def test_stack_mode_equals_single_call(self):
        """Transparent scene (stack integrator, per-lane primary depths):
        secondary-hit GI must survive the chunk gating exactly."""
        import dataclasses

        from test_parallel import _lit_soup
        from c_raytracer_tpu.accel.build import reorder_scene
        from c_raytracer_tpu.render import make_renderer, render_spp_chunked
        sc = reorder_scene(_lit_soup(nt=200))
        cfg = RenderConfig(max_bounces=2, rounds=4, gi_model="path",
                           samples_per_pixel=6, light_chunk=4)
        key = jax.random.PRNGKey(9)
        single, _ = make_renderer(sc.static, cfg, 16, 16)(sc.params, key)
        img, _ = render_spp_chunked(sc, cfg, 16, 16, key, spp_chunks=3,
                                    host_tiled=False)
        np.testing.assert_allclose(np.asarray(img), np.asarray(single),
                                   rtol=1e-4, atol=1e-6)

    def test_indivisible_spp_rejected(self):
        import pytest

        from c_raytracer_tpu.render import render_spp_chunked
        sc = _scene()
        cfg = RenderConfig(gi_model="path", samples_per_pixel=7)
        with pytest.raises(ValueError):
            render_spp_chunked(sc, cfg, 8, 8, spp_chunks=2)
