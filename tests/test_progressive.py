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
