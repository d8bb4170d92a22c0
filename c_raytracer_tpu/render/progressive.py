"""Progressive rendering with checkpoint/resume.

The reference's only persisted intermediate is the raw float32 TIFF handoff
between renderer and postprocessor (image.c:64-85, tag 65000) so effects can
be re-applied "without having to re-render" (README.md:145).  The TPU
framework extends that into real checkpointing for long renders: Monte-Carlo
samples are rendered in chunks, the running mean raster + z-buffer are saved
as the same raw TIFF after every chunk (plus a JSON sidecar with the resume
state), and an interrupted render resumes bit-exactly — chunk keys are
derived deterministically from the base key, so resume(k chunks) followed by
the rest equals the uninterrupted render.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from c_raytracer_tpu.image import read_tiff, write_tiff_raw
from c_raytracer_tpu.render.api import make_renderer
from c_raytracer_tpu.render.config import RenderConfig
from c_raytracer_tpu.scene import types as T


def _sidecar(path: str) -> str:
    return path + ".progress.json"


def render_progressive(scene: T.Scene, cfg: RenderConfig, resx: int,
                       resy: int, key=None, *, chunks: int = 4,
                       checkpoint: str | None = None, resume: bool = True,
                       log=None, _stop_after: int | None = None):
    """Render in ``chunks`` equal sample chunks, optionally checkpointed.

    Returns (image, z).  The estimand matches a single render whose total
    sample budget is the sum of the chunks': each chunk is an independent
    deterministic render (key = fold_in(base, chunk)) and the result is
    their mean.  With ``checkpoint`` set, the accumulated raster is written
    after every chunk and a matching sidecar makes ``resume=True`` continue
    from the first unrendered chunk.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    base_seed = int(jax.random.key_data(key)[-1])

    fn = make_renderer(scene.static, cfg, resx, resy)

    start = 0
    acc = np.zeros((resy, resx, 3), np.float64)
    z = np.zeros((resy, resx), np.float32)
    state = {
        "chunks": chunks, "resx": resx, "resy": resy,
        "base_seed": base_seed, "done": 0,
    }

    if checkpoint and resume and os.path.exists(_sidecar(checkpoint)):
        with open(_sidecar(checkpoint)) as f:
            saved = json.load(f)
        compat = all(saved.get(k) == state[k]
                     for k in ("chunks", "resx", "resy", "base_seed"))
        if compat and 0 < saved["done"] <= chunks:
            img, z = read_tiff(checkpoint)
            start = saved["done"]
            acc = img.astype(np.float64) * start
            if log:
                log("Resuming progressive render at chunk %d/%d.",
                    start, chunks)

    stop = chunks if _stop_after is None else min(_stop_after, chunks)
    for c in range(start, stop):
        ckey = jax.random.fold_in(key, c)
        img_c, z_c = fn(scene.params, ckey)
        acc += np.asarray(img_c, np.float64)
        if c == 0:
            z = np.asarray(z_c)
        if checkpoint:
            mean = (acc / (c + 1)).astype(np.float32)
            write_tiff_raw(checkpoint, mean, z)
            state["done"] = c + 1
            with open(_sidecar(checkpoint), "w") as f:
                json.dump(state, f)
        if log:
            log("Progressive chunk %d/%d done.", c + 1, chunks)

    return (acc / max(stop, 1)).astype(np.float32), z
