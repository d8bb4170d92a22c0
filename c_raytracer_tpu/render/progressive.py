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

import dataclasses
import json
import os

import jax
import numpy as np

from c_raytracer_tpu.image import read_tiff, write_tiff_raw
from c_raytracer_tpu.render.api import make_host_tiled_renderer, make_renderer
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

    # the runtime truncation guard stays on for progressive renders too
    fn = make_renderer(scene.static, cfg, resx, resy, with_stats=True)

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
        img_c, z_c, stats = fn(scene.params, ckey)
        if log:
            for k, msg in (("shadow_spill_max", "shadow"),
                           ("visit_spill_max", "closest-hit")):
                if float(stats.get(k, 0.0)) > 0:
                    log("WARNING: %s visit budget exceeded by %.0f "
                        "clusters (chunk %d) — raise the budgets or use "
                        "--accel-tune.", msg, float(stats[k]), c)
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


def render_spp_chunked(scene: T.Scene, cfg: RenderConfig, resx: int,
                       resy: int, key=None, *, spp_chunks: int,
                       host_tiled: bool = True, tiles_per_call: int = 1,
                       with_stats: bool = False, log=None):
    """EXACT spp-chunked path-traced render: ``spp_chunks`` passes of
    ``spp/spp_chunks`` GI samples each, composed by a host mean that
    equals the single-call render at the full ``cfg.samples_per_pixel``
    up to float summation order (the BASELINE flagship composition:
    256 spp = 4 × 64-spp bounded device programs per tile).

    Why the mean is exact (not just the same estimand): every chunk
    renders with the SAME base key, so the sample-index-independent parts
    of the frame (primary hits, direct soft-shadow lighting, emission,
    z-buffer) are bit-identical in every pass and survive the mean; the
    GI sample keys are ``fold_in(key, offset + i)`` (config
    ``gi_sample_offset``) so the chunks partition exactly the sample set
    the single call scans, each pre-weighted 1/(spp/chunks) so the mean
    yields 1/spp; and the one-sample secondary-hit GI runs only in the
    offset-0 chunk at weight ``spp_chunks`` (config ``gi_chunk_weight``).
    Pinned by tests/test_progressive.py::TestSppChunked.

    ``host_tiled``: run each pass through ``make_host_tiled_renderer``
    (one bounded device program per tile — required on remote-attached
    accelerators whose tunnel kills long calls); False uses the
    single-program renderer per pass.  Returns (image, z) and, with
    ``with_stats``, the aggregated stats of all passes (host_tiled only).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    total = cfg.samples_per_pixel
    if total % spp_chunks:
        raise ValueError(
            f"samples_per_pixel={total} not divisible by "
            f"spp_chunks={spp_chunks}")
    s = total // spp_chunks

    acc = np.zeros((resy, resx, 3), np.float64)
    z = None
    stats = {}
    for c in range(spp_chunks):
        ccfg = dataclasses.replace(
            cfg, samples_per_pixel=s, gi_sample_offset=c * s,
            gi_chunk_weight=spp_chunks)
        if host_tiled:
            fn = make_host_tiled_renderer(
                scene.static, ccfg, resx, resy,
                tiles_per_call=tiles_per_call, with_stats=with_stats)
            out = fn(scene.params, key)
        else:
            fn = make_renderer(scene.static, ccfg, resx, resy,
                               with_stats=with_stats)
            out = fn(scene.params, key)
        img_c = np.asarray(out[0])
        acc += img_c.astype(np.float64)
        if c == 0:
            z = np.asarray(out[1])
        if with_stats:
            for k, v in dict(out[2]).items():
                v = float(v)
                stats[k] = (max(stats.get(k, 0.0), v)
                            if k.endswith("_spill_max")
                            else stats.get(k, 0.0) + v)
        if log:
            log("spp chunk %d/%d done (%d samples).", c + 1, spp_chunks, s)

    img = (acc / spp_chunks).astype(np.float32)
    if with_stats:
        return img, z, stats
    return img, z
