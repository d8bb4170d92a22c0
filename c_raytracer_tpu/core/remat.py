"""Rematerialization policy for the render sweep.

``jax.checkpoint`` alone recomputes *everything* inside a wavefront round
during the backward pass — including the soft-shadow occlusion sweeps,
which dominate a frame.  But occlusion is a *discrete* event: ``blocked``
masks are boolean, carry no gradient of their own, and are exactly the
residual the backward pass needs to route cotangents through the
``where(ok, diffuse + spec, 0)`` selects (shading.py).  Naming them with
``checkpoint_name`` and rematerializing under ``save_only_these_names``
saves just those masks (1 byte/lane) across every remat boundary, letting
XLA dead-code-eliminate the entire occlusion re-trace — the Möller-Trumbore
/ sphere sweeps — from the backward computation of opaque scenes.

(Transparent scenes still re-trace in backward: the kt shadow *tint* is a
real differentiable product over blockers, so its VJP needs the in-range
masks.  ``blocked`` is saved there too; only the tint path recomputes.)

Round 4 adds two more named residual classes, selectable via
``RenderConfig.remat_names`` (the fwd+bwd ratio lever, VERDICT r3 #9):

* ``shadow_samples`` — the barrier'd sampled light directions/distances
  (sin/cos of the PRNG draw).  Saving them skips the per-chunk sampling
  re-trace in backward at (lc, P)·4 f32 per chunk.
* ``shade_terms`` — the barrier'd diffuse cosine and specular power
  (the powf).  Saving skips the transcendental recompute at
  (lc, P)·2 f32 per chunk.

Both trade HBM for backward ALU — measure per scene; the default saves
only occlusion (the always-win).
"""

from __future__ import annotations

import functools

import jax
from jax.ad_checkpoint import checkpoint_name

OCCLUSION = "occlusion"
SHADOW_SAMPLES = "shadow_samples"
SHADE_TERMS = "shade_terms"

DEFAULT_NAMES = (OCCLUSION,)


def name_occlusion(x):
    """Mark an occlusion mask as a saved residual across remat boundaries."""
    return checkpoint_name(x, OCCLUSION)


def name_shadow_samples(x):
    return checkpoint_name(x, SHADOW_SAMPLES)


def name_shade_terms(x):
    return checkpoint_name(x, SHADE_TERMS)


@functools.lru_cache(maxsize=None)
def _policy(names: tuple):
    return jax.checkpoint_policies.save_only_these_names(*names)


def checkpoint(f, names: tuple = DEFAULT_NAMES):
    """``jax.checkpoint`` that saves the given named values (default:
    occlusion masks only)."""
    return jax.checkpoint(f, policy=_policy(tuple(names)))
