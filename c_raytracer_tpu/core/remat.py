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
"""

from __future__ import annotations

import jax
from jax.ad_checkpoint import checkpoint_name

OCCLUSION = "occlusion"

_POLICY = jax.checkpoint_policies.save_only_these_names(OCCLUSION)


def name_occlusion(x):
    """Mark an occlusion mask as a saved residual across remat boundaries."""
    return checkpoint_name(x, OCCLUSION)


def checkpoint(f):
    """``jax.checkpoint`` that saves occlusion-named values."""
    return jax.checkpoint(f, policy=_POLICY)
