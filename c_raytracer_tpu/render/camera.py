"""Image-plane geometry and primary ray generation.

Replicates image_init (image.c:34-56) and the primary loop's pixel walk
(render.c:352-366), including the reference's one-pixel X offset quirk:
the corner is computed at a half-pixel offset but the row loop adds one
full X step *before* the first pixel, so pixel (col, row) sits at
``corner + (col+1)·vx + row·vy`` (SURVEY.md §3.5).

Differentiable w.r.t. the camera pytree.
"""

from __future__ import annotations

import jax.numpy as jnp

from c_raytracer_tpu.core import vec
from c_raytracer_tpu.scene.types import Camera


def image_plane(camera: Camera, resx: int, resy: int):
    """Returns (corner, vx, vy): the pixel-grid basis (image.c:42-55)."""
    vz = vec.cross(camera.vector_x, camera.vector_y)  # camera.c:32
    size_x = 2.0 * camera.focal_length * jnp.tan(
        camera.fov * (vec.PI / 360.0))
    size_y = size_x * (resy / resx)
    vx = camera.vector_x * (size_x / resx)
    vy = camera.vector_y * (size_y / resy)
    plane_center = camera.position + vz * camera.focal_length
    corner = (plane_center
              + vx * (0.5 - resx / 2.0)
              + vy * (0.5 - resy / 2.0))
    return corner, vx, vy


def primary_rays(camera: Camera, resx: int, resy: int):
    """Primary ray origins/directions for the full image, row-major.

    Returns (origins, dirs) of shape (resy*resx, 3); origins are the camera
    position (broadcast), dirs normalized.
    """
    corner, vx, vy = image_plane(camera, resx, resy)
    cols = jnp.arange(1, resx + 1, dtype=jnp.float32)  # the +1 quirk
    rows = jnp.arange(resy, dtype=jnp.float32)
    # pixel_position = corner + (col+1)*vx + row*vy  (render.c:352-361)
    px = corner + cols[None, :, None] * vx + rows[:, None, None] * vy
    d = vec.norm(px - camera.position)
    o = jnp.broadcast_to(camera.position, d.shape)
    return o.reshape(-1, 3), d.reshape(-1, 3)
